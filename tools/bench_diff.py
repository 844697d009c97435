"""Compare two bench.py JSON outputs: flag regressions > threshold.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold=1.3]
"""
import json
import sys


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"headline: {old.get('value')} -> {new.get('value')} sec")
    both = sorted(set(oq) & set(nq))
    regress, improve = [], []
    for k in both:
        if oq[k] <= 0:
            continue
        r = nq[k] / oq[k]
        if r >= thr and nq[k] - oq[k] > 0.3:
            regress.append((r, k, oq[k], nq[k]))
        elif r <= 1 / thr and oq[k] - nq[k] > 0.3:
            improve.append((r, k, oq[k], nq[k]))
    print(f"{len(both)} shared; {len(regress)} regressions >= {thr}x, "
          f"{len(improve)} improvements")
    for r, k, a, b in sorted(regress, reverse=True):
        print(f"  REG {k}: {a} -> {b} ({r:.2f}x)")
    for r, k, a, b in sorted(improve):
        print(f"  imp {k}: {a} -> {b} ({r:.2f}x)")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new:", ", ".join(f"{k}={nq[k]}" for k in only_new))


if __name__ == "__main__":
    main()
