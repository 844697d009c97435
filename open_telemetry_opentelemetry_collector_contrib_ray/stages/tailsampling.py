"""Tail-sampling policy set, Ray-Data-first.

Reference semantics (not code) — processor/tailsamplingprocessor:
traces are buffered for decision_wait, then every policy evaluates the
complete trace and the trace is kept if ANY policy returns Sampled
(config.go:12-69).  Policy evaluators live under internal/sampling/:

- always_sample.go            -> {"type": "always"}
- latency.go:33-57            -> {"type": "latency", "threshold_ms": L,
                                  "upper_threshold_ms": U}  (U=0: >= L;
                                  else L < duration <= U)
- span_count_sampler.go:31-44 -> {"type": "span_count", "min_spans": m,
                                  "max_spans": M}  (M=0: no upper bound)
- probabilistic.go:31-70      -> {"type": "probabilistic", "percent": p,
                                  "hash": "md5_10k"|"fnv1a", "salt": s}
- status_code.go / string_tag_filter.go / numeric_tag_filter.go /
  boolean_tag_filter.go       -> any-span-matches attribute policies,
                                  expressed here as row-level conditions
- ottl.go                     -> {"type": "ottl_condition",
                                  "conditions": [expr, ...]}  (OR)
- rate_limiting.go:32-49      -> {"type": "rate_limiting",
                                  "spans_per_second": r}
- and.go:30-43                -> {"type": "and", "policies": [...]}
- composite.go:78-120         -> {"type": "composite",
                                  "max_total_spans_per_second": R,
                                  "subpolicies": [{policy...,
                                    "max_spans_per_second": r_i}, ...]}

Batch translation: the decision-wait window is the run (SURVEY.md
§2.10); a "trace" is a conversation (group_col).  The wall-clock second
of the reference's rate limiters maps to the DATA second of the group's
first timestamp — deterministic and reproducible, unlike wall clock.

Scale shape: ONE pass over the rows computes per-batch partial group
stats (count, min/max ts, one any-match flag per condition policy);
the bucketed combine yields a stats table of one row per group (tiny
relative to the data).  Pure per-group policies evaluate vectorized
over that table; the rate-limited policies run as a bucketed transform
keyed by decision second (greedy token-bucket scan over the few groups
inside each second — loops over groups, never rows).  Winning keys
broadcast via ray.put and filter as a semi-join — full rows never
shuffle.

Deliberate divergence from the reference, documented: latency.go
evaluates its threshold on the RUNNING min/max while scanning spans in
arrival order, so with an upper threshold a trace whose final duration
exceeds U can still sample if some prefix landed in (L, U].  Batch mode
evaluates the FINAL duration — order-independent and the only
deterministic choice under parallel scans.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ast import parse_condition
from .aggregate import AggSpec, bucketed_group_transform, grouped_agg

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a_64(data: bytes) -> int:
    """FNV-1a 64-bit (hash/fnv parity with probabilistic.go:66-70)."""
    h = int(_FNV_OFFSET)
    for b in data:
        h = ((h ^ b) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return h


# ---------------------------------------------------------------- leaves


def _leaf_condition(policy: dict) -> str | None:
    """Row-level condition string for any-span-matches policies."""
    t = policy["type"]
    if t == "ottl_condition":
        conds = policy["conditions"]
        return "(" + ") or (".join(conds) + ")" if len(conds) > 1 else conds[0]
    if t == "string_attribute":
        key, values = policy["key"], policy["values"]
        return " or ".join(f'{key} == "{v}"' for v in values)
    if t == "status_code":
        # this engine's status lives in the parsed status attribute
        key = policy.get("key", "attributes[\"status\"]")
        return " or ".join(f'{key} == "{v}"' for v in policy["codes"])
    if t == "numeric_attribute":
        key = policy["key"]
        lo, hi = policy.get("min_value"), policy.get("max_value")
        parts = []
        if lo is not None:
            parts.append(f"{key} >= {lo}")
        if hi is not None:
            parts.append(f"{key} <= {hi}")
        return " and ".join(parts) or "true"
    if t == "boolean_attribute":
        key, v = policy["key"], policy["value"]
        return f"{key} == {'true' if v else 'false'}"
    if t == "trace_state":
        # trace_state_filter.go: sample when the W3C tracestate header
        # (comma-separated key=value list) carries key with one of the
        # values; the header lives in a promoted column here
        key = policy["key"]
        col = policy.get("source", 'attributes["trace_state"]')
        import re as _re

        alts = "|".join(_re.escape(v) for v in policy["values"])
        return f'IsMatch({col}, "(^|,){_re.escape(key)}=({alts})($|,)")'
    return None


def _collect_leaves(policies: Sequence[dict], out=None) -> list[tuple[str, str]]:
    """(stable flag key, condition) per condition leaf, nested included.
    Keys are assigned in traversal order and RECORDED IN the policy dict
    (``__flag_key``) so they survive pickling to workers — object ids do
    not."""
    if out is None:
        out = []
    for p in policies:
        c = _leaf_condition(p)
        if c is not None:
            key = f"p{len(out)}"
            p["__flag_key"] = key
            out.append((key, c))
        _collect_leaves(p.get("policies") or [], out)
        _collect_leaves(p.get("subpolicies") or [], out)
    return out


class _FlagStage:
    """Adds one int8 match column per condition leaf (compiled once per
    actor/task, evaluated as vectorized Arrow kernels)."""

    def __init__(self, leaves: list[tuple[int, str]]):
        self.leaves = leaves
        self._masks = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._masks is None:
            self._masks = [(pid, parse_condition(cond)) for pid, cond in self.leaves]
        for pid, mask in self._masks:
            m = pc.fill_null(mask(batch), False)
            batch = batch.append_column(f"__f_{pid}", pc.cast(m, pa.int64()))
        return batch


def _eval_pure(policy: dict, s: pd.DataFrame, group_col: str) -> np.ndarray:
    """Vectorized decision for a non-rate-limited policy over the stats
    table (columns: group, n, min_ts, max_ts, __f_<id> any-match flags)."""
    t = policy["type"]
    if t == "always":
        return np.ones(len(s), dtype=bool)
    if t == "latency":
        dur_ms = (s["max_ts"].astype("int64") - s["min_ts"].astype("int64")) // 1000
        lo = policy["threshold_ms"]
        hi = policy.get("upper_threshold_ms", 0) or 0
        if hi == 0:
            return (dur_ms >= lo).to_numpy()
        return ((dur_ms > lo) & (dur_ms <= hi)).to_numpy()
    if t == "span_count":
        lo = policy.get("min_spans", 0)
        hi = policy.get("max_spans", 0) or 0
        n = s["n"]
        if hi == 0:
            return (n >= lo).to_numpy()
        return ((n >= lo) & (n <= hi)).to_numpy()
    if t == "probabilistic":
        pctv = float(policy["percent"])
        mode = policy.get("hash", "md5_10k")
        ids = s[group_col].astype(str)
        if mode == "fnv1a":
            # bit-parity with probabilistic.go:31-70 (fnv1a over salt+id,
            # threshold = ratio * MaxUint64); per GROUP, not per row
            salt = policy.get("salt", "default-hash-seed")
            threshold = int((pctv / 100.0) * 0xFFFFFFFFFFFFFFFF)
            return np.fromiter(
                (fnv1a_64((salt + g).encode()) <= threshold for g in ids),
                dtype=bool, count=len(s))
        # md5_10k: DuckDB-oracle-parity bucket space (md5_number_lower % 10000)
        thr = int(pctv * 100)
        md5 = hashlib.md5
        return np.fromiter(
            (int.from_bytes(md5(g.encode()).digest()[8:16], "little") % 10000 < thr
             for g in ids), dtype=bool, count=len(s))
    if t == "and":
        out = np.ones(len(s), dtype=bool)
        for sub in policy["policies"]:
            out &= _eval_pure(sub, s, group_col)
        return out
    cond_flag = f"__f_{policy.get('__flag_key')}"
    if cond_flag in s.columns:
        return (s[cond_flag] > 0).to_numpy()
    raise ValueError(f"unknown or rate-limited-only policy type: {t}")


def _is_rate_limited(policy: dict) -> bool:
    return policy["type"] in ("rate_limiting", "composite")


def tail_sample_decisions(ds, policies: Sequence[dict], group_col: str = "conv_id",
                          ts_col: str = "ts", n_buckets: int = 64):
    """Per-group decision table: (group_col, n, min_ts, max_ts, sampled).

    `sampled` is the OR over the policy list, the processor's keep rule.
    """
    import copy

    policies = copy.deepcopy(list(policies))  # we annotate flag keys
    leaves = _collect_leaves(policies)
    flagged = ds.map_batches(_FlagStage(leaves), batch_format="pyarrow") \
        if leaves else ds

    specs: list[AggSpec] = [
        ("count", None, "n"),
        ("min", ts_col, "min_ts"),
        ("max", ts_col, "max_ts"),
    ]
    for pid, _ in leaves:
        specs.append(("max", f"__f_{pid}", f"__f_{pid}"))
    stats = grouped_agg(flagged, [group_col], specs, combine="bucket",
                        n_buckets=n_buckets)

    pure = [p for p in policies if not _is_rate_limited(p)]
    limited = [p for p in policies if _is_rate_limited(p)]

    def decide(s: pd.DataFrame) -> pd.DataFrame:
        keep = np.zeros(len(s), dtype=bool)
        for p in pure:
            keep |= _eval_pure(p, s, group_col)
        s = s.copy()
        s["sampled"] = keep
        return s

    from .aggregate import arrow_out

    decided = stats.map_batches(arrow_out(decide), batch_format="pandas")
    if not limited:
        return decided

    # rate-limited policies: greedy token buckets reset per DATA second of
    # the group's first timestamp (rate_limiting.go:38-41 resets each
    # wall-clock second); groups admit in deterministic (min_ts, group)
    # order.  Keyed by second -> independent buckets -> one bucketed
    # transform; the loop is over GROUPS within a second.
    # `window_us` (optional, default 1s) coarsens the decision window —
    # the batch-mode knob for sparse corpora where every group starts in
    # its own second; all rate-limited policies in one call share it, so
    # conflicting explicit settings are an error rather than a silent
    # first-policy-wins.
    windows = {int(p["window_us"]) for p in limited if "window_us" in p}
    if len(windows) > 1:
        raise ValueError(
            f"rate-limited policies disagree on window_us ({sorted(windows)}); "
            "all rate_limiting/composite policies in one tail_sample call "
            "share a single decision window")
    window_us = windows.pop() if windows else 1_000_000

    def add_sec(t: pa.Table) -> pa.Table:
        sec = pc.cast(pc.divide(pc.cast(t.column("min_ts"), pa.int64()),
                                window_us), pa.int64())
        return t.append_column("__sec", sec)

    with_sec = decided.map_batches(add_sec, batch_format="pyarrow")

    def admit(s: pd.DataFrame) -> pd.DataFrame:
        s = s.sort_values(["__sec", "min_ts", group_col], kind="stable")
        sampled = s["sampled"].to_numpy().copy()
        ns = s["n"].to_numpy()
        secs = s["__sec"].to_numpy()
        for p in limited:
            if p["type"] == "rate_limiting":
                budget = p["spans_per_second"]
                taken = 0
                cur = None
                for i in range(len(s)):
                    if secs[i] != cur:
                        cur, taken = secs[i], 0
                    # strict <, rate_limiting.go:46
                    if taken + ns[i] < budget:
                        taken += ns[i]
                        sampled[i] = True
            else:  # composite
                subs = p["subpolicies"]
                max_total = p["max_total_spans_per_second"]
                sub_flags = [_eval_pure(sub, s, group_col) for sub in subs]
                alloc = [sub.get("max_spans_per_second", max_total)
                         for sub in subs]
                taken = [0] * len(subs)
                cur = None
                for i in range(len(s)):
                    if secs[i] != cur:
                        cur = secs[i]
                        taken = [0] * len(subs)
                    for j in range(len(subs)):
                        if sub_flags[j][i]:
                            would = taken[j] + ns[i]
                            # composite.go:105-120: within both budgets ->
                            # sample; else NotSampled, later subs NOT tried
                            if would <= alloc[j] and would <= max_total:
                                taken[j] = would
                                sampled[i] = True
                            break
        s = s.copy()
        s["sampled"] = sampled
        return s.drop(columns="__sec")

    return bucketed_group_transform(with_sec, ["__sec"], admit,
                                    n_buckets=n_buckets)


def tail_sample(ds, policies: Sequence[dict], group_col: str = "conv_id",
                ts_col: str = "ts", n_buckets: int = 64,
                max_broadcast_keys: int = 2_000_000):
    """Filter ds to entire groups sampled by ANY policy (the processor's
    keep rule).

    Scale: winning keys are counted first.  Below
    ``max_broadcast_keys`` they broadcast once via ray.put and rows
    never shuffle (ids are small — fine up to millions of keys).  Past
    the threshold the path auto-switches to a bucketed hash SEMI-join
    (one co-partitioning shuffle; nothing driver-side), the
    ``dedup_clusters.max_driver_pairs`` idiom."""
    import ray

    decisions = tail_sample_decisions(ds, policies, group_col, ts_col,
                                      n_buckets)
    winners = decisions.map_batches(
        lambda t: t.filter(pc.equal(t.column("sampled"), True))
                   .select([group_col]),
        batch_format="pyarrow").materialize()
    if winners.count() > max_broadcast_keys:
        from .join import bucketed_hash_join

        return bucketed_hash_join(ds, winners, on=[group_col], how="semi",
                                  n_buckets=n_buckets)
    kept = winners.take_all()
    if not kept:
        # no group sampled: empty result (an empty key list would build a
        # NULL-typed array that pc.is_in rejects against a typed column)
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    keys_ref = ray.put(pa.array(sorted(r[group_col] for r in kept)))

    class SemiJoin:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column(group_col), value_set=self.keys))

    return ds.map_batches(SemiJoin, batch_format="pyarrow", concurrency=(1, 4))
