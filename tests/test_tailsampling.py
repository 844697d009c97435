"""Tail-sampling policy-set tests, mirroring the reference's per-policy
tests (processor/tailsamplingprocessor/internal/sampling/*_test.go):
each policy is exercised on a small deterministic dataset and the
distributed decision is compared against a straightforward sequential
simulation of the reference's evaluator semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.tailsampling import (
    fnv1a_64,
    tail_sample,
    tail_sample_decisions,
)

US = 1_000_000


def _mk_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows))


def _conv(conv_id, n, t0_us, gap_us=1000, status="ok", latency=100):
    return [{"conv_id": conv_id, "turn_idx": i, "role": "tool",
             "attr_status": status, "attr_latency_ms": latency,
             "ts": t0_us + i * gap_us} for i in range(n)]


def _decisions(ds, policies):
    df = tail_sample_decisions(ds, policies, ts_col="ts").to_pandas()
    return dict(zip(df["conv_id"], df["sampled"]))


def test_latency_policy():
    # latency.go:33-57: duration >= threshold (upper=0), else (lo, hi]
    rows = (_conv("slow", 3, 0, gap_us=10_000 * 1000)      # 20s duration
            + _conv("fast", 3, 0, gap_us=100 * 1000))      # 200ms
    d = _decisions(_mk_ds(rows), [{"type": "latency", "threshold_ms": 5000}])
    assert d == {"slow": True, "fast": False}
    d = _decisions(_mk_ds(rows), [{"type": "latency", "threshold_ms": 100,
                                   "upper_threshold_ms": 5000}])
    assert d == {"slow": False, "fast": True}


def test_span_count_policy():
    # span_count_sampler.go:31-44: min only, then min..max window
    rows = _conv("a", 2, 0) + _conv("b", 5, 0) + _conv("c", 9, 0)
    d = _decisions(_mk_ds(rows), [{"type": "span_count", "min_spans": 5}])
    assert d == {"a": False, "b": True, "c": True}
    d = _decisions(_mk_ds(rows), [{"type": "span_count", "min_spans": 3,
                                   "max_spans": 6}])
    assert d == {"a": False, "b": True, "c": False}


def test_probabilistic_fnv1a_matches_reference_hash():
    # probabilistic.go:66-70 hashes fnv1a(salt + id); spot-check the hash
    # primitive against the canonical FNV-1a test vector
    assert fnv1a_64(b"") == 14695981039346656037
    assert fnv1a_64(b"a") == 0xaf63dc4c8601ec8c
    import hashlib

    # diverse ids (FNV-1a's high bits move slowly for a shared prefix +
    # short suffix, faithfully to the reference — so use distinct ids to
    # exercise both outcomes)
    ids = [hashlib.md5(str(i).encode()).hexdigest() for i in range(50)]
    rows = []
    for i, g in enumerate(ids):
        rows += _conv(g, 1, i * US)
    d = _decisions(_mk_ds(rows), [{"type": "probabilistic", "percent": 30.0,
                                   "hash": "fnv1a"}])
    thr = int(0.30 * 0xFFFFFFFFFFFFFFFF)
    sampled = 0
    for g in ids:
        expect = fnv1a_64(("default-hash-seed" + g).encode())
        assert d[g] == (expect <= thr)
        sampled += d[g]
    assert 0 < sampled < 50


def test_attribute_policies_and_combinator():
    rows = (_conv("err_slow", 2, 0, status="error", latency=900)
            + _conv("err_fast", 2, US, status="error", latency=10)
            + _conv("ok_slow", 2, 2 * US, status="ok", latency=900)
            + _conv("ok_fast", 2, 3 * US, status="ok", latency=10))
    pol = [{"type": "and", "policies": [
        {"type": "string_attribute", "key": 'attributes["status"]',
         "values": ["error"]},
        {"type": "numeric_attribute", "key": 'attributes["latency_ms"]',
         "min_value": 500},
    ]}]
    d = _decisions(_mk_ds(rows), pol)
    assert d == {"err_slow": True, "err_fast": False,
                 "ok_slow": False, "ok_fast": False}


def test_rate_limiting_greedy_per_second():
    # rate_limiting.go:32-49: strict <, non-sampled traces don't consume
    # budget, counter resets each second.  Three convs start in second 0
    # (sizes 3, 4, 2 in (min_ts, conv) order) and one in second 1.
    rows = (_conv("s0a", 3, 0)          # taken: 0+3 < 6 -> sample, taken=3
            + _conv("s0b", 4, 1000)     # 3+4 < 6 false -> NOT sampled
            + _conv("s0c", 2, 2000)     # 3+2 < 6 -> sample (b didn't consume)
            + _conv("s1a", 5, US))      # new second: 0+5 < 6 -> sample
    d = _decisions(_mk_ds(rows), [{"type": "rate_limiting",
                                   "spans_per_second": 6}])
    assert d == {"s0a": True, "s0b": False, "s0c": True, "s1a": True}


def test_composite_budgets_first_match_wins():
    # composite.go:78-120: first matching subpolicy owns the trace; admit
    # iff its per-second budget AND the total budget hold; a rejected
    # trace does not fall through to later subpolicies.
    rows = (_conv("e1", 3, 0, status="error")             # errors: 3 <= 4 ok
            + _conv("e2", 3, 1000, status="error")        # 3+3=6 > 4 -> reject
            + _conv("slow1", 2, 2000, latency=800)        # slow: 2 <= 3 ok
            + _conv("eslow", 1, 3000, status="error",     # matches errors first:
                    latency=900)                          # 3+1=4 <= 4 -> sample
            + _conv("none", 2, 4000))                     # matches nothing
    pol = [{"type": "composite", "max_total_spans_per_second": 100,
            "subpolicies": [
                {"type": "string_attribute", "key": 'attributes["status"]',
                 "values": ["error"], "max_spans_per_second": 4},
                {"type": "numeric_attribute",
                 "key": 'attributes["latency_ms"]', "min_value": 500,
                 "max_spans_per_second": 3},
            ]}]
    d = _decisions(_mk_ds(rows), pol)
    assert d == {"e1": True, "e2": False, "slow1": True,
                 "eslow": True, "none": False}


def test_or_of_policies_and_semi_join_filter():
    rows = (_conv("big", 40, 0) + _conv("err", 2, US, status="error")
            + _conv("small", 2, 2 * US))
    ds = _mk_ds(rows)
    pol = [{"type": "span_count", "min_spans": 30},
           {"type": "string_attribute", "key": 'attributes["status"]',
            "values": ["error"]}]
    kept = tail_sample(ds, pol).to_pandas()
    assert set(kept["conv_id"]) == {"big", "err"}
    assert len(kept) == 42  # whole conversations, row-complete


def test_tail_sample_join_path_matches_broadcast():
    # max_broadcast_keys=0 forces the bucketed semi-join path; output
    # must be row-identical to the broadcast key-set default
    rows = (_conv("big", 40, 0) + _conv("err", 2, US, status="error")
            + _conv("small", 2, 2 * US))
    pol = [{"type": "span_count", "min_spans": 30},
           {"type": "string_attribute", "key": 'attributes["status"]',
            "values": ["error"]}]
    a = tail_sample(_mk_ds(rows), pol).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = tail_sample(_mk_ds(rows), pol, max_broadcast_keys=0).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a[["conv_id", "turn_idx"]].equals(b[["conv_id", "turn_idx"]])
    assert set(b["conv_id"]) == {"big", "err"}


def test_always_and_empty_policy_behavior():
    rows = _conv("a", 2, 0)
    d = _decisions(_mk_ds(rows), [{"type": "always"}])
    assert d == {"a": True}


def test_trace_state_policy():
    # trace_state_filter.go: key=value match inside the W3C tracestate list
    rows = []
    for cid, ts_val in [("a", "vendor=alpha,other=x"), ("b", "other=x"),
                        ("c", "vendor=beta"), ("d", None)]:
        r = _conv(cid, 1, 0)
        r[0]["attr_trace_state"] = ts_val
        rows.append(r[0])
    d = _decisions(_mk_ds(rows), [
        {"type": "trace_state", "key": "vendor", "values": ["alpha", "beta"]}])
    assert d == {"a": True, "b": False, "c": True, "d": False}
