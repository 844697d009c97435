import numpy as np
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.join import (
    bloom_prefilter,
    bucketed_hash_join,
    build_key_bloom,
)


def _big(n=2000):
    return pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(np.arange(n, dtype=np.int64) * 7),
    })


def test_bloom_prefilter_superset_of_matches():
    # keys 0..99 on the small side; every true match must survive the prune
    big = rd.from_arrow(_big())
    keys = rd.from_arrow(pa.table({"k": pa.array(range(0, 100, 3),
                                                 pa.int64())}))
    pruned = bloom_prefilter(big, keys, on=["k"])
    kept = {r["k"] for r in pruned.take_all()}
    assert set(range(0, 100, 3)) <= kept


def test_bloom_prefilter_prunes_disjoint_keys():
    big = rd.from_arrow(_big(5000))
    keys = rd.from_arrow(pa.table({"k": pa.array(
        np.arange(1_000_000, 1_000_050, dtype=np.int64))}))
    pruned = bloom_prefilter(big, keys, on=["k"])
    # disjoint key sets: nothing matches; bloom FP rate at m=2^23, k=4,
    # 50 items is ~0 — require >99.9% pruned
    assert pruned.count() <= 5


def test_bloom_then_exact_semi_join_is_exact():
    big = rd.from_arrow(_big(1000))
    keys_tbl = pa.table({"k": pa.array([5, 10, 15, 999, 1234], pa.int64())})
    keys = rd.from_arrow(keys_tbl)
    pruned = bloom_prefilter(big, keys, on=["k"], m_bits=1 << 10)  # tiny ->
    # force false positives through the exact join; result must still match
    out = bucketed_hash_join(pruned, keys, on=["k"], how="semi",
                             n_buckets=4)
    got = sorted(r["k"] for r in out.take_all())
    assert got == [5, 10, 15, 999]


def test_bloom_prefilter_drops_null_keys():
    big = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 2, None], pa.int64()),
        "payload": pa.array([1, 2, 3, 4], pa.int64())}))
    keys = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    got = sorted(r["k"] for r in bloom_prefilter(big, keys,
                                                 on=["k"]).take_all())
    assert got == [1, 2]


def test_bloom_right_on_and_prebuilt_reuse():
    big = rd.from_arrow(_big(500))
    keys = rd.from_arrow(pa.table({"other": pa.array([3, 7], pa.int64())}))
    bf = build_key_bloom(keys, ["other"])
    out1 = bloom_prefilter(big, None, on=["k"], bloom=bf)
    out2 = bloom_prefilter(big, keys, on=["k"], right_on=["other"])
    g1 = {r["k"] for r in out1.take_all()}
    g2 = {r["k"] for r in out2.take_all()}
    assert {3, 7} <= g1 and g1 == g2
