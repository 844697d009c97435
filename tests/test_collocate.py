import math

import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.collocate import (
    collocations,
)


def _run(texts, **kw):
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = collocations(rd.from_arrow(tbl), n_buckets=4, **kw)
    return {(r["left"], r["right"]): (r["c"], r["pmi"])
            for r in out.take_all()}


def test_window_and_counts():
    got = _run(["a b c", "a b"], window=3, min_count=1)
    # pairs lag1: (a,b)x2 (b,c); lag2: (a,c) -> N=4
    assert got[("a", "b")][0] == 2
    assert got[("b", "c")][0] == 1
    assert got[("a", "c")][0] == 1
    assert ("c", "a") not in got  # ordered, same doc only
    # PMI(a,b) = ln(2*4 / (cl(a)=3 * cr(b)=2)) = ln(8/6)
    assert abs(got[("a", "b")][1] - math.log(8 / 6)) < 1e-12


def test_pairs_never_cross_documents():
    got = _run(["x y", "z w"], window=4, min_count=1)
    assert set(got) == {("x", "y"), ("z", "w")}


def test_min_count_prunes_output_but_not_marginals():
    # (a,b) twice, (a,c) once: with min_count=2 only (a,b) survives,
    # but its PMI still uses N=3 and cl(a)=3 from the full population
    got = _run(["a b", "a b", "a c"], window=2, min_count=2)
    assert set(got) == {("a", "b")}
    c, pmi = got[("a", "b")]
    assert c == 2
    assert abs(pmi - math.log(2 * 3 / (3 * 2))) < 1e-12


def test_case_folding_and_punct():
    got = _run(["Hello, WORLD!"], window=2, min_count=1)
    assert set(got) == {("hello", "world")}


def test_pruned_marginals_bit_identical():
    # corpus where the prune binds: 'q'/'z' sides have full marginals
    # of 1 and are dropped from the broadcast.  The surviving PMI must
    # be BIT-identical to the unpruned (min_count=1, filtered after)
    # computation.
    texts = ["a b", "a b", "a c", "q z", "b a", "b a", "c q"]
    full = _run(texts, window=2, min_count=1)
    pruned = _run(texts, window=2, min_count=2)
    expect = {k: v for k, v in full.items() if v[0] >= 2}
    assert set(pruned) == set(expect)
    for k in expect:
        assert pruned[k][0] == expect[k][0]
        assert pruned[k][1] == expect[k][1]  # exact, not approx


def test_max_marginals_guard():
    import pytest

    with pytest.raises(ValueError, match="max_marginals"):
        _run(["a b c d e f g h"], window=2, min_count=1, max_marginals=3)
