"""Integer-exact PageRank tests (stages/graph.py)."""

import numpy as np
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.graph import (
    pagerank,
)


def _edges(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], pa.int64()),
        "dst": pa.array([b for _, b in pairs], pa.int64())}))


def _run(pairs, **kw):
    out = pagerank(_edges(pairs), **kw).to_pandas().sort_values("node")
    return dict(zip(out["node"], out["pr"]))


def test_pagerank_hand_computed_chain_and_dangling():
    # a(0) -> b(1): base = 150000; iter1 pr(b) = 150000 + 1e6*17//20
    # iter2 pr(b) = 150000 + (150000*17)//20 (a fell to base); b dangles
    got = _run([(0, 1)], iters=1)
    assert got == {0: 150_000, 1: 1_000_000}
    got = _run([(0, 1)], iters=2)
    assert got == {0: 150_000, 1: 277_500}


def test_pagerank_duplicate_edges_collapse_and_outdeg_split():
    # two distinct out-edges halve each contribution; dup edge ignored
    got = _run([(0, 1), (0, 1), (0, 2)], iters=1)
    assert got[1] == got[2] == 150_000 + (1_000_000 * 17) // 40
    # pure floor per edge: (1e6*17)//(20*2) = 425000
    assert got[1] == 575_000


def test_pagerank_paths_equal_and_deterministic():
    rng = np.random.RandomState(7)
    pairs = [(int(a), int(b)) for a, b in rng.randint(0, 60, (400, 2))
             if a != b]
    bc = _run(pairs, iters=3)
    jn = _run(pairs, iters=3, max_broadcast_nodes=0, n_buckets=8)
    assert bc == jn
    assert bc == _run(pairs, iters=3)  # re-execution bit-equal


def test_pagerank_empty_edges():
    out = pagerank(_edges([]))
    # Dataset.to_pandas drops columns on 0 rows (Ray quirk); the plan
    # schema is the contract
    assert out.count() == 0
    assert out.schema().names == ["node", "pr"]
