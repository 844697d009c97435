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


def test_triangle_count_hand_graphs():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.graph import (
        triangle_count,
    )

    # K4 has 4 triangles; dup/reversed edges and a self-loop collapse
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert triangle_count(_edges(k4 + [(2, 2), (0, 1)])) == 4
    # a path has none
    assert triangle_count(_edges([(0, 1), (1, 2), (2, 3)])) == 0
    # two triangles sharing an edge
    assert triangle_count(_edges([(0, 1), (1, 2), (0, 2), (2, 3),
                                  (1, 3)])) == 2


def test_triangle_count_paths_equal_vs_bruteforce():
    import itertools

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.graph import (
        triangle_count,
    )

    rng = np.random.RandomState(11)
    pairs = {(int(min(a, b)), int(max(a, b)))
             for a, b in rng.randint(0, 25, (120, 2)) if a != b}
    adj = set(pairs)
    brute = sum(1 for x, y, z in itertools.combinations(range(25), 3)
                if (x, y) in adj and (y, z) in adj and (x, z) in adj)
    got_bc = triangle_count(_edges(sorted(pairs)))
    got_semi = triangle_count(_edges(sorted(pairs)),
                              max_broadcast_edges=0, n_buckets=8)
    got_jn = triangle_count(_edges(sorted(pairs)), max_broadcast_nodes=0,
                            n_buckets=8)
    assert got_bc == got_semi == got_jn == brute


def test_bfs_hand_graph_and_path_parity():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.graph import (
        bfs_distances,
    )

    # path 1-2-3-4-5 plus a detached pair 8-9; directed edges ascending
    edges = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3, 4, 8], pa.int64()),
        "dst": pa.array([2, 3, 4, 5, 9], pa.int64()),
    }))
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, [1], max_hops=3).take_all()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond cap, 8/9 unreachable

    # undirected: seed in the middle reaches both ways
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, [3], max_hops=2,
                                  undirected=True).take_all()}
    assert got == {3: 0, 2: 1, 4: 1, 1: 2, 5: 2}

    # broadcast path == bucketed join path
    a = bfs_distances(edges, [1, 8], max_hops=4,
                      undirected=True).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = bfs_distances(edges, [1, 8], max_hops=4, undirected=True,
                      max_broadcast_frontier=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["node"]) == {1, 2, 3, 4, 5, 8, 9}
