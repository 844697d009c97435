"""Iterative graph algorithms over edge Datasets, Ray-Data-first.

PageRank here is the INTEGER-EXACT damped variant: ranks start at
``scale`` per node and each iteration sets

    pr'(v) = base + sum over edges (u -> v) of
             (pr(u) * damp_num) // (damp_den * outdeg(u))

with ``base = scale * (damp_den - damp_num) // damp_den`` and dangling
mass (nodes with outdeg 0) dropped — a documented variant chosen so the
arithmetic is order-independent (every per-edge term is an exact int64
floor BEFORE the sum), which makes the distributed result bit-equal to
a DuckDB replay (queries.py pagerank_parts) and to any re-execution.
Overflow contract: ``scale * n_nodes * damp_num`` must fit int64.

Decomposition (the broadcast/co-partition auto-switch idiom of
tail_sample / substring dedup):

- distinct edges and out-degrees: ONE bucketed hash aggregate each,
  materialized once and reused by every iteration.
- node table <= ``max_broadcast_nodes``: ranks live on the driver as
  sorted numpy arrays, broadcast via ray.put per iteration; each edge
  batch looks its sources up with searchsorted, floors its per-edge
  contributions, pre-aggregates by destination INSIDE the batch, and
  only (node, partial-sum) rows — bounded by distinct destinations per
  batch — reach the one bucketed combine.  Edges never reshuffle.
- bigger node tables: ranks stay a Dataset; each iteration is
  rank |><| outdeg (node-sized), edges |><| ranks co-partitioned on src,
  a bucketed destination sum, and a left join back onto the node table
  for inbound-less nodes; the rank Dataset is materialized per
  iteration to cut lineage growth.  Both paths are pinned equal in
  tests/test_graph.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _distinct(ds, cols, n_buckets: int):
    from .aggregate import grouped_agg

    out = grouped_agg(ds, cols, [("count", None, "__n")],
                      combine="bucket", n_buckets=n_buckets)
    return out.map_batches(lambda t: t.select(list(cols)),
                           batch_format="pyarrow")


def _collect(ds) -> pa.Table:
    import ray

    tables = [t for t in ray.get(ds.materialize().to_arrow_refs())
              if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


def pagerank(edges, src: str = "src", dst: str = "dst", iters: int = 3,
             scale: int = 1_000_000, damp_num: int = 17,
             damp_den: int = 20, max_broadcast_nodes: int = 4_000_000,
             n_buckets: int = 64):
    """Integer-exact PageRank over a directed edge Dataset (int64 node
    ids in columns ``src``/``dst``; duplicate edges collapse to one).
    Returns a Dataset with columns (node, pr), both int64."""
    import ray
    import ray.data as rd

    from .aggregate import grouped_agg, grouped_sum

    base = scale * (damp_den - damp_num) // damp_den

    def as_i64(col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"node": pc.cast(t.column(col), pa.int64())})
        return f

    edges_d = _distinct(edges, [src, dst], n_buckets).materialize()
    deg = grouped_agg(edges_d, [src], [("count", None, "outdeg")],
                      combine="bucket", n_buckets=n_buckets)
    nodes = _distinct(
        edges_d.map_batches(as_i64(src), batch_format="pyarrow").union(
            edges_d.map_batches(as_i64(dst), batch_format="pyarrow")),
        ["node"], n_buckets).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "pr": pa.array([], pa.int64())}))

    if n_nodes <= max_broadcast_nodes:
        return _pagerank_broadcast(edges_d, deg, nodes, src, dst, iters,
                                   scale, base, damp_num, damp_den,
                                   n_buckets)

    # ---- co-partitioned path: node table too big to hold driver-side
    from .join import bucketed_hash_join

    div_ds = deg.map_batches(
        lambda t: pa.table({
            "node": pc.cast(t.column(src), pa.int64()),
            "div": pc.multiply(pc.cast(t.column("outdeg"), pa.int64()),
                               pa.scalar(damp_den, pa.int64()))}),
        batch_format="pyarrow").materialize()
    rank_ds = nodes.map_batches(
        lambda t: t.append_column(
            "pr", pa.array(np.full(t.num_rows, scale, np.int64))),
        batch_format="pyarrow").materialize()
    for _ in range(iters):
        src_rank = bucketed_hash_join(rank_ds, div_ds, on=["node"],
                                      how="inner", n_buckets=n_buckets)
        src_rank = src_rank.map_batches(
            lambda t: t.rename_columns(
                [src if c == "node" else c for c in t.column_names]),
            batch_format="pyarrow")
        joined = bucketed_hash_join(edges_d, src_rank, on=[src],
                                    n_buckets=n_buckets)

        def contrib(t: pa.Table) -> pa.Table:
            c = pc.divide(pc.multiply(t.column("pr"),
                                      pa.scalar(damp_num, pa.int64())),
                          t.column("div"))
            g = pa.table({"node": pc.cast(t.column(dst), pa.int64()),
                          "c": c}).group_by("node").aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])

        summed = grouped_sum(
            joined.map_batches(contrib, batch_format="pyarrow"),
            ["node"], "c", alias="c", combine="bucket")
        merged = bucketed_hash_join(nodes, summed, on=["node"], how="left",
                                    n_buckets=n_buckets)
        rank_ds = merged.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "pr": pc.add(pc.fill_null(pc.cast(t.column("c"), pa.int64()),
                                          0),
                             pa.scalar(base, pa.int64()))}),
            batch_format="pyarrow").materialize()
    return rank_ds


def _pagerank_broadcast(edges_d, deg, nodes, src, dst, iters, scale, base,
                        damp_num, damp_den, n_buckets):
    import ray
    import ray.data as rd

    from .aggregate import grouped_sum

    node_tbl = _collect(nodes)
    node_arr = np.sort(node_tbl.column("node").to_numpy(
        zero_copy_only=False).astype(np.int64))
    deg_tbl = _collect(deg)
    order = np.argsort(deg_tbl.column(src).to_numpy(zero_copy_only=False))
    src_arr = deg_tbl.column(src).to_numpy(
        zero_copy_only=False).astype(np.int64)[order]
    div_arr = deg_tbl.column("outdeg").to_numpy(
        zero_copy_only=False).astype(np.int64)[order] * damp_den

    pr = np.full(len(node_arr), scale, dtype=np.int64)
    for _ in range(iters):
        num_arr = pr[np.searchsorted(node_arr, src_arr)] * damp_num
        ref = ray.put((src_arr, num_arr, div_arr))

        def contrib(t: pa.Table) -> pa.Table:
            s, num, div = ray.get(ref)
            es = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            i = np.searchsorted(s, es)  # every src has outdeg >= 1
            g = pa.table({
                "node": pc.cast(t.column(dst), pa.int64()),
                "c": pa.array(num[i] // div[i], pa.int64()),
            }).group_by("node").aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])

        summed = _collect(grouped_sum(
            edges_d.map_batches(contrib, batch_format="pyarrow"),
            ["node"], "c", alias="c", combine="bucket"))
        pr = np.full(len(node_arr), base, dtype=np.int64)
        if summed.num_rows:
            idx = np.searchsorted(
                node_arr,
                summed.column("node").to_numpy(
                    zero_copy_only=False).astype(np.int64))
            pr[idx] += summed.column("c").to_numpy(zero_copy_only=False)
    return rd.from_arrow(pa.table({"node": pa.array(node_arr, pa.int64()),
                                   "pr": pa.array(pr, pa.int64())}))


def triangle_count(edges, src: str = "src", dst: str = "dst",
                   n_buckets: int = 64,
                   max_broadcast_nodes: int = 4_000_000,
                   max_broadcast_edges: int = 10_000_000) -> int:
    """Exact triangle count of the undirected simple graph given by an
    edge Dataset (self-loops and duplicate/reversed edges collapse).

    Degree-ordered orientation first — every edge points from its
    lower-(deg, id) endpoint — which bounds each node's out-degree by
    O(sqrt(m)), so the wedge self-join cannot explode on hub nodes (the
    node-iterator++ bound; a naive a<b orientation is quadratic in hub
    degree).  Pipeline: canonicalize+distinct (one bucketed aggregate),
    degree count (node-sized), orient (broadcast sorted degree arrays
    when nodes <= max_broadcast_nodes, two co-partitioned joins past
    it), then close the wedges:

    - when the oriented edge set also fits driver-side (nodes within
      the broadcast bound AND edges <= max_broadcast_edges), closing
      edges are rank-encoded to a sorted int64 key array
      (u_rank * n_nodes + v_rank), ray.put once, and the count happens
      INSIDE the wedge join's per-bucket reduce via searchsorted
      membership — wedges are never materialized or reshuffled; only
      one int per bucket leaves the join.
    - otherwise the wedges stream into a closing-edge SEMI join
      (one more co-partitioned shuffle) and a distributed count.

    Every step is integer/set arithmetic — the result is exact and
    SQL-replayable (queries.py triangle_parts)."""
    from .aggregate import grouped_agg
    from .join import bucketed_hash_join

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column(src), pa.int64())
        d = pc.cast(t.column(dst), pa.int64())
        tb = pa.table({"a": pc.min_element_wise(s, d),
                       "b": pc.max_element_wise(s, d)})
        return tb.filter(pc.not_equal(tb.column("a"), tb.column("b")))

    und = _distinct(edges.map_batches(canon, batch_format="pyarrow"),
                    ["a", "b"], n_buckets).materialize()

    def col_nodes(col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column(col)})
        return f

    deg = grouped_agg(
        und.map_batches(col_nodes("a"), batch_format="pyarrow").union(
            und.map_batches(col_nodes("b"), batch_format="pyarrow")),
        ["node"], [("count", None, "deg")],
        combine="bucket", n_buckets=n_buckets)

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("dega").to_numpy(zero_copy_only=False)
        db = t.column("degb").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "u": pa.array(np.where(a_first, a, b), pa.int64()),
            "v": pa.array(np.where(a_first, b, a), pa.int64()),
            "degv": pa.array(np.where(a_first, db, da), pa.int64())})

    n_nodes_est = None
    deg_mat = deg.materialize()
    n_nodes_est = deg_mat.count()
    if n_nodes_est <= max_broadcast_nodes:
        import ray

        deg_tbl = _collect(deg_mat)
        order = np.argsort(deg_tbl.column("node").to_numpy(
            zero_copy_only=False))
        nd = deg_tbl.column("node").to_numpy(
            zero_copy_only=False).astype(np.int64)[order]
        dg = deg_tbl.column("deg").to_numpy(
            zero_copy_only=False).astype(np.int64)[order]
        ref = ray.put((nd, dg))

        def attach_and_orient(t: pa.Table) -> pa.Table:
            nodes, degs = ray.get(ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            da = degs[np.searchsorted(nodes, a)]
            db = degs[np.searchsorted(nodes, b)]
            return orient(pa.table({
                "a": t.column("a"), "b": t.column("b"),
                "dega": pa.array(da, pa.int64()),
                "degb": pa.array(db, pa.int64())}))

        od = und.map_batches(attach_and_orient,
                             batch_format="pyarrow").materialize()
    else:
        d_a = deg_mat.map_batches(
            lambda t: t.rename_columns(["a", "dega"]),
            batch_format="pyarrow")
        d_b = deg_mat.map_batches(
            lambda t: t.rename_columns(["b", "degb"]),
            batch_format="pyarrow")
        j = bucketed_hash_join(und, d_a, on=["a"], n_buckets=n_buckets)
        j = bucketed_hash_join(j, d_b, on=["b"], n_buckets=n_buckets)
        od = j.map_batches(orient, batch_format="pyarrow").materialize()

    if n_nodes_est <= max_broadcast_nodes:
        m = od.count()
        if m <= max_broadcast_edges:
            import ray

            from .aggregate import bucketed_group_transform

            keys_tbl = _collect(od.map_batches(
                lambda t: t.select(["u", "v"]), batch_format="pyarrow"))
            n = np.int64(len(nd))
            ek = np.sort(
                np.searchsorted(nd, keys_tbl.column("u").to_numpy(
                    zero_copy_only=False)) * n
                + np.searchsorted(nd, keys_tbl.column("v").to_numpy(
                    zero_copy_only=False)))
            kref = ray.put((nd, ek))

            def count_closed(df):
                # one bucket's oriented edges, ALL wedges generated in
                # numpy (no pandas merge): sort by (u, degv, v), pair
                # each row with its later group-mates via the
                # ranges-from-reps trick, then membership-count against
                # the broadcast rank-encoded closing-edge keys.
                # Chunked so peak pair memory stays ~tens of MB.
                import pandas as pd

                nodes, ekeys = ray.get(kref)
                nn = np.int64(len(nodes))
                df = df.sort_values(["u", "degv", "v"], kind="stable")
                u = df["u"].to_numpy()
                vr = np.searchsorted(nodes, df["v"].to_numpy())
                # local position within each run of equal u
                grp_start = np.flatnonzero(
                    np.r_[True, u[1:] != u[:-1]])
                run_id = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
                pos = np.arange(len(u)) - grp_start[run_id]
                run_len = np.diff(np.r_[grp_start, len(u)])
                reps = (run_len[run_id] - 1 - pos).astype(np.int64)
                total = 0
                CH = 4_000_000
                i0 = 0
                while i0 < len(u):
                    i1 = i0
                    acc = 0
                    while i1 < len(u) and acc + reps[i1] <= CH:
                        acc += reps[i1]
                        i1 += 1
                    i1 = max(i1, i0 + 1)
                    r = reps[i0:i1]
                    first = np.repeat(np.arange(i0, i1), r)
                    off = np.arange(len(first)) \
                        - np.repeat(np.cumsum(r) - r, r)
                    second = first + 1 + off
                    q = vr[first] * nn + vr[second]
                    j = np.searchsorted(ekeys, q)
                    j[j == len(ekeys)] = 0
                    if len(ekeys):
                        total += int((ekeys[j] == q).sum())
                    i0 = i1
                return pd.DataFrame({"c": [total]})

            per_bucket = bucketed_group_transform(od, ["u"],
                                                  count_closed,
                                                  n_buckets=n_buckets)
            return int(per_bucket.sum("c") or 0)

    wedges = bucketed_hash_join(od, od, on=["u"], n_buckets=n_buckets,
                                suffix="_r")

    def pick(t: pa.Table) -> pa.Table:
        dv = t.column("degv")
        dr = t.column("degv_r")
        keep = pc.or_(pc.less(dv, dr),
                      pc.and_(pc.equal(dv, dr),
                              pc.less(t.column("v"), t.column("v_r"))))
        t = t.filter(keep)
        return pa.table({"u": t.column("v"), "v": t.column("v_r")})

    closing = od.map_batches(lambda t: t.select(["u", "v"]),
                             batch_format="pyarrow")
    closed = bucketed_hash_join(
        wedges.map_batches(pick, batch_format="pyarrow"),
        closing, on=["u", "v"], how="semi", n_buckets=n_buckets)
    return closed.count()


def bfs_distances(edges, seeds, src: str = "src", dst: str = "dst",
                  max_hops: int = 3, n_buckets: int = 32,
                  undirected: bool = False,
                  max_broadcast_frontier: int = 4_000_000):
    """Level-synchronous multi-source BFS: Dataset of (node, dist) with
    dist = minimum hop count from any seed, capped at ``max_hops``.

    Per hop, neighbors of the frontier are found and the visited set
    subtracted.  Two paths, auto-switched per hop on the CURRENT
    frontier/visited size (the tail_sample / pagerank idiom):

    - small frontier+visited (<= max_broadcast_frontier): both are
      broadcast once via ray.put as sorted numpy arrays; each edge
      batch keeps dst where src is in the frontier (searchsorted
      membership) and drops already-visited dst MAP-SIDE, so the only
      shuffle is the distinct over new node ids.  Edges never move.
    - big frontier: ONE bucketed semi join (edges vs frontier on src),
      a bucketed distinct, and ONE bucketed anti join against visited
      — all node-id-sized exchanges.

    The result is exact min-dist BFS either way (level-synchronous
    expansion discovers every node at its true distance first); both
    paths are pinned equal in tests/test_graph.py.
    """
    import ray
    import ray.data as rd

    from .join import bucketed_hash_join

    if undirected:
        def rev(t: pa.Table) -> pa.Table:
            return pa.table({src: t.column(dst), dst: t.column(src)})

        edges = edges.union(edges.map_batches(rev, batch_format="pyarrow"))

    seed_list = sorted({int(s) for s in seeds})
    if not seed_list:
        raise ValueError("bfs_distances needs at least one seed")
    frontier = rd.from_arrow(pa.table({"node": pa.array(seed_list,
                                                        pa.int64())}))
    visited = rd.from_arrow(pa.table({
        "node": pa.array(seed_list, pa.int64()),
        "dist": pa.array([0] * len(seed_list), pa.int64())})).materialize()
    n_frontier, n_visited = len(seed_list), len(seed_list)

    for h in range(1, max_hops + 1):
        if n_frontier + n_visited <= max_broadcast_frontier:
            f_arr = np.sort(_collect(frontier).column("node")
                            .to_numpy(zero_copy_only=False).astype(np.int64))
            v_arr = np.sort(_collect(
                visited.map_batches(lambda t: t.select(["node"]),
                                    batch_format="pyarrow"))
                .column("node").to_numpy(zero_copy_only=False)
                .astype(np.int64))
            ref = ray.put((f_arr, v_arr))

            def probe(t: pa.Table) -> pa.Table:
                fa, va = ray.get(ref)
                s = t.column(src).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                d = t.column(dst).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)

                def member(arr, keys):
                    if not len(arr):
                        return np.zeros(len(keys), bool)
                    j = np.searchsorted(arr, keys)
                    j[j == len(arr)] = 0
                    return arr[j] == keys

                keep = member(fa, s) & ~member(va, d)
                return pa.table({"node": pa.array(d[keep], pa.int64())})

            new = _distinct(edges.map_batches(probe, batch_format="pyarrow"),
                            ["node"], n_buckets).materialize()
        else:
            f_src = frontier.map_batches(
                lambda t: t.rename_columns([src]), batch_format="pyarrow")
            hit = bucketed_hash_join(edges, f_src, on=[src], how="semi",
                                     n_buckets=n_buckets)
            nbrs = _distinct(hit.map_batches(
                lambda t: pa.table({"node": t.column(dst)}),
                batch_format="pyarrow"), ["node"], n_buckets)
            new = bucketed_hash_join(
                nbrs,
                visited.map_batches(lambda t: t.select(["node"]),
                                    batch_format="pyarrow"),
                on=["node"], how="anti", n_buckets=n_buckets).materialize()
        n_frontier = new.count()
        if n_frontier == 0:
            break
        new_d = new.map_batches(
            lambda t, _h=h: t.append_column(
                "dist", pa.array(np.full(t.num_rows, _h), pa.int64())),
            batch_format="pyarrow")
        visited = visited.union(new_d).materialize()
        n_visited += n_frontier
        frontier = new
    return visited
