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
