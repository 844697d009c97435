"""Routing stage: predicate fan-out to named sinks.

Reference semantics (/root/reference/connector/routingconnector):
- routing table of (condition, pipelines), evaluated in order
  (config.go:24-110);
- match_once=true: sequential first-match-wins, matched rows MOVED out
  (logs.go:63-117 switchLogs);
- match_once=false: every matching route receives a COPY
  (logs.go:119-153 matchAllLogs);
- rows matching nothing go to default_pipelines; error_mode=ignore
  sends condition-eval failures to the default route.

Columnar re-expression: ONE pass computes a ``route_id`` column
(priority-ordered first-match) — no per-route rescan; the partitioned
Parquet write (fileexporter group_by analog,
exporter/fileexporter/grouping_file_exporter.go:116-152) then splits by
``route_id`` in the same pass.  `match_all` necessarily copies rows and
is provided as per-route filtered datasets sharing the parent plan.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ast import parse_condition


@dataclass
class Route:
    name: str
    condition: str


class RouteIdStage:
    """Adds `route_id` via priority-ordered first-match-wins (match_once)."""

    def __init__(self, routes: list[Route], default: str = "default",
                 error_mode: str = "ignore"):
        self.routes = [(r.name, parse_condition(r.condition)) for r in routes]
        self.default = default
        self.error_mode = error_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        route = pa.repeat(pa.scalar(self.default), n)
        assigned = pa.array([False] * n, type=pa.bool_())
        for name, cond in self.routes:
            try:
                m = pc.fill_null(cond(batch), False)
            except Exception:
                if self.error_mode == "ignore":
                    # routingconnector ignore semantics (logs.go:72-117):
                    # an errored condition sends the record to the DEFAULT
                    # route — later routes are NOT tried for it.  Batch
                    # translation: pin every still-unassigned row to
                    # default and stop.
                    break
                raise
            first = pc.and_(m, pc.invert(assigned))
            route = pc.if_else(first, pa.repeat(pa.scalar(name), n), route)
            assigned = pc.or_(assigned, first)
        if "route_id" in batch.column_names:
            return batch.set_column(batch.column_names.index("route_id"), "route_id", route)
        return batch.append_column("route_id", route)


def split_match_once(ds, routes: list[Route], default: str = "default"):
    """match_once fan-out -> {sink_name: Dataset}. One route_id computation,
    each sink filters on it (lazy; sharing the parent plan)."""
    stage = RouteIdStage(routes, default)
    routed = ds.map_batches(stage, batch_format="pyarrow")
    names = [r.name for r in routes] + [default]
    out = {}
    for name in names:
        def keep(t: pa.Table, _n=name) -> pa.Table:  # no expr-string injection
            return t.filter(pc.equal(t.column("route_id"), _n))

        out[name] = routed.map_batches(keep, batch_format="pyarrow")
    return out


def split_match_all(ds, routes: list[Route], default: str = "default"):
    """match_all fan-out: every matching route gets a COPY of the row;
    non-matching rows -> default (routingconnector logs.go:119-153)."""
    conds = [(r.name, r.condition) for r in routes]
    out = {}
    for name, cond in conds:
        mask = parse_condition(cond)
        out[name] = ds.map_batches(
            lambda t, m=mask: t.filter(pc.fill_null(m(t), False)), batch_format="pyarrow")
    all_conds = " or ".join(f"({c})" for _, c in conds) or "false"
    none_mask = parse_condition(all_conds)
    out[default] = ds.map_batches(
        lambda t, m=none_mask: t.filter(pc.invert(pc.fill_null(m(t), False))),
        batch_format="pyarrow")
    return out


def match_all_counts(ds, routes: list[Route], default: str = "default"):
    """Per-sink row counts under match_all COPY semantics in ONE pass:
    each batch evaluates every route mask once and emits one tiny
    (sink, count) partial table; the driver sums the partials.  Replaces
    the N+1-full-scans shape (one .count() per sink) — the input is read
    and parsed exactly once."""
    import numpy as np
    import ray

    conds = [(r.name, parse_condition(r.condition)) for r in routes]
    all_conds = " or ".join(f"({r.condition})" for r in routes) or "false"
    none_mask = parse_condition(all_conds)
    names = [r.name for r in routes] + [default]

    def count_batch(t: pa.Table) -> pa.Table:
        counts = []
        for _, mask in conds:
            counts.append(pc.sum(pc.fill_null(mask(t), False)).as_py() or 0)
        matched = pc.fill_null(none_mask(t), False)
        counts.append(t.num_rows - (pc.sum(matched).as_py() or 0))
        return pa.table({"sink": pa.array(names),
                         "__p_n": pa.array(np.asarray(counts, dtype=np.int64))})

    partial = ds.map_batches(count_batch, batch_format="pyarrow")
    # materialize first: avoids the limit-1 schema probe re-executing the plan
    tables = [t for t in ray.get(partial.materialize().to_arrow_refs())
              if t.num_rows]
    merged = pa.concat_tables(tables) if tables else pa.table(
        {"sink": pa.array(names),
         "__p_n": pa.array(np.zeros(len(names), dtype=np.int64))})
    out = merged.group_by(["sink"]).aggregate([("__p_n", "sum")])
    return pa.table({"sink": out.column("sink"),
                     "n": out.column("__p_n_sum").cast(pa.int64())})


def round_robin_split(ds, n: int, out: str = "rr_sink", by: str | None = None):
    """roundrobinconnector analog (/root/reference/connector/
    roundrobinconnector): spread rows evenly across n pipelines.  In a
    deterministic batch engine "round robin" is a uniform deterministic
    assignment — row-index-within-batch modulo n (load-spreading without
    any key affinity).  ``by`` names a dense arrival-order column (e.g.
    a sequence id): assignment becomes value % n — globally
    deterministic regardless of batching, i.e. the reference's in-order
    rotation replayable by an oracle."""
    import numpy as np

    def assign(t: pa.Table) -> pa.Table:
        if by is not None:
            seq = t.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column(out, pa.array(seq % n))
        idx = np.arange(t.num_rows, dtype=np.int64) % n
        return t.append_column(out, pa.array(idx))

    return ds.map_batches(assign, batch_format="pyarrow")


def failover_write(ds, sink_fns: list, max_attempts: int | None = None):
    """failoverconnector analog (/root/reference/connector/
    failoverconnector): try sinks in priority order; first success wins.
    sink_fns: callables ds -> None (e.g. lambda d: d.write_parquet(p)).
    Ray task retries handle transient failures inside a sink; this
    handles a sink being down entirely."""
    errors = []
    attempted = sink_fns[:max_attempts]
    for i, fn in enumerate(attempted):
        try:
            fn(ds)
            return i
        except Exception as ex:  # noqa: BLE001 — priority failover by design
            errors.append(ex)
    raise RuntimeError(
        f"all {len(attempted)} attempted sinks (of {len(sink_fns)}) failed: {errors}")


def write_routed(ds, out_dir: str, routes: list[Route], default: str = "default"):
    """Single-pass routed sink: compute route_id once, write Parquet
    partitioned by route_id (one subdir per sink — the reference's
    fileexporter group_by layout)."""
    routed = ds.map_batches(RouteIdStage(routes, default), batch_format="pyarrow")
    routed.write_parquet(out_dir, partition_cols=["route_id"], compression="zstd")
    return out_dir
