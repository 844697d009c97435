"""Transform stage: a list of OTTL-lite statements applied per batch.

Analog of the transformprocessor
(/root/reference/processor/transformprocessor/internal/logs/processor.go:53-66):
statements run in order against each batch, with error_mode
ignore/silent/propagate (pkg/ottl/parser.go:306-392).  Statements are
compiled once in ``__init__`` (== once per actor when used with
``concurrency=``), then applied vectorized.

Scratch ``cache["k"]`` columns (ottllog TransformContext cache,
contexts/ottllog/log.go:34-41) live only for the duration of the
statement list and are dropped afterwards.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.ast import Statement, parse_statement


class TransformStage:
    def __init__(self, statements: list[str], error_mode: str = "propagate",
                 keep_cache: bool = False, context: str | None = None,
                 conditions: list[str] | None = None):
        """context: ContextStatements.Context analog
        (internal/common/config.go:14-21,34-38) — 'metric'/'datapoint'
        statements address metric-level fields as ``metric_*`` columns
        of the flattened table; 'resource'/'scope' address res_*/scope_*
        columns; None keeps log-context behavior.

        conditions: ContextStatements.Conditions (config.go:34-38, OR
        semantics): the statement group applies only to records matching
        at least one condition — columnar analog: the OR'd mask AND-s
        into every statement's where mask."""
        if error_mode not in ("ignore", "silent", "propagate"):
            raise ValueError(error_mode)
        from ..functions.ast import parse_condition

        self.compiled: list[Statement] = [parse_statement(s, context=context)
                                          for s in statements]
        self.gates = [parse_condition(c, context=context)
                      for c in (conditions or [])]
        self.error_mode = error_mode
        self.keep_cache = keep_cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch
        gate = None
        if self.gates and t.num_rows:
            gate = pc.fill_null(self.gates[0](t), False)
            for extra in self.gates[1:]:
                gate = pc.or_(gate, pc.fill_null(extra(t), False))
            if isinstance(gate, pa.ChunkedArray):
                gate = gate.combine_chunks()
        for stmt in self.compiled:
            t = stmt.apply(t, error_mode=self.error_mode, gate=gate)
        if not self.keep_cache:
            cache_cols = [c for c in t.column_names if c.startswith("cache_")]
            if cache_cols:
                t = t.select([c for c in t.column_names if c not in set(cache_cols)])
        return t


class FilterStage:
    """filterprocessor analog: DROP rows matching any condition (OR semantics)
    — /root/reference/processor/filterprocessor/logs.go:30-107."""

    def __init__(self, drop_conditions: list[str], context: str | None = None):
        from ..functions.ast import parse_condition

        self.masks = [parse_condition(c, context=context)
                      for c in drop_conditions]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not self.masks or batch.num_rows == 0:
            return batch
        drop = self.masks[0](batch)
        for m in self.masks[1:]:
            drop = pc.or_(drop, m(batch))
        return batch.filter(pc.invert(pc.fill_null(drop, False)))


class KeepStage:
    """Inverse filter: KEEP rows matching the condition (include-mode
    filterconfig analog)."""

    def __init__(self, condition: str, context: str | None = None):
        from ..functions.ast import parse_condition

        self.mask = parse_condition(condition, context=context)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return batch
        return batch.filter(pc.fill_null(self.mask(batch), False))


def make_explode(list_col: str, value_col: str = "value",
                 index_col: str = "index", keep_cols=None, one_based: bool = False):
    """flat_map/unnest over a list column: one output row per list
    element, with its (optionally 1-based) position.  Pure Arrow —
    list_flatten + list_parent_indices + offset arithmetic, no Python
    per row.  `keep_cols` limits which parent columns replicate (default
    all non-list columns; replicate few columns on wide tables — the
    fan-out multiplies every kept byte)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        pos = np.arange(len(flat), dtype=np.int64) - starts[parents]
        if one_based:
            pos += 1
        cols = {}
        keep = keep_cols if keep_cols is not None else \
            [c for c in batch.column_names if c != list_col]
        take = pa.array(parents)
        for c in keep:
            cols[c] = batch.column(c).take(take)
        cols[index_col] = pa.array(pos, pa.int64())
        cols[value_col] = flat
        return pa.table(cols)

    return explode
