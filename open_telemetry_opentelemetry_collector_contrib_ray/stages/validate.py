"""Data-quality validation (expectations) over a Dataset.

Training-data pipelines gate every ingest on schema/quality contracts
(the Great-Expectations / dbt-test shape); the reference engine's
analog is the filterprocessor + telemetry counters.  Here a rule set
evaluates in ONE map-only pass:

- row-local rules (`not_null`, `in_range`, `matches`, `in_set`,
  `str_len`) compute vectorized boolean masks per batch and emit tiny
  per-rule violation-count partials (the countconnector partial-agg
  idiom — kilobytes reach the combine regardless of input size);
- `unique` needs cross-batch evidence: per-batch distinct keys shrink
  the shuffle, then one bucketed combine counts per-key multiplicity
  (rows - distinct keys = violations);
- `mode="flag"` instead appends one boolean column per rule so bad rows
  can route to a quarantine sink (dead-letter queue: feed the flags to
  RouteIdStage / write_routed).

Rules are (kind, col, params...) dicts; see _ROW_RULES.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mask_not_null(t, col, rule):
    return pc.is_null(t.column(col))


def _mask_in_range(t, col, rule):
    c = t.column(col)
    lo, hi = rule.get("lo"), rule.get("hi")
    bad = pa.array(np.zeros(t.num_rows, dtype=bool))
    if lo is not None:
        bad = pc.or_(bad, pc.less(c, pa.scalar(lo)))
    if hi is not None:
        bad = pc.or_(bad, pc.greater(c, pa.scalar(hi)))
    # null never violates a range rule (not_null owns null policing)
    return pc.fill_null(bad, False)


def _mask_matches(t, col, rule):
    ok = pc.match_substring_regex(t.column(col), rule["pattern"])
    return pc.fill_null(pc.invert(ok), False)


def _mask_in_set(t, col, rule):
    ok = pc.is_in(t.column(col), value_set=pa.array(rule["values"]))
    return pc.fill_null(pc.invert(ok), False)


def _mask_str_len(t, col, rule):
    n = pc.utf8_length(t.column(col))
    return _mask_in_range(pa.table({col: n}), col, rule)


_ROW_RULES = {
    "not_null": _mask_not_null,
    "in_range": _mask_in_range,
    "matches": _mask_matches,
    "in_set": _mask_in_set,
    "str_len": _mask_str_len,
}


def _rule_name(rule: dict) -> str:
    return rule.get("name") or (
        rule["kind"] + "_" + "_".join(
            rule["cols"] if "cols" in rule else [rule["col"]]))


def validate(ds, rules: Sequence[dict], mode: str = "count",
             n_buckets: int = 16):
    """mode="count": Dataset of (rule, n_violations), one row per rule.
    mode="flag": the input with one `bad_<rule>` bool column per
    row-local rule (`unique` is not flaggable row-locally — a row's
    guilt depends on rows elsewhere; use count mode or dedup)."""
    rules = [dict(r) for r in rules]
    if not rules:
        raise ValueError("validate() needs at least one rule")
    for r in rules:
        if r["kind"] != "unique" and r["kind"] not in _ROW_RULES:
            raise ValueError(f"unknown rule kind {r['kind']!r}")
    row_rules = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]

    if mode == "flag":
        if uniq_rules:
            raise ValueError("unique rules cannot flag row-locally")

        def flag(t: pa.Table) -> pa.Table:
            for r in row_rules:
                m = _ROW_RULES[r["kind"]](t, r["col"], r)
                t = t.append_column("bad_" + _rule_name(r), m)
            return t

        return ds.map_batches(flag, batch_format="pyarrow")
    if mode != "count":
        raise ValueError(f"unknown mode {mode!r}")

    from .aggregate import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        names, counts = [], []
        for r in row_rules:
            m = _ROW_RULES[r["kind"]](t, r["col"], r)
            names.append(_rule_name(r))
            counts.append(int(pc.sum(m).as_py() or 0))
        return pa.table({"rule": pa.array(names, pa.string()),
                         "n_violations": pa.array(counts, pa.int64())})

    outs = []
    if row_rules:
        parts = ds.map_batches(partial, batch_format="pyarrow")
        outs.append(grouped_agg(parts, ["rule"],
                                [("sum", "n_violations", "n_violations")],
                                combine="driver"))
    for r in uniq_rules:
        cols = list(r["cols"] if "cols" in r else [r["col"]])
        name = _rule_name(r)

        def pre(t: pa.Table, cols=cols) -> pa.Table:
            # SQL count(*) - count(DISTINCT key) semantics: DISTINCT
            # excludes NULL keys, so EVERY null-key row is a violation
            # (not n-1 of the null group).  Split nulls from the keyed
            # multiplicity count; the null rows travel as one null-key
            # partial row whose n means "all violate".
            valid = None
            for c in cols:
                v = pc.is_valid(t.column(c))
                valid = v if valid is None else pc.and_(valid, v)
            tv = t.filter(valid)
            g = tv.select(cols).group_by(cols).aggregate([([], "count_all")])
            # bind by NAME: pyarrow's aggregate column order has differed
            # across versions; positional rename would mis-bind key/count
            out = pa.table({**{c: g.column(c) for c in cols},
                            "n": pc.cast(g.column("count_all"), pa.int64())})
            n_null = t.num_rows - tv.num_rows
            if n_null:
                null_row = pa.table(
                    {**{c: pa.nulls(1, out.schema.field(c).type)
                        for c in cols},
                     "n": pa.array([n_null], pa.int64())})
                out = pa.concat_tables([out, null_row])
            return out

        # per-batch distinct shrinks the shuffle; the bucketed combine
        # sums multiplicities per key, then violations = sum(n - 1)
        per_key = grouped_agg(ds.map_batches(pre, batch_format="pyarrow"),
                              cols, [("sum", "n", "n")],
                              combine="bucket", n_buckets=n_buckets)

        def viol(t: pa.Table, cols=cols, name=name) -> pa.Table:
            valid = None
            for c in cols:
                v = pc.is_valid(t.column(c))
                valid = v if valid is None else pc.and_(valid, v)
            keyed = t.filter(valid)
            extra = pc.sum(pc.subtract(keyed.column("n"),
                                       pa.scalar(1, pa.int64())))
            nulls = pc.sum(t.filter(pc.invert(valid)).column("n"))
            total = int(extra.as_py() or 0) + int(nulls.as_py() or 0)
            return pa.table({
                "rule": pa.array([name], pa.string()),
                "n_violations": pa.array([total], pa.int64())})

        vparts = per_key.map_batches(viol, batch_format="pyarrow")
        outs.append(grouped_agg(vparts, ["rule"],
                                [("sum", "n_violations", "n_violations")],
                                combine="driver"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
