"""Enrichment stages: broadcast-lookup attribute injection + attraction actions.

References (semantics only):
- attributesprocessor action list insert/update/upsert/delete/hash/
  extract/convert: /root/reference/internal/coreinternal/attraction/
  attraction.go:106-142 (enum), :287-342 (executor), :414-434 (extract).
- k8sattributesprocessor / geoipprocessor stateful lookup enrich:
  processor/k8sattributesprocessor/processor.go,
  processor/geoipprocessor/geoip_processor.go:29-80.
- resourcedetectionprocessor constant stamping:
  processor/resourcedetectionprocessor/config.go:28-47.

Scale design: the lookup table is SMALL-SIDE BROADCAST — `ray.put` once
on the driver, each actor `ray.get`s it in ``__init__`` (one copy per
node in the shared object store, never re-shipped per batch, never a
shuffle join).  The lookup itself is vectorized dictionary encoding
(pc.index_in + take).
"""

from __future__ import annotations

import hashlib
from typing import Any, Mapping

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ast import parse_condition


def _coerce_cast(arr: pa.Array, typ: pa.DataType) -> pa.Array:
    """Cast with invalid-values-to-null semantics (Go strconv failure ->
    action error -> value untouched/null, attraction.go convertValue)."""
    try:
        return pc.cast(arr, typ, safe=False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        import pandas as pd

        if pa.types.is_integer(typ) or pa.types.is_floating(typ):
            s = pd.to_numeric(pd.Series(arr.to_pylist()), errors="coerce")
            if pa.types.is_integer(typ):
                return pa.array(s.astype("Int64"), type=typ)
            return pa.array(s, type=typ)
        return pa.array([None if v is None else str(v) for v in arr.to_pylist()], type=typ)


class LookupEnricher:
    """Actor-pool stage: key column -> N output attr columns from a dict.

    lookup: {key: {out_field: value}} — pass either the dict itself or a
    ray.ObjectRef of it (preferred at scale: one object-store copy).
    Missing keys get `defaults` (insert-if-absent, attraction INSERT).
    """

    def __init__(self, lookup: Any, key_col: str = "tool", prefix: str = "attr_",
                 defaults: Mapping[str, Any] | None = None):
        import ray

        if isinstance(lookup, ray.ObjectRef):
            lookup = ray.get(lookup)
        self.key_col = key_col
        self.prefix = prefix
        keys = sorted(lookup)
        fields: dict[str, list] = {}
        for k in keys:
            for f, v in lookup[k].items():
                fields.setdefault(f, [])
        self.defaults = dict(defaults or {})
        for f in self.defaults:  # default-only fields still become columns
            fields.setdefault(f, [])
        for f in fields:
            fields[f] = [lookup[k].get(f, self.defaults.get(f)) for k in keys]
        self._keys = pa.array(keys)  # key type inferred (string tool names, int ids, ...)
        self._columns = {f: pa.array(vals) for f, vals in fields.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column(self.key_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        idx = pc.index_in(src, value_set=self._keys)
        out = batch
        for f, vals in self._columns.items():
            col = pc.take(vals, idx)
            default = self.defaults.get(f)
            if default is not None:
                col = pc.fill_null(col, default)
            name = self.prefix + f
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name), name, col)
            else:
                out = out.append_column(name, col)
        return out


class ResourceStamper:
    """resourcedetection analog: constants computed once on the driver,
    stamped as literal res_* columns on every batch."""

    def __init__(self, resource: Mapping[str, Any], prefix: str = "res_"):
        self.resource = dict(resource)
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        n = batch.num_rows
        for k, v in self.resource.items():
            name = self.prefix + k
            col = pa.repeat(pa.scalar(v), n)
            if name in out.column_names:  # idempotent re-stamp
                out = out.set_column(out.column_names.index(name), name, col)
            else:
                out = out.append_column(name, col)
        return out


class SchemaRenameStage:
    """schemaprocessor analog (processor/schemaprocessor/): translate
    between semantic-convention versions by renaming attribute keys
    (flat-columnar: a column rename map, applied only where present)."""

    def __init__(self, renames: Mapping[str, str], prefix: str = "attr_"):
        self.renames = {prefix + k: prefix + v for k, v in renames.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = [self.renames.get(c, c) for c in batch.column_names]
        return batch.rename_columns(names)


class RedactionStage:
    """redactionprocessor analog (processor/redactionprocessor/config.go:10-31):
    allowlist of attribute keys (others deleted), blocklist of value
    regexes (matches masked), plus summary attributes naming what was
    redacted/deleted."""

    def __init__(self, allowed_keys: list[str] | None = None,
                 blocked_value_patterns: list[str] | None = None,
                 mask: str = "****", prefix: str = "attr_", summary: bool = True):
        self.allowed = set(allowed_keys or [])
        self.blocked = list(blocked_value_patterns or [])
        self.mask = mask
        self.prefix = prefix
        self.summary = summary

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        n = batch.num_rows
        deleted = []
        if self.allowed:
            drop = [c for c in out.column_names
                    if c.startswith(self.prefix) and c[len(self.prefix):] not in self.allowed]
            deleted = [c[len(self.prefix):] for c in drop]
            out = out.select([c for c in out.column_names if c not in set(drop)])
        masked_counts = None
        for pat in self.blocked:
            for c in list(out.column_names):
                if not c.startswith(self.prefix):
                    continue
                arr = out.column(c)
                if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
                    continue
                hit = pc.fill_null(pc.match_substring_regex(arr, pat), False)
                masked = pc.if_else(hit, pa.repeat(pa.scalar(self.mask), n), arr)
                out = out.set_column(out.column_names.index(c), c, masked)
                hits = pc.cast(hit, pa.int64())
                masked_counts = hits if masked_counts is None else pc.add(masked_counts, hits)
        if self.summary:
            out = out.append_column(
                "redaction_masked_count",
                masked_counts if masked_counts is not None
                else pa.array([0] * n, pa.int64()))
            out = out.append_column(
                "redaction_deleted_keys",
                pa.repeat(pa.scalar(",".join(sorted(deleted))), n))
        return out


class AttributesStage:
    """attributesprocessor: ordered action list over attr_* columns.

    Actions (attraction.go:106-142):
      {"action": "insert"|"update"|"upsert", "key", "value"| "from_attribute"}
      {"action": "delete", "key" | "pattern"}
      {"action": "hash", "key"}                     (SHA-256, in place)
      {"action": "extract", "key", "pattern"}       (named groups -> new attrs)
      {"action": "convert", "key", "converted_type"}  (int|double|string)
    Optional include/exclude OTTL conditions gate which ROWS the actions
    touch (filterconfig match-properties analog, config.go:19-141).
    """

    _TYPES = {"int": pa.int64(), "double": pa.float64(), "string": pa.string()}

    def __init__(self, actions: list[dict], include: str | None = None,
                 exclude: str | None = None, prefix: str = "attr_"):
        self.actions = [dict(a) for a in actions]  # never mutate caller config
        self.prefix = prefix
        self.include = parse_condition(include) if include else None
        self.exclude = parse_condition(exclude) if exclude else None
        import re as _re

        for a in self.actions:
            if a.get("pattern"):
                a["_re"] = _re.compile(a["pattern"])

    def _row_mask(self, batch: pa.Table):
        mask = None
        if self.include is not None:
            mask = pc.fill_null(self.include(batch), False)
        if self.exclude is not None:
            ex = pc.invert(pc.fill_null(self.exclude(batch), False))
            mask = ex if mask is None else pc.and_(mask, ex)
        return mask

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        n = batch.num_rows
        mask = self._row_mask(batch)

        def setcol(name, arr, m):
            nonlocal out
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if m is not None:
                cur = out.column(name).combine_chunks() if name in out.column_names \
                    else pa.nulls(n, arr.type)
                if cur.type != arr.type:
                    try:
                        cur = cur.cast(arr.type)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                        cur = pa.nulls(n, arr.type)
                arr = pc.if_else(m, arr, cur)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name), name, arr)
            else:
                out = out.append_column(name, arr)

        for a in self.actions:
            act = a["action"]
            key = self.prefix + a["key"] if "key" in a else None
            if act in ("insert", "update", "upsert"):
                if "from_attribute" in a:
                    src_name = self.prefix + a["from_attribute"]
                    value = out.column(src_name).combine_chunks() if src_name in out.column_names else pa.nulls(n)
                else:
                    value = pa.repeat(pa.scalar(a["value"]), n)
                m = mask
                cur = out.column(key) if key in out.column_names else None
                if act == "insert":
                    extra = pc.is_null(cur.combine_chunks()) if cur is not None else None
                    if cur is not None and extra is not None:
                        m = extra if m is None else pc.and_(m, extra)
                elif act == "update":
                    if cur is None:
                        continue
                    extra = pc.is_valid(cur.combine_chunks())
                    m = extra if m is None else pc.and_(m, extra)
                setcol(key, value, m)
            elif act == "delete":
                if "key" in a and key in out.column_names:
                    if mask is None:
                        out = out.select([c for c in out.column_names if c != key])
                    else:
                        cur = out.column(key).combine_chunks()
                        # null the MATCHED rows (setcol writes arr where
                        # the mask is true)
                        setcol(key, pa.nulls(n, cur.type), mask)
                if a.get("_re"):
                    hits = [c for c in out.column_names
                            if c.startswith(self.prefix) and a["_re"].search(c[len(self.prefix):])]
                    if mask is None:
                        out = out.select([c for c in out.column_names if c not in set(hits)])
                    else:
                        for c in hits:
                            cur = out.column(c).combine_chunks()
                            setcol(c, pa.nulls(n, cur.type), mask)
            elif act == "hash":
                if key in out.column_names:
                    py = out.column(key).cast(pa.string()).to_pylist()
                    hashed = pa.array(
                        [None if s is None else hashlib.sha256(s.encode()).hexdigest() for s in py],
                        type=pa.string())
                    setcol(key, hashed, mask)
            elif act == "extract":
                if key in out.column_names:
                    src = out.column(key).combine_chunks().cast(pa.string())
                    struct = pc.extract_regex(src, a["pattern"])
                    # non-matching rows keep their existing values
                    # (attraction.go:414-434 only upserts on match)
                    valid = pc.is_valid(struct)
                    m = valid if mask is None else pc.and_(mask, valid)
                    for f in struct.type:
                        setcol(self.prefix + f.name, pc.struct_field(struct, f.name), m)
            elif act == "convert":
                if key in out.column_names:
                    typ = self._TYPES[a["converted_type"]]
                    setcol(key, _coerce_cast(out.column(key).combine_chunks(), typ), mask)
            else:
                raise ValueError(f"unknown action {act}")
        return out
