"""Inverted positional index over a text corpus + index-backed search.

The classic large-corpus retrieval structure (token -> posting list of
(doc, positions)), expressed Ray-Data-first:

- tokenization is a zero-copy Arrow kernel (``utf8_lower`` +
  ``split_pattern_regex`` + numpy offset arithmetic) — one flat
  (token, doc, pos) explosion per batch, no Python row loop;
- ``token_stats`` (the dictionary / lexicon build) pre-aggregates
  per (token, doc) INSIDE each batch with a pyarrow ``group_by`` and
  combines with one bucketed hash aggregate — the corpus text itself
  never shuffles, only (token, doc, n_pos) partial rows do;
- ``posting_rows`` pushes the query's term selection to the MAP side
  (an index probe is a filter, not a build): only postings of the
  searched tokens leave the scan;
- ``phrase_search`` / ``boolean_search`` close the probe with ONE
  co-partitioned shuffle by doc and a fully vectorized per-bucket
  key-intersection (positions rank-encoded as ``doc << 21 | pos``
  int64 keys, adjacency = membership of ``key + 1``), so a hub term's
  postings spread across buckets instead of landing on one worker.

Tokenization contract (shared with the DuckDB oracle twins): tokens
are maximal runs of ``[a-z0-9_]`` in the lowercased text — exactly
``regexp_extract_all(lower(text), '[a-z0-9_]+')`` in SQL.

Reference parity: the reference repo has no retrieval index (it is a
telemetry collector); this module is part of the LLM-training-data
operator family the brief adds on top (corpus search / filtering by
phrase and boolean predicates, as used for targeted decontamination
and corpus QA).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# positions are packed into the low bits of a (doc, pos) int64 rank key;
# 21 bits = docs up to 2M tokens each (longer docs should be chunked
# upstream — doc_chunks — long before an index probe sees them)
_POS_BITS = 21
_POS_MASK = (1 << _POS_BITS) - 1


def _explode_tokens(t: pa.Table, text_col: str, id_col: str):
    """Flatten one batch to (doc int64, pos int64, token StringArray).

    Positions are 0-based indices among the KEPT tokens of each doc
    (empty fragments from the split are dropped before numbering).
    """
    txt = t.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(pc.cast(txt, pa.string()), "")
    la = pc.split_pattern_regex(pc.utf8_lower(txt), r"[^a-z0-9_]+")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.flatten()
    offs = np.asarray(la.offsets)
    npr = np.diff(offs).astype(np.int64)
    docs = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_rep = np.repeat(docs, npr)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(keep)
    flat = flat.take(pa.array(idx, pa.int64()))
    doc_rep = doc_rep[idx]
    if len(doc_rep):
        change = np.r_[True, doc_rep[1:] != doc_rep[:-1]]
        starts = np.flatnonzero(change)
        runlen = np.diff(np.r_[starts, len(doc_rep)])
        pos = np.arange(len(doc_rep), dtype=np.int64) \
            - np.repeat(starts, runlen)
    else:
        pos = np.zeros(0, dtype=np.int64)
    return doc_rep, pos, flat


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                min_df: int = 1, n_buckets: int = 64):
    """Lexicon build: Dataset of (token, df, tf, min_doc, max_doc).

    Per-batch partial = one pyarrow ``group_by`` over the exploded
    (token, doc) pairs (docs never span batches, so the per-batch
    distinct-doc count IS a correct df partial); combine = one bucketed
    hash aggregate over partial rows.  At 100 TB the shuffle moves one
    row per (token, batch) — vocabulary-bounded, not corpus-bounded.
    """
    from .aggregate import grouped_agg

    def part(t: pa.Table) -> pa.Table:
        doc, _pos, tok = _explode_tokens(t, text_col, id_col)
        if not len(doc):
            return pa.table({"token": pa.array([], pa.string()),
                             "doc": pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64())})
        g = pa.table({"token": tok, "doc": pa.array(doc, pa.int64())}) \
            .group_by(["token", "doc"]).aggregate([([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "doc": g.column("doc"),
                         "n_pos": g.column("count_all").cast(pa.int64())})

    pairs = ds.map_batches(part, batch_format="pyarrow")
    stats = grouped_agg(pairs, ["token"],
                        [("count", None, "df"), ("sum", "n_pos", "tf"),
                         ("min", "doc", "min_doc"), ("max", "doc", "max_doc")],
                        combine="bucket", n_buckets=n_buckets)
    if min_df > 1:
        stats = stats.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("df"), min_df)),
            batch_format="pyarrow")
    return stats


def posting_rows(ds, tokens: Sequence[str], text_col: str = "text",
                 id_col: str = "doc_id"):
    """Index probe, map side: (token, doc, pos) rows restricted to the
    query's terms.  Selection happens inside the scan task — only the
    searched tokens' postings ever enter the plan."""
    want = pa.array(sorted(set(tokens)), pa.string())

    def probe(t: pa.Table) -> pa.Table:
        doc, pos, tok = _explode_tokens(t, text_col, id_col)
        m = pc.is_in(tok, value_set=want).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(m)
        return pa.table({"token": tok.take(pa.array(idx, pa.int64())),
                         "doc": pa.array(doc[idx], pa.int64()),
                         "pos": pa.array(pos[idx], pa.int64())})

    return ds.map_batches(probe, batch_format="pyarrow")


def phrase_search(ds, phrase: Sequence[str], text_col: str = "text",
                  id_col: str = "doc_id", n_buckets: int = 32) -> pa.Table:
    """Exact positional phrase search: docs whose token sequence
    contains ``phrase`` as ADJACENT tokens.  Returns a one-row table
    (n_docs, n_occurrences).

    Postings of the phrase's terms co-partition by doc once; inside
    each bucket the adjacency chain is pure sorted-array membership
    over rank-encoded (doc << 21 | pos) keys — start keys of token 0,
    then for each next term keep the survivors whose ``key + i`` is a
    posting of term i.  No per-doc Python loop; a doc never spans
    buckets so per-bucket counts sum exactly.
    """
    import pandas as pd

    from .aggregate import bucketed_group_transform

    phrase = [str(w).lower() for w in phrase]
    if not phrase:
        raise ValueError("phrase_search needs at least one token")
    rows = posting_rows(ds, phrase, text_col, id_col)

    def close(df: "pd.DataFrame") -> "pd.DataFrame":
        key = (df["doc"].to_numpy(np.int64) << _POS_BITS) \
            | df["pos"].to_numpy(np.int64)
        tok = df["token"].to_numpy()
        per = [np.sort(key[tok == w]) for w in set(phrase)]
        sets = dict(zip(set(phrase), per))
        cur = sets[phrase[0]]
        for i, w in enumerate(phrase[1:], start=1):
            nxt = sets[w]
            q = cur + i
            j = np.searchsorted(nxt, q)
            j[j == len(nxt)] = 0
            cur = cur[(nxt[j] == q)] if len(nxt) else cur[:0]
            if not len(cur):
                break
        n_occ = int(len(cur))
        n_docs = int(len(np.unique(cur >> _POS_BITS)))
        return pd.DataFrame({"n_docs": [n_docs], "n_occurrences": [n_occ]})

    per_bucket = bucketed_group_transform(rows, ["doc"], close,
                                          n_buckets=n_buckets)
    agg = per_bucket.sum(["n_docs", "n_occurrences"]) or {}
    return pa.table({
        "n_docs": pa.array([int(agg.get("sum(n_docs)", 0) or 0)], pa.int64()),
        "n_occurrences": pa.array([int(agg.get("sum(n_occurrences)", 0) or 0)],
                                  pa.int64())})


def boolean_search(ds, must: Sequence[str],
                   must_not: Sequence[str] = (), text_col: str = "text",
                   id_col: str = "doc_id", n_buckets: int = 32) -> int:
    """Count docs containing EVERY ``must`` token and NONE of
    ``must_not`` — the index-backed AND/AND-NOT probe.  Same probe +
    one co-partitioned bucket pass as phrase_search; inside a bucket
    the doc sets intersect/differ as sorted unique numpy arrays."""
    import pandas as pd

    from .aggregate import bucketed_group_transform

    must = [str(w).lower() for w in must]
    must_not = [str(w).lower() for w in must_not]
    if not must:
        raise ValueError("boolean_search needs at least one must token")
    rows = posting_rows(ds, list(must) + list(must_not), text_col, id_col)

    def close(df: "pd.DataFrame") -> "pd.DataFrame":
        doc = df["doc"].to_numpy(np.int64)
        tok = df["token"].to_numpy()
        cur = None
        for w in must:
            d = np.unique(doc[tok == w])
            cur = d if cur is None else np.intersect1d(
                cur, d, assume_unique=True)
            if not len(cur):
                break
        if cur is None:
            cur = np.zeros(0, np.int64)
        for w in must_not:
            if not len(cur):
                break
            cur = np.setdiff1d(cur, np.unique(doc[tok == w]),
                               assume_unique=True)
        return pd.DataFrame({"n_docs": [int(len(cur))]})

    per_bucket = bucketed_group_transform(rows, ["doc"], close,
                                          n_buckets=n_buckets)
    return int(per_bucket.sum("n_docs") or 0)
