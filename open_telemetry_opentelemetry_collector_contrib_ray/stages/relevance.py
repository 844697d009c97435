"""Relevance / IR scoring stages for training-data curation: document
frequency (inverted-index building block) and BM25 query scoring.

Both are classic two-pass broadcast patterns:

* ``token_df`` — per-batch distinct-(doc, token) explode -> per-batch
  partial counts -> one small groupby over (token, partial) rows.  The
  shuffle moves at most |vocab| rows per input batch, never documents.
* ``corpus_stats`` + ``BM25Scorer`` — pass 1 reduces the corpus to a
  handful of exact integers (N, sum of doc lengths, per-term document
  frequencies); pass 2 broadcasts those constants into a stateless
  vectorized ``map_batches`` scorer.  Nothing shuffles at all.

Scoring formula is the Lucene/Robertson BM25 variant:

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

All floats derive from exact int64 counts through a fixed operation
order, so a SQL oracle replaying the same formula matches bitwise.

Reference analog: the OTTL/stanza surface has no IR scoring; this is
part of the beyond-reference training-data toolkit (like
stages/textstats.py).  Tokenization matches textstats (lowercase \\w+).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _distinct_doc_token_counts(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial DF: one row per (token) with the number of
    batch documents containing it.  Pure Arrow+numpy (dictionary-encode
    the flat token stream, count unique (row, code) pairs per code)."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "df_partial": pa.array([], pa.int64())})
    lower = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
    parts = pc.split_pattern_regex(lower, r"\W+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts).dictionary_encode()
    lengths = pc.list_value_length(parts).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
    codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # which dictionary entries are non-empty ("" is a \W+ split artifact)
    keep = pc.utf8_length(flat.dictionary).to_numpy(zero_copy_only=False) > 0
    uniq = np.unique((rows << 32) | codes)         # distinct (doc, token)
    ucodes = uniq & 0xFFFFFFFF
    code_ids, counts = np.unique(ucodes, return_counts=True)
    mask = keep[code_ids]                          # drop the "" split artifact
    code_ids, counts = code_ids[mask], counts[mask]
    tokens = pc.take(flat.dictionary, pa.array(code_ids, pa.int64()))
    return pa.table({"token": tokens.cast(pa.string()),
                     "df_partial": pa.array(counts.astype(np.int64))})


def token_df(ds, text_col: str = "text", min_df: int = 1):
    """Corpus-wide document frequency per token (the DF half of an
    inverted index).  Shuffle volume is bounded by vocab-per-batch, not
    corpus size: partial counts combine per batch BEFORE the groupby."""
    from .aggregate import grouped_sum

    partials = ds.map_batches(
        lambda t: _distinct_doc_token_counts(t, text_col),
        batch_format="pyarrow")
    out = grouped_sum(partials, ["token"], "df_partial", alias="df",
                      combine="driver")
    if min_df > 1:
        out = out.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("df"), min_df)),
            batch_format="pyarrow")
    return out


def _term_pattern(term: str) -> str:
    """Escaped whole-word pattern.  \\b only guards edges that ARE word
    characters — RE2 has no lookaround, and \\b next to a non-word edge
    (e.g. 'c++') can never match."""
    import re

    pat = re.escape(term)
    if term and (term[0].isalnum() or term[0] == "_"):
        pat = r"\b" + pat
    if term and (term[-1].isalnum() or term[-1] == "_"):
        pat = pat + r"\b"
    return pat


def corpus_stats(ds, terms: Sequence[str], text_col: str = "text") -> dict:
    """ONE streaming pass reducing the corpus to exact integers:
    N (docs), sum_dl (total \\w+ tokens), df[term] for each query term.
    Partials are a single row per batch; the driver adds int64s."""
    terms = list(terms)

    def partial(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(pc.fill_null(t.column(text_col), ""))
        dl = pc.count_substring_regex(lower, r"\w+").cast(pa.int64())
        row = {"n_docs": [t.num_rows],
               "sum_dl": [pc.sum(dl).as_py() or 0]}
        for i, term in enumerate(terms):
            tf = pc.count_substring_regex(lower, _term_pattern(term))
            row[f"df_{i}"] = [pc.sum(pc.cast(pc.greater(tf, 0), pa.int64())).as_py() or 0]
        return pa.table(row)

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = {"n_docs": sum(r["n_docs"] for r in rows),
           "sum_dl": sum(r["sum_dl"] for r in rows),
           "df": {term: sum(r[f"df_{i}"] for r in rows)
                  for i, term in enumerate(terms)}}
    return out


class BM25Scorer:
    """Stateless vectorized BM25 scorer: broadcast corpus constants in,
    one float64 score column out.  Term contributions accumulate in
    list order (left-to-right), matching a SQL ``e0 + e1 + ...`` chain
    bitwise.  idf uses math.log (libm), the same ln as DuckDB."""

    def __init__(self, terms: Sequence[str], stats: dict,
                 text_col: str = "text", out_col: str = "score",
                 k1: float = 1.2, b: float = 0.75):
        self.terms = list(terms)
        self.text_col, self.out_col = text_col, out_col
        self.k1, self.b = float(k1), float(b)
        n = stats["n_docs"]
        # empty corpus: the scorer never sees a non-empty batch, so the
        # constants are arbitrary — just avoid the 0-division
        self.avgdl = stats["sum_dl"] / n if n else 1.0
        self.idf = [math.log(1.0 + (n - stats["df"][t] + 0.5)
                             / (stats["df"][t] + 0.5)) for t in self.terms]

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(pc.fill_null(batch.column(self.text_col), ""))
        dl = pc.count_substring_regex(lower, r"\w+").cast(pa.float64()) \
               .to_numpy(zero_copy_only=False)
        k1, b = self.k1, self.b
        norm = k1 * (1.0 - b + b * (dl / self.avgdl))
        score = np.zeros(batch.num_rows, dtype=np.float64)
        for term, idf in zip(self.terms, self.idf):
            tf = pc.count_substring_regex(lower, _term_pattern(term)) \
                   .cast(pa.float64()).to_numpy(zero_copy_only=False)
            score = score + idf * (tf * (k1 + 1.0)) / (tf + norm)
        return batch.append_column(self.out_col, pa.array(score))


def bm25(ds, terms: Sequence[str], text_col: str = "text",
         out_col: str = "score", k1: float = 1.2, b: float = 0.75):
    """Two-pass BM25: corpus_stats reduce, then a broadcast scorer map.
    Returns the input dataset with ``out_col`` appended."""
    stats = corpus_stats(ds, terms, text_col=text_col)
    return ds.map_batches(
        BM25Scorer(terms, stats, text_col=text_col, out_col=out_col,
                   k1=k1, b=b),
        batch_format="pyarrow")


def tfidf_keywords(ds_factory, k: int = 3, text_col: str = "text",
                   id_col: str = "doc_id", n_docs: int | None = None,
                   min_df: int = 1, top_v: int | None = 5_000_000):
    """Top-k TF-IDF keywords per document (the classic keyword /
    labeling pass): score = tf * ln(N / df), ranked (score desc, token
    asc) within each doc.

    Two passes, ZERO row shuffles: pass 1 is the vocab-bounded
    `token_df` combine broadcast back as a token->df dict; pass 2 is
    map-only — per batch the token stream dictionary-encodes, df looks
    up once per DISTINCT batch token, per-(row, token) counts come from
    one np.unique, and the top-k per row falls out of a single lexsort.
    Floats derive from exact int64 (tf, df, N) through one fixed op
    order, so a SQL oracle matches bitwise (the BM25 precedent).

    The broadcast is bounded: ``min_df`` prunes sub-threshold tokens
    inside the df combine and ``top_v`` keeps only the highest-df V
    tokens (the `build_ngram_model` cap idiom) — at web-corpus vocab
    the dict stays worker-heap-sized instead of growing with distinct
    tokens.  Pruned tokens simply never rank as keywords."""
    import ray

    if n_docs is None:
        # callers who can count from parquet METADATA (a bare
        # read_parquet .count() is scan-free) should pass n_docs; this
        # fallback is a full extra pass over a mapped plan
        n_docs = ds_factory().count()
    df_ds = token_df(ds_factory(), text_col=text_col,
                     min_df=min_df).materialize()
    if top_v is not None and df_ds.count() > top_v:
        # only pay the sort shuffle when the cap actually binds;
        # ties at the df boundary break deterministically by token
        df_ds = df_ds.sort(["df", "token"], descending=[True, False]) \
                     .limit(top_v)
    df_tbl = df_ds.to_pandas()
    df_ref = ray.put(dict(zip(df_tbl["token"], df_tbl["df"].astype(int))))

    class Score:
        def __init__(self):
            self.df = ray.get(df_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            empty = pa.table({id_col: batch.column(id_col).slice(0, 0),
                              "token": pa.array([], pa.string()),
                              "tf": pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64()),
                              "rank": pa.array([], pa.int64())})
            if n == 0:
                return empty
            lower = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
            parts = pc.split_pattern_regex(lower, r"\W+")
            if isinstance(parts, pa.ChunkedArray):
                parts = parts.combine_chunks()
            flat = pc.list_flatten(parts).dictionary_encode()
            if len(flat) == 0:
                return empty
            lengths = pc.list_value_length(parts).to_numpy(
                zero_copy_only=False).astype(np.int64)
            rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
            codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = flat.dictionary.to_pylist()
            # idf per distinct batch token; "" artifacts and tokens
            # absent from the (min_df-pruned) df table drop out
            idf = np.full(len(vocab), np.nan)
            for c, tok in enumerate(vocab):
                d = self.df.get(tok) if tok else None
                if d:
                    # math.log = libm, bitwise-equal to DuckDB ln
                    # (np.log's SIMD path drifts in the last ulp)
                    idf[c] = math.log(n_docs / float(d))
            pair, tf = np.unique((rows << 32) | codes, return_counts=True)
            prow, pcode = pair >> 32, pair & 0xFFFFFFFF
            keepm = ~np.isnan(idf[pcode])
            prow, pcode, tf = prow[keepm], pcode[keepm], tf[keepm]
            score = tf.astype(np.float64) * idf[pcode]
            # token rank in sorted vocab = the asc tie-break
            vorder = np.empty(len(vocab), dtype=np.int64)
            vorder[np.argsort(np.asarray(vocab, dtype=object))] = \
                np.arange(len(vocab))
            order = np.lexsort((vorder[pcode], -score, prow))
            prow, pcode, tf, score = (prow[order], pcode[order],
                                      tf[order], score[order])
            starts = np.concatenate([[0], np.flatnonzero(
                prow[1:] != prow[:-1]) + 1])
            rank = np.arange(len(prow)) - np.repeat(
                starts, np.diff(np.concatenate([starts, [len(prow)]]))) + 1
            keep = rank <= k
            toks = pc.take(flat.dictionary,
                           pa.array(pcode[keep], pa.int64()))
            return pa.table({
                id_col: batch.column(id_col).take(pa.array(prow[keep])),
                "token": toks.cast(pa.string()),
                "tf": pa.array(tf[keep].astype(np.int64)),
                "score": pa.array(score[keep]),
                "rank": pa.array(rank[keep].astype(np.int64))})

    return ds_factory().map_batches(Score, batch_format="pyarrow",
                                    concurrency=(1, 24))


def _ngram_counts_partial(batch: pa.Table, text_col: str,
                          n: int) -> pa.Table:
    """Per-batch word n-gram counts: flatten the lowercased token
    stream once, build gram strings from n zero-copy Arrow slices
    joined element-wise, mask grams that straddle a document boundary,
    then one dictionary-encode + bincount.  No Python loop over rows
    or grams."""
    nrows = batch.num_rows
    empty = pa.table({"gram": pa.array([], pa.string()),
                      "c": pa.array([], pa.int64())})
    if nrows == 0:
        return empty
    lower = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
    parts = pc.split_pattern_regex(lower, r"\W+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    lengths = pc.list_value_length(parts).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(nrows, dtype=np.int64), lengths)
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    flat = flat.filter(pa.array(keep))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    rows = rows[keep]
    total = len(rows)
    if total < n:
        return empty
    m = total - n + 1
    grams = pc.binary_join_element_wise(
        *[flat.slice(i, m) for i in range(n)], pa.scalar(" "))
    valid = rows[:m] == rows[n - 1:]
    grams = grams.filter(pa.array(valid))
    if len(grams) == 0:
        return empty
    enc = grams.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    counts = np.bincount(codes, minlength=len(enc.dictionary))
    return pa.table({"gram": enc.dictionary.cast(pa.string()),
                     "c": pa.array(counts.astype(np.int64))})


def top_ngrams(ds, n: int = 3, k: int = 20, text_col: str = "text",
               min_count: int = 2, n_buckets: int = 16):
    """Corpus-wide most-frequent word n-grams (boilerplate / template
    mining, the RefinedWeb-style diagnostic before writing line or
    substring dedup rules).

    Shape: per-batch gram counts collapse the text to a (gram, count)
    table BEFORE any exchange, so shuffle volume is the batch-distinct
    gram vocabulary, never the corpus; the combine is one bucketed
    groupby; each bucket pre-prunes to its local top-k so the final
    global sort+limit sees at most n_buckets*k rows.  ``min_count``
    bounds the combined table on web-scale corpora (singleton grams
    dominate the long tail); for 100-TB heavy-hitters-only use, feed
    the exploded grams to stages/sketch.py ``approx_top_k``
    (SpaceSaving) instead — this function is the exact path.

    Deterministic total order: count desc, gram asc."""
    from .aggregate import grouped_agg

    partials = ds.map_batches(
        lambda t: _ngram_counts_partial(t, text_col, n),
        batch_format="pyarrow")
    totals = grouped_agg(partials, ["gram"], [("sum", "c", "n_occurrences")],
                         combine="bucket", n_buckets=n_buckets)
    if min_count > 1:
        totals = totals.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("n_occurrences"), min_count)),
            batch_format="pyarrow")

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("n_occurrences", "descending"),
                          ("gram", "ascending")])
        return t.take(idx[:k])

    return totals.map_batches(local_topk, batch_format="pyarrow") \
        .sort(["n_occurrences", "gram"], descending=[True, False]).limit(k)
