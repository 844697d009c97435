"""Byte-pair-encoding tokenizer, Ray-Data-first (Sennrich et al. 2016).

A 100 TB training-data pipeline tokenizes everything; `TokenCount`
(stages/textstats.py) only ESTIMATES counts with a regex.  This module
is the real thing, decomposed the scale-safe way:

- `word_frequencies(ds)` — the corpus collapses to a distinct-word
  frequency table: per-batch split + np.unique partials (only distinct
  (word, count) pairs leave a task), ONE bucketed combine.  The word
  table is ~sqrt-sized vs the corpus (Heaps' law), so everything after
  this step is cheap.
- `bpe_train(word_table)` — classic merge learning over the word table
  (the original algorithm trains on a word-count dict, not the corpus).
  Pair counts update incrementally via a pair -> word-id index;
  deterministic tie-break (count desc, pair lexicographic asc).  Runs
  on the driver: its input is the PRUNED word table, never the corpus.
- `BpeEncoder` — map-only stage; merge ranks broadcast once via
  ray.put, each batch dictionary-encodes to DISTINCT words, each
  distinct word encodes once (plus a cross-batch per-actor cache), and
  per-row token counts come back through the inverse mapping.

End-of-word marker: '</w>' appended as its own symbol (Sennrich's
formulation), so "low lower" share the 'l o w' prefix but differ at the
boundary.
"""
from __future__ import annotations

import re
from typing import Sequence

import numpy as np
import pyarrow as pa

_EOW = "</w>"
_SPLIT_RE = re.compile(r"\S+")


def _split_words(texts) -> list[list[str]]:
    return [_SPLIT_RE.findall(t) if t else [] for t in texts]


def word_frequencies(ds, text_col: str = "text", min_count: int = 1,
                     lowercase: bool = True, n_buckets: int = 32) -> pa.Table:
    """Distributed word-frequency table -> driver pa.Table (word, n).
    Only per-batch DISTINCT (word, count) pairs shuffle."""
    from .aggregate import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        words: list[str] = []
        for ws in _split_words(texts):
            words.extend(ws)
        if lowercase:
            words = [w.lower() for w in words]
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, counts = np.unique(np.asarray(words, dtype=object),
                                 return_counts=True)
        return pa.table({"word": pa.array(uniq, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = grouped_agg(parts, ["word"], [("sum", "n", "n")],
                      combine="bucket", n_buckets=n_buckets)
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    if min_count > 1:
        import pyarrow.compute as pc

        tbl = tbl.filter(pc.greater_equal(tbl.column("n"), min_count))
    return tbl.sort_by([("word", "ascending")])


def bpe_train(word_table: pa.Table, n_merges: int,
              word_col: str = "word", count_col: str = "n"
              ) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a (word, count) table.

    Incremental pair-count maintenance: a pair -> {word_id} index means
    each merge only re-scans words that CONTAIN the merged pair.
    Deterministic: ties break on the lexicographically smallest pair."""
    words = [list(w) + [_EOW] for w in word_table.column(word_col).to_pylist()]
    counts = word_table.column(count_col).to_pylist()

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, c) in enumerate(zip(words, counts)):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[0] or (c == best[0] and p < best[1]):
                best = (c, p)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wid in list(pair_words.get(pair, ())):
            syms, c = words[wid], counts[wid]
            # remove this word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(wid)
            # apply the merge left-to-right
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == pair[0]
                        and syms[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wid] = out
            # add back the new contributions
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(wid)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]
                    ) -> list[str]:
    """Greedy lowest-rank merging (the canonical BPE apply)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        merged = pair[0] + pair[1]
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]):
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BpeEncoder:
    """map_batches stage: token counts (and optionally tokens) per row.

    Merge ranks arrive via ONE ray.put (never re-shipped per batch);
    each batch encodes only its DISTINCT words, and a per-actor cache
    carries encodings across batches (Zipf: a few thousand words cover
    most of a shard)."""

    def __init__(self, merges_ref, text_col: str = "text",
                 out_col: str = "n_bpe_tokens", lowercase: bool = True,
                 emit_tokens: bool = False, cache_size: int = 1 << 20):
        import ray

        merges = (ray.get(merges_ref)
                  if not isinstance(merges_ref, list) else merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col, self.out_col = text_col, out_col
        self.lowercase = lowercase
        self.emit_tokens = emit_tokens
        self.cache: dict[str, list[str]] = {}
        self.cache_size = cache_size

    def _encode(self, w: str) -> list[str]:
        got = self.cache.get(w)
        if got is None:
            got = bpe_encode_word(w, self.ranks)
            if len(self.cache) < self.cache_size:
                self.cache[w] = got
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        per_row = _split_words(texts)
        if self.lowercase:
            per_row = [[w.lower() for w in ws] for ws in per_row]
        flat: list[str] = [w for ws in per_row for w in ws]
        uniq = set(flat)
        enc = {w: self._encode(w) for w in uniq}
        counts = [sum(len(enc[w]) for w in ws) for ws in per_row]
        t = t.append_column(self.out_col, pa.array(counts, pa.int64()))
        if self.emit_tokens:
            toks = [[tok for w in ws for tok in enc[w]] for ws in per_row]
            t = t.append_column("bpe_tokens",
                                pa.array(toks, pa.list_(pa.string())))
        return t


def bpe_tokenize(ds_factory, n_merges: int = 256, text_col: str = "text",
                 min_count: int = 2, emit_tokens: bool = False,
                 concurrency=(1, 8)):
    """Train-then-encode composition: pass 1 reduces the corpus to the
    word table and learns merges; pass 2 is a map-only actor-pool encode
    over a fresh plan from `ds_factory`."""
    import ray

    wt = word_frequencies(ds_factory(), text_col=text_col,
                          min_count=min_count)
    merges = bpe_train(wt, n_merges)
    mref = ray.put(merges)
    return ds_factory().map_batches(
        BpeEncoder, fn_constructor_kwargs=dict(
            merges_ref=mref, text_col=text_col, emit_tokens=emit_tokens),
        batch_format="pyarrow", concurrency=concurrency), merges
