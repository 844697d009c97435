"""Hashed linear text classifier scoring (fastText-style bag-of-words).

The standard LLM-corpus quality filter (CCNet, GPT-3 appendix A, LLaMA)
scores documents with a linear classifier over hashed bag-of-words
features and keeps/weights by the score.  Training such a model is not
the engine's job; this stage provides the SCORING pipeline shape:

    token -> bucket = md5_lower64(token) % B -> score = sum weights[bucket]

Ray-Data-first: map-only (zero shuffle).  Per batch the token stream is
dictionary-encoded, the md5 runs once per DISTINCT token in the batch
(the per-row Python md5 cost collapses to vocab size), the weight
lookup scatters through the codes, and one bincount reduces to per-doc
scores.  The weight vector broadcasts once via ray.put.

Weights are int64 so scores are integer-exact; `deterministic_weights`
derives a fixed pseudo-random table that a SQL oracle replays verbatim
(`(md5_number_lower(w) % B * 2654435761) % (2*scale+1) - scale`).
Real users pass their trained (quantized) weight vector instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sample import _md5_lower64

__all__ = ["HashedLinearScorer", "deterministic_weights", "classify_docs"]


def deterministic_weights(n_buckets: int, scale: int = 1000) -> np.ndarray:
    """Fixed pseudo-random int64 weights in [-scale, scale]:
    w[b] = (b * 2654435761) % (2*scale + 1) - scale  (Knuth's
    multiplicative constant; exact in uint64 for any b < 2^32)."""
    b = np.arange(n_buckets, dtype=np.uint64)
    m = np.uint64(2 * scale + 1)
    return (b * np.uint64(2654435761) % m).astype(np.int64) - scale


class HashedLinearScorer:
    """map_batches stage: append int64 `clf_score` (and bool `keep` when
    a threshold is set) from hashed bag-of-words token weights."""

    def __init__(self, weights, bias: int = 0, threshold: int | None = 0,
                 text_col: str = "text", out_col: str = "clf_score",
                 keep_col: str = "keep"):
        import ray

        w = ray.get(weights) if not isinstance(
            weights, (np.ndarray, list)) else weights
        self.w = np.asarray(w, dtype=np.int64)
        self.n_buckets = len(self.w)
        self.bias = int(bias)
        self.threshold = threshold
        self.text_col = text_col
        self.out_col = out_col
        self.keep_col = keep_col
        # per-actor token -> bucket cache: a worker's batches share most
        # of their vocabulary, so md5 runs once per token per WORKER.
        # Bounded: past the cap (Heaps'-law vocab growth on web text)
        # new tokens hash without being stored, so memory stays flat
        self._bucket_cache: dict = {"": -1}
        self._cache_cap = 500_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            score = np.zeros(0, dtype=np.int64)
        else:
            lower = pc.utf8_lower(pc.fill_null(batch.column(self.text_col), ""))
            parts = pc.split_pattern_regex(lower, r"\W+")
            if isinstance(parts, pa.ChunkedArray):
                parts = parts.combine_chunks()
            flat = pc.list_flatten(parts).dictionary_encode()
            lengths = pc.list_value_length(parts).to_numpy(
                zero_copy_only=False).astype(np.int64)
            rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
            codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = flat.dictionary.to_pylist()
            cache = self._bucket_cache
            new = [t for t in vocab if t not in cache]
            fresh: dict = {}
            if new:
                nb = _md5_lower64(new) % np.uint64(self.n_buckets)
                fresh = dict(zip(new, nb.astype(np.int64)))
                room = self._cache_cap - len(cache)
                if room > 0:
                    cache.update(dict(list(fresh.items())[:room]))
            buckets = np.fromiter(
                (cache.get(t, fresh.get(t, -1)) for t in vocab),
                dtype=np.int64, count=len(vocab))
            # "" split artifacts (bucket -1) contribute nothing
            w_code = np.where(buckets >= 0, self.w[buckets], 0)
            score = np.bincount(rows, weights=w_code[codes],
                                minlength=n).astype(np.int64)
        score += self.bias
        out = batch.append_column(self.out_col, pa.array(score, pa.int64()))
        if self.threshold is not None:
            out = out.append_column(
                self.keep_col, pa.array(score > self.threshold, pa.bool_()))
        return out


def classify_docs(ds, weights=None, n_buckets: int = 1024, **kw):
    """Score every document with a hashed linear classifier.  `weights`
    defaults to `deterministic_weights(n_buckets)`; pass a ray.put ref
    (or array) of a real model's quantized weights in production."""
    import ray

    if weights is None:
        weights = deterministic_weights(n_buckets)
    ref = weights if not isinstance(weights, np.ndarray) else ray.put(weights)
    return ds.map_batches(
        HashedLinearScorer, fn_constructor_kwargs=dict(weights=ref, **kw),
        batch_format="pyarrow", concurrency=(1, 24))
