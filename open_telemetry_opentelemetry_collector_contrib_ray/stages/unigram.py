"""Unigram-LM tokenizer (Kudo 2018 — the SentencePiece default model),
Ray-Data-first.

BPE (stages/bpe.py) learns merges bottom-up; the unigram model starts
from a LARGE seed vocabulary and prunes, with piece probabilities fit by
EM over the segmentation lattice.  Decomposition mirrors the BPE module
and lmscore's bounded-broadcast idioms:

- the corpus collapses ONCE to the distinct-word frequency table
  (`bpe.word_frequencies` — per-batch np.unique partials, one bucketed
  combine; ~sqrt-sized vs the corpus by Heaps' law).
- seed vocabulary: substring counts of the word table, distributed
  map_batches partials (vocab-bounded dicts) summed on the driver with
  a `seed_size` top-V cap + every single character (so every word
  always has at least the char-by-char segmentation and Z > 0).
- EM: the E-step is a map-only pass over the word-table Dataset with
  the model broadcast (forward-backward over each word's segmentation
  lattice, O(len x max_piece_len) per DISTINCT word); each batch emits
  one vocab-sized float64 partial of expected counts + its
  log-likelihood term.  The M-step normalizes the summed partials on
  the driver (vocab-sized).  Corpus log-likelihood is non-decreasing
  across EM iterations at fixed vocabulary — the EM guarantee, and the
  driver-visible invariant (`unigram_lm_check`).
- pruning: drop the lowest-probability multi-character pieces by a
  fixed fraction per round (single characters are never dropped),
  re-running EM after each round.  (SentencePiece ranks by exact
  LL-loss-if-removed; the lowest-prob proxy keeps the module small and
  is stated here honestly.)
- encoding: Viterbi best segmentation, map-only with the final model
  broadcast; pieces concatenate back to the word exactly (lossless by
  construction — the lattice only contains exact covers).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_UNSEEDED = -1


def _substring_counts(word_ds, max_piece_len: int, seed_size: int,
                      min_count: int = 1) -> dict:
    """Distributed substring frequency: per-batch bounded dict partials
    (each batch's dict holds only ITS substrings), driver sum + top-V
    cap.  Single characters are exempt from both cap and min_count."""

    def partial(t: pa.Table) -> pa.Table:
        import pickle

        counts: dict = {}
        for word, n in zip(t.column("word").to_pylist(),
                           t.column("n").to_pylist()):
            L = len(word)
            for i in range(L):
                top = min(L, i + max_piece_len)
                for j in range(i + 1, top + 1):
                    s = word[i:j]
                    counts[s] = counts.get(s, 0) + n
        return pa.table({"p": pa.array([pickle.dumps(counts)], pa.binary())})

    import pickle

    total: dict = {}
    for row in word_ds.map_batches(partial,
                                   batch_format="pyarrow").take_all():
        for s, c in pickle.loads(row["p"]).items():
            total[s] = total.get(s, 0) + c
    chars = {s: c for s, c in total.items() if len(s) == 1}
    multi = sorted(((s, c) for s, c in total.items()
                    if len(s) > 1 and c >= min_count),
                   key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    return {**chars, **dict(multi)}


def _forward_backward(word: str, n: int, logp: dict, max_len: int,
                      expected: dict):
    """Accumulate freq-weighted expected piece counts for one word;
    returns freq * log Z (the word's log-likelihood contribution).
    Plain-probability DP with per-position renormalized model is safe:
    words are \\S+ tokens, so the product of <= len(word) piece
    probabilities stays far above double underflow."""
    L = len(word)
    alpha = [0.0] * (L + 1)
    alpha[0] = 1.0
    spans = []  # (start, end, prob)
    for end in range(1, L + 1):
        a = 0.0
        for start in range(max(0, end - max_len), end):
            lp = logp.get(word[start:end])
            if lp is None or alpha[start] == 0.0:
                continue
            p = math.exp(lp)
            spans.append((start, end, p))
            a += alpha[start] * p
        alpha[end] = a
    Z = alpha[L]
    if Z <= 0.0:
        return 0.0  # unreachable when every char is in vocab
    beta = [0.0] * (L + 1)
    beta[L] = 1.0
    for start in range(L - 1, -1, -1):
        b = 0.0
        for end in range(start + 1, min(L, start + max_len) + 1):
            lp = logp.get(word[start:end])
            if lp is None:
                continue
            b += math.exp(lp) * beta[end]
        beta[start] = b
    for start, end, p in spans:
        w = alpha[start] * p * beta[end] / Z
        if w > 0.0:
            piece = word[start:end]
            expected[piece] = expected.get(piece, 0.0) + n * w
    return n * math.log(Z)


def _em_pass(word_ds, logp: dict, max_len: int):
    """One distributed E-step: per-batch (expected-count dict, ll)
    partials, driver-side sum.  Returns (expected: dict, ll: float)."""
    import pickle

    import ray

    model_ref = ray.put(logp)

    def estep(t: pa.Table) -> pa.Table:
        model = ray.get(model_ref)
        expected: dict = {}
        ll = 0.0
        for word, n in zip(t.column("word").to_pylist(),
                           t.column("n").to_pylist()):
            ll += _forward_backward(word, n, model, max_len, expected)
        return pa.table({"p": pa.array([pickle.dumps((expected, ll))],
                                       pa.binary())})

    expected: dict = {}
    ll = 0.0
    for row in word_ds.map_batches(estep, batch_format="pyarrow").take_all():
        e, part_ll = pickle.loads(row["p"])
        ll += part_ll
        for s, c in e.items():
            expected[s] = expected.get(s, 0.0) + c
    return expected, ll


def _normalize(expected: dict, vocab: set) -> dict:
    tot = sum(expected.get(s, 0.0) for s in vocab)
    floor = 1e-10  # keep unused pieces reachable (standard EM smoothing)
    denom = tot + floor * len(vocab)
    return {s: math.log((expected.get(s, 0.0) + floor) / denom)
            for s in vocab}


def unigram_train(word_table: pa.Table, vocab_size: int = 512,
                  seed_size: int = 2048, max_piece_len: int = 6,
                  em_iters: int = 2, prune_frac: float = 0.25,
                  min_count: int = 1):
    """Train a unigram-LM tokenizer from a (word, n) frequency table.

    Returns ``(logp, ll_segments)``: the piece -> log-probability model
    and, for EVERY fixed-vocabulary EM run (one per prune round plus the
    final), the list of corpus log-likelihoods per iteration — each
    segment must be non-decreasing (the EM guarantee; comparisons are
    only valid at fixed vocabulary, so segments are kept separate)."""
    import ray.data as rd

    word_ds = rd.from_arrow(word_table)
    if word_table.num_rows > 4096:
        word_ds = word_ds.repartition(32)

    counts = _substring_counts(word_ds, max_piece_len, seed_size,
                               min_count)
    vocab = set(counts)
    tot = sum(counts.values())
    logp = {s: math.log(c / tot) for s, c in counts.items()}

    ll_segments: list[list[float]] = []
    while True:
        lls: list[float] = []
        for _ in range(em_iters):
            expected, ll = _em_pass(word_ds, logp, max_piece_len)
            lls.append(ll)
            logp = _normalize(expected, vocab)
        ll_segments.append(lls)
        n_multi = sum(1 for s in vocab if len(s) > 1)
        n_chars = len(vocab) - n_multi
        if len(vocab) <= max(vocab_size, n_chars):
            break
        # prune lowest-prob multi-char pieces (chars always survive)
        keep_multi = max(vocab_size - n_chars,
                         int(n_multi * (1.0 - prune_frac)))
        if keep_multi >= n_multi:
            break
        survivors = sorted((s for s in vocab if len(s) > 1),
                           key=lambda s: (-logp[s], s))[:keep_multi]
        vocab = {s for s in vocab if len(s) == 1} | set(survivors)
        logp = _normalize({s: math.exp(logp[s]) for s in vocab}, vocab)
    return logp, ll_segments


def viterbi_encode(word: str, logp: dict, max_len: int) -> list[str]:
    """Best segmentation under the model (ties: longer last piece wins
    via >=, making the DP deterministic)."""
    L = len(word)
    best = [-math.inf] * (L + 1)
    back = [0] * (L + 1)
    best[0] = 0.0
    for end in range(1, L + 1):
        for start in range(max(0, end - max_len), end):
            lp = logp.get(word[start:end])
            if lp is None or best[start] == -math.inf:
                continue
            cand = best[start] + lp
            if cand >= best[end]:
                best[end] = cand
                back[end] = start
    if best[L] == -math.inf:
        return [word]  # unreachable when every char is in vocab
    out = []
    end = L
    while end > 0:
        start = back[end]
        out.append(word[start:end])
        end = start
    return out[::-1]


class UnigramEncoder:
    """Map-only encode stage: model broadcast once via ray.put, each
    batch dictionary-encodes to DISTINCT words (plus a cross-batch
    per-actor cache), each distinct word Viterbi-decodes once.  Emits
    per-row piece counts and a detok-lossless flag (concatenated pieces
    == the normalized word sequence)."""

    def __init__(self, model_ref, max_len: int, lowercase: bool = True):
        import ray

        self._logp = ray.get(model_ref)
        self._max_len = max_len
        self._lower = lowercase
        self._cache: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        from .bpe import _split_words

        texts = t.column("text").to_pylist()
        n_pieces = np.zeros(len(texts), dtype=np.int64)
        detok_ok = np.ones(len(texts), dtype=bool)
        for r, ws in enumerate(_split_words(texts)):
            total = 0
            for w in ws:
                if self._lower:
                    w = w.lower()
                got = self._cache.get(w)
                if got is None:
                    pieces = viterbi_encode(w, self._logp, self._max_len)
                    got = (len(pieces), "".join(pieces) == w)
                    self._cache[w] = got
                total += got[0]
                detok_ok[r] &= got[1]
            n_pieces[r] = total
        out = t.select([c for c in t.column_names if c != "text"])
        return out.append_column("n_pieces",
                                 pa.array(n_pieces, pa.int64())) \
                  .append_column("detok_ok", pa.array(detok_ok, pa.bool_()))
