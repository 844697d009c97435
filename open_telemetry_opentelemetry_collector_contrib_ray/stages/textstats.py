"""Text-analysis stages for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are per-batch map stages; the heavier ones are callable classes so
tables (stopword sets, n-gram profiles, compiled regexes) build once
per worker/actor.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# tiny public-knowledge character/stopword profiles per language
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "for", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "ser", "se", "no", "por", "con"},
    "fr": {"le", "la", "de", "et", "les", "des", "est", "un", "une", "du", "que", "pour"},
    "de": {"der", "die", "und", "das", "ist", "ein", "zu", "den", "von", "mit", "nicht"},
}
_CJK = re.compile(r"[一-鿿぀-ヿ가-힯]")
_CYRILLIC = re.compile(r"[Ѐ-ӿ]")


class LanguageId:
    """Heuristic n-gram/stopword language guesser (fasttext-style signal,
    no model dependency).  Scripts first (CJK/Cyrillic), then stopword
    overlap votes."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_guess"):
        self.text_col = text_col
        self.out_col = out_col

    def guess(self, text: str) -> str:
        """Row reference implementation (same semantics as the vectorized
        batch path: distinct-stopword overlap, first language wins ties)."""
        if not text:
            return "unknown"
        if _CJK.search(text):
            return "zh"
        if _CYRILLIC.search(text):
            return "ru"
        toks = set(_WORD_RE.findall(text.lower()))
        best, best_n = "unknown", 0
        for lang, stops in _LANG_PROFILES.items():
            n = len(toks & stops)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        n = batch.num_rows
        lower = pc.utf8_lower(pc.fill_null(col, ""))
        # distinct-stopword votes via ONE tokenize pass + dictionary
        # membership (was 48 RE2 scans — one per stopword per language):
        # split once, dictionary-encode the flat tokens, mark which
        # dictionary entries are stopwords of each language, and count
        # DISTINCT (row, stopword) pairs — identical set-overlap
        # semantics to the row reference impl, ~2x faster per batch
        # (0.19s -> 0.09s / 5k docs)
        votes = np.zeros((n, len(_LANG_PROFILES)), dtype=np.int32)
        if n:
            parts = pc.split_pattern_regex(lower, r"\W+")
            if isinstance(parts, pa.ChunkedArray):
                parts = parts.combine_chunks()
            flat = pc.list_flatten(parts).dictionary_encode()
            lengths = pc.list_value_length(parts).to_numpy(
                zero_copy_only=False).astype(np.int64)
            rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
            codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = np.unique((rows << 32) | codes)  # distinct (row, token)
            urows, ucodes = uniq >> 32, uniq & 0xFFFFFFFF
            dict_tokens = flat.dictionary.to_pylist()  # small: unique tokens
            for j, (lang, stops) in enumerate(_LANG_PROFILES.items()):
                stop_codes = np.fromiter(
                    (i for i, tok in enumerate(dict_tokens) if tok in stops),
                    dtype=np.int64)
                if len(stop_codes):
                    hit = np.isin(ucodes, stop_codes)
                    np.add.at(votes[:, j], urows[hit], 1)
        langs = np.array(list(_LANG_PROFILES), dtype=object)
        best = langs[np.argmax(votes, axis=1)]  # argmax = first max = tie rule
        best = np.where(votes.max(axis=1) > 0, best, "unknown")
        is_cjk = pc.fill_null(pc.match_substring_regex(col, _CJK.pattern),
                              False).to_numpy(zero_copy_only=False)
        is_cyr = pc.fill_null(pc.match_substring_regex(col, _CYRILLIC.pattern),
                              False).to_numpy(zero_copy_only=False)
        best = np.where(is_cjk, "zh", np.where(is_cyr, "ru", best))
        empty = pc.fill_null(pc.equal(col, ""), True).to_numpy(
            zero_copy_only=False)
        best = np.where(empty, "unknown", best)
        return batch.append_column(self.out_col, pa.array(best, pa.string()))


class QualityScore:
    """Document quality heuristics: length, mean word length, punctuation
    ratio, stopword ratio, digit ratio, repetition (distinct-token ratio).
    Columns are emitted individually so downstream filters stay columnar."""

    def __init__(self, text_col: str = "text", prefix: str = "q_"):
        self.text_col = text_col
        self.prefix = prefix
        self.stop = _LANG_PROFILES["en"]

    @staticmethod
    def _distinct_tokens(lower, n: int) -> np.ndarray:
        """Per-row distinct \\w+ token counts, pure Arrow + numpy (no
        Python loop, no polars): split to a list array, dictionary-encode
        the flat tokens, then count unique (row, token-code) pairs with
        one numpy sort.  Matches the polars extract_all/n_unique result
        bit-for-bit and benches slightly faster (0.08s vs 0.11s / 5k
        docs)."""
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        parts = pc.split_pattern_regex(lower, r"\W+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        lengths = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
        codes = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        rows, codes = rows[keep], codes[keep]
        uniq = np.unique((rows << 32) | codes)
        out = np.zeros(n, dtype=np.int64)
        ur, cnt = np.unique(uniq >> 32, return_counts=True)
        out[ur] = cnt
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        n = batch.num_rows
        n_chars = pc.utf8_length(pc.fill_null(col, "")).cast(pa.int64())
        lower = pc.utf8_lower(pc.fill_null(col, ""))
        # fully vectorized: RE2 match counts for token/word-char/digit
        # metrics, polars extract_all for the distinct-token ratio (the
        # one metric that needs per-row token multisets)
        n_tokens = pc.count_substring_regex(lower, r"\w+") \
                     .cast(pa.int64()).to_numpy(zero_copy_only=False)
        # word chars = total chars minus chars left after deleting \w+ runs
        # (one run-wise regex pass; counting single-char \w matches is 3x
        # slower because every character is a match)
        stripped = pc.replace_substring_regex(lower, r"\w+", "")
        word_chars = pc.subtract(
            pc.utf8_length(lower), pc.utf8_length(stripped)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        stop_alt = r"\b(" + "|".join(sorted(self.stop)) + r")\b"
        stop_hits = pc.count_substring_regex(lower, stop_alt) \
                      .cast(pa.int64()).to_numpy(zero_copy_only=False)
        digits = pc.count_substring_regex(lower, r"\d") \
                   .cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_distinct = self._distinct_tokens(lower, n)
        nt = np.maximum(n_tokens, 1).astype(np.float64)
        has = n_tokens > 0
        chars = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1) \
                  .astype(np.float64)
        out = batch
        p = self.prefix
        for name, arr in [
            ("n_chars", n_chars),
            ("n_tokens", pa.array(n_tokens)),
            ("mean_word_len", pa.array(np.where(has, word_chars / nt, 0.0))),
            ("stop_ratio", pa.array(np.where(has, stop_hits / nt, 0.0))),
            ("distinct_ratio", pa.array(np.where(has, n_distinct / nt, 0.0))),
            ("digit_ratio", pa.array(digits / chars)),
        ]:
            out = out.append_column(p + name, arr)
        return out


class TokenCount:
    """Whitespace + BPE-ish token estimate, fully vectorized:
    whitespace tokens plus an adjustment for long words (a word of
    length L costs ~ceil(L/4) subword tokens)."""

    def __init__(self, text_col: str = "text", out_col: str = "n_tokens_est"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        trimmed = pc.utf8_trim_whitespace(col)
        parts = pc.split_pattern_regex(trimmed, r"\s+")
        n_ws = pc.list_value_length(parts).cast(pa.float64())
        n_chars = pc.utf8_length(col).cast(pa.float64())
        # blend: max(whitespace tokens, chars/4) approximates BPE counts
        est = pc.max_element_wise(n_ws, pc.divide(n_chars, 4.0))
        empty = pc.equal(trimmed, "")
        est = pc.if_else(pc.fill_null(empty, True), pa.scalar(0.0), est)
        # floor (not round): bit-identical with the SQL oracle's floor()
        return batch.append_column(self.out_col, pc.floor(est).cast(pa.int64()))


class Fingerprint:
    """64-bit document fingerprint over whitespace-normalized lowercase
    text — stable across whitespace differences, usable as an exact-dup
    key.  Normalization is vectorized Arrow (regex collapse + trim +
    lower); the hash is polars' Rust 64-bit kernel (algo="fast",
    default) or the byte-wise FNV-1a reference (algo="fnv1a", per-row
    Python — keep for cross-system reproducibility needs)."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint",
                 algo: str = "fast"):
        self.text_col = text_col
        self.out_col = out_col
        self.algo = algo

    @staticmethod
    def fp64(text: str) -> int:
        """FNV-1a reference fingerprint of one normalized text."""
        norm = " ".join(text.split()).lower()
        h = np.uint64(1469598103934665603)
        p = np.uint64(1099511628211)
        for b in norm.encode():
            h = np.uint64((int(h) ^ b) * int(p) & 0xFFFFFFFFFFFFFFFF)
        return int(h)

    def _normalize(self, col) -> pa.Array:
        col = pc.fill_null(col, "")
        collapsed = pc.replace_substring_regex(col, r"\s+", " ")
        return pc.utf8_lower(pc.utf8_trim_whitespace(collapsed))

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = self._normalize(batch.column(self.text_col))
        if self.algo == "fnv1a":
            fps = np.array([self.fp64(t) for t in norm.to_pylist()],
                           dtype=np.uint64)
            return batch.append_column(self.out_col, pa.array(fps))
        try:
            from .sample import hash64

            fps = hash64(norm)
        except ImportError:  # pragma: no cover
            fps = np.array([self.fp64(t) for t in norm.to_pylist()],
                           dtype=np.uint64)
        return batch.append_column(self.out_col,
                                   pa.array(fps.astype(np.uint64)))
