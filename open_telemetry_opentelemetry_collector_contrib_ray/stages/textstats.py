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
        texts = batch.column(self.text_col).to_pylist()
        return batch.append_column(
            self.out_col, pa.array([self.guess(t or "") for t in texts], pa.string()))


class QualityScore:
    """Document quality heuristics: length, mean word length, punctuation
    ratio, stopword ratio, digit ratio, repetition (distinct-token ratio).
    Columns are emitted individually so downstream filters stay columnar."""

    def __init__(self, text_col: str = "text", prefix: str = "q_"):
        self.text_col = text_col
        self.prefix = prefix
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        n_chars = pc.utf8_length(col).cast(pa.int64())
        texts = col.to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, np.int64)
        mean_wl = np.zeros(n, np.float64)
        stop_ratio = np.zeros(n, np.float64)
        distinct_ratio = np.zeros(n, np.float64)
        digit_ratio = np.zeros(n, np.float64)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = _WORD_RE.findall(t.lower())
            if toks:
                n_tokens[i] = len(toks)
                mean_wl[i] = sum(map(len, toks)) / len(toks)
                stop_ratio[i] = sum(1 for w in toks if w in self.stop) / len(toks)
                distinct_ratio[i] = len(set(toks)) / len(toks)
            digits = sum(c.isdigit() for c in t)
            digit_ratio[i] = digits / len(t)
        out = batch
        p = self.prefix
        for name, arr in [("n_chars", n_chars), ("n_tokens", pa.array(n_tokens)),
                          ("mean_word_len", pa.array(mean_wl)),
                          ("stop_ratio", pa.array(stop_ratio)),
                          ("distinct_ratio", pa.array(distinct_ratio)),
                          ("digit_ratio", pa.array(digit_ratio))]:
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
    """64-bit rolling-hash document fingerprint (content-defined): a
    polynomial rolling hash over the normalized text — stable across
    whitespace differences, usable as an exact-dup key."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    @staticmethod
    def fp64(text: str) -> int:
        norm = " ".join(text.split()).lower()
        h = np.uint64(1469598103934665603)
        p = np.uint64(1099511628211)
        for b in norm.encode():
            h = np.uint64((int(h) ^ b) * int(p) & 0xFFFFFFFFFFFFFFFF)
        return int(h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = np.array([self.fp64(t or "") for t in texts], dtype=np.uint64)
        return batch.append_column(self.out_col, pa.array(fps))
