"""Benchmark decontamination + within-document repetition stats for
training corpora.

Decontamination (the GPT-3 appendix-C / Dolma recipe): extract word
n-grams from every evaluation-benchmark document, broadcast the n-gram
hash set once (`ray.put`), and flag training documents that share at
least `threshold` distinct n-grams with the benchmark.  The 100 TB
side is map-only — no shuffle, no join: each batch checks its grams
against the broadcast sorted uint64 array with a searchsorted probe.

When the "reference" side is itself huge (dedup against a prior crawl
rather than a small eval set), the exact set no longer fits in one
broadcast object; the Bloom-filter variant keeps a fixed-size bit
array (still broadcast-once, built distributed from per-batch partial
blooms OR-reduced on the driver — kilobytes per batch regardless of
input size) and trades a bounded false-positive rate for constant
memory.  Bloom false positives only ever OVER-flag (never leak a
contaminated doc through), which is the safe direction for
decontamination.

Repetition stats are the Gopher-style quality signals (duplicate
n-gram fraction, top-n-gram fraction) computed per document from the
same tokenization — pure per-batch map, vectorized over the
concatenated token-hash arrays.

This is "beyond the reference" functionality (training-data pipeline
ops per the project brief); the broadcast-membership pattern mirrors
the reference's k8sattributes/geoip enrich shape
(processor/geoipprocessor/geoip_processor.go:29-80 — load once per
worker, probe per record).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .dedup import _TokenHasher, _shingle_hashes

_TOKEN_RE = re.compile(r"[a-z0-9_]+")  # ASCII on lowered text: parity with
# the oracle's RE2 regexp_extract_all pattern (RE2 \w is ASCII-only)


def _doc_grams(text: str, n: int, th: _TokenHasher) -> np.ndarray:
    """Distinct n-word-gram hashes of one doc; empty array when the doc
    has fewer than n tokens (a short doc can't be flagged — matches the
    oracle, whose lead(n-1) window drops such docs entirely)."""
    toks = _TOKEN_RE.findall(text.lower() if text else "")
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    return _shingle_hashes(" ".join(toks), w=n, token_hasher=th)


def build_benchmark_ngrams(bench, text_col: str = "text", n: int = 8):
    """Union of distinct n-gram hashes of the benchmark side, as a SORTED
    uint64 numpy array.

    `bench` is a ray.data.Dataset (preferred: distinct grams are computed
    distributed, only kilobyte hash arrays travel) or a list of strings.
    The result is small (eval benchmarks are MBs); broadcast it with
    ray.put and hand the ObjectRef to every Decontaminator.
    """
    if isinstance(bench, (list, tuple)):
        th = _TokenHasher()
        parts = [_doc_grams(t, n, th) for t in bench]
        allg = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        return np.unique(allg)

    def batch_grams(t: pa.Table) -> pa.Table:
        th = _TokenHasher()
        parts = [_doc_grams(x, n, th) for x in t.column(text_col).to_pylist()]
        u = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        return pa.table({"gram": pa.array(u, pa.uint64())})

    out = bench.map_batches(batch_grams, batch_format="pyarrow")
    arrs = [np.asarray(b.column("gram")) for b in out.iter_batches(batch_format="pyarrow")]
    allg = np.concatenate(arrs) if arrs else np.empty(0, np.uint64)
    return np.unique(allg)


def _sorted_contains(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership of vals in a sorted array (vectorized searchsorted probe)."""
    if len(sorted_arr) == 0 or len(vals) == 0:
        return np.zeros(len(vals), dtype=bool)
    idx = np.searchsorted(sorted_arr, vals)
    idx[idx == len(sorted_arr)] = len(sorted_arr) - 1
    return sorted_arr[idx] == vals


class Decontaminator:
    """Per-batch map stage: flag docs sharing >= threshold distinct
    n-grams with the broadcast benchmark set.

    Adds `contam_ngrams` (int64 distinct matching grams) and
    `contaminated` (bool).  Use as a callable class in
    `map_batches(Decontaminator, fn_constructor_kwargs=..., concurrency=N)`
    so the ObjectRef is resolved once per actor, or pass the plain array.
    """

    def __init__(self, bench_grams, text_col: str = "text", n: int = 8,
                 threshold: int = 1, frac: tuple[int, int] | None = None):
        import ray

        if isinstance(bench_grams, ray.ObjectRef):
            bench_grams = ray.get(bench_grams)
        self.bench = np.asarray(bench_grams, dtype=np.uint64)
        self.text_col = text_col
        self.n = n
        self.threshold = threshold
        # overlap-fraction mode (PaLM / Llama decontamination recipe):
        # contaminated iff matching/total distinct grams >= num/den,
        # evaluated as the integer cross-multiplication
        # matching * den >= num * total (exact, no float boundary).
        self.frac = frac
        self._th = _TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        grams = [_doc_grams(t, self.n, self._th) for t in texts]
        lens = np.array([len(g) for g in grams], dtype=np.int64)
        flat = np.concatenate(grams) if grams else np.empty(0, np.uint64)
        hit = _sorted_contains(self.bench, flat)
        # segment-sum the hit mask back to per-doc counts
        counts = np.zeros(len(texts), dtype=np.int64)
        if len(flat):
            seg = np.repeat(np.arange(len(texts)), lens)
            np.add.at(counts, seg, hit.astype(np.int64))
        batch = batch.append_column("contam_ngrams", pa.array(counts, pa.int64()))
        if self.frac is not None:
            num, den = self.frac
            batch = batch.append_column(
                "total_ngrams", pa.array(lens, pa.int64()))
            flag = (lens > 0) & (counts * den >= num * lens)
            return batch.append_column("contaminated", pa.array(flag))
        return batch.append_column(
            "contaminated", pa.array(counts >= self.threshold))


def decontaminate(ds, bench, text_col: str = "text", n: int = 8,
                  threshold: int = 1, mode: str = "flag", concurrency=None,
                  frac: tuple[int, int] | None = None):
    """Decontaminate `ds` against `bench` (Dataset | list[str] | sorted
    uint64 array).  mode="flag" annotates; mode="drop" removes
    contaminated docs.  `frac=(num, den)` switches the flag from the
    absolute `threshold` to the overlap-fraction rule
    matching/total >= num/den (integer-exact).  One broadcast, zero
    shuffle."""
    import ray

    if not isinstance(bench, np.ndarray):
        bench = build_benchmark_ngrams(bench, text_col=text_col, n=n)
    ref = ray.put(bench)
    kwargs = dict(bench_grams=ref, text_col=text_col, n=n,
                  threshold=threshold, frac=frac)
    if concurrency:
        out = ds.map_batches(Decontaminator, fn_constructor_kwargs=kwargs,
                             batch_format="pyarrow", concurrency=concurrency)
    else:
        dec = Decontaminator(bench, text_col=text_col, n=n,
                             threshold=threshold, frac=frac)
        out = ds.map_batches(dec, batch_format="pyarrow")
    if mode == "drop":
        import pyarrow.compute as pc

        def keep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(t.column("contaminated")))
            drop = [c for c in ("contam_ngrams", "total_ngrams",
                                "contaminated") if c in t.column_names]
            return t.drop_columns(drop)

        out = out.map_batches(keep, batch_format="pyarrow")
    return out


# ---------------------------------------------------------------- bloom

class BloomFilter:
    """Fixed-size Bloom filter over uint64 hashes; mergeable by OR.

    k probe positions are derived double-hash style from the input hash
    (idx_i = h1 + i*h2 mod m) so no re-hashing of the underlying grams
    is needed.  All ops are vectorized numpy over the packed uint64 word
    array.
    """

    def __init__(self, m_bits: int = 1 << 23, k: int = 4, words=None):
        assert m_bits % 64 == 0
        self.m = m_bits
        self.k = k
        self.words = (np.zeros(m_bits // 64, dtype=np.uint64)
                      if words is None else words)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes
        h2 = (hashes >> np.uint64(33)) | np.uint64(1)  # odd -> full period
        return np.stack([(h1 + np.uint64(i) * h2) % np.uint64(self.m)
                         for i in range(self.k)])  # (k, n)

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.words, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)  # (k, n)
        bits = (self.words[pos >> np.uint64(6)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.words |= other.words
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int = 4) -> "BloomFilter":
        words = np.frombuffer(data, dtype=np.uint64).copy()
        return cls(m_bits=len(words) * 64, k=k, words=words)

    def fp_rate(self, n_items: int) -> float:
        """Theoretical false-positive rate after n_items insertions."""
        return (1.0 - np.exp(-self.k * n_items / self.m)) ** self.k


def build_bloom_ngrams(ds, text_col: str = "text", n: int = 8,
                       m_bits: int = 1 << 23, k: int = 4) -> BloomFilter:
    """Distributed Bloom build: every batch emits ONE row holding its
    partial bloom's packed bits (m_bits/8 bytes — constant regardless of
    batch size); the driver OR-reduces them streaming.  At 100 TB the
    driver sees num_batches * m/8 bytes of kilobyte-scale partials, never
    the data."""

    def partial(t: pa.Table) -> pa.Table:
        th = _TokenHasher()
        bf = BloomFilter(m_bits=m_bits, k=k)
        for x in t.column(text_col).to_pylist():
            bf.add(_doc_grams(x, n, th))
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.large_binary())})

    out = ds.map_batches(partial, batch_format="pyarrow")
    acc = BloomFilter(m_bits=m_bits, k=k)
    for b in out.iter_batches(batch_format="pyarrow"):
        for raw in b.column("bloom"):
            acc.merge(BloomFilter.from_bytes(raw.as_py(), k=k))
    return acc


class BloomDecontaminator:
    """Decontaminator probing a broadcast BloomFilter instead of the exact
    set: constant memory per worker for arbitrarily large reference
    corpora; false positives over-flag by fp_rate per gram, no false
    negatives."""

    def __init__(self, bloom, text_col: str = "text", n: int = 8,
                 threshold: int = 1, k: int = 4):
        import ray

        if isinstance(bloom, ray.ObjectRef):
            bloom = ray.get(bloom)
        if isinstance(bloom, bytes):
            bloom = BloomFilter.from_bytes(bloom, k=k)
        self.bloom = bloom
        self.text_col = text_col
        self.n = n
        self.threshold = threshold
        self._th = _TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        grams = [_doc_grams(t, self.n, self._th) for t in texts]
        lens = np.array([len(g) for g in grams], dtype=np.int64)
        flat = np.concatenate(grams) if grams else np.empty(0, np.uint64)
        hit = self.bloom.contains(flat)
        counts = np.zeros(len(texts), dtype=np.int64)
        if len(flat):
            seg = np.repeat(np.arange(len(texts)), lens)
            np.add.at(counts, seg, hit.astype(np.int64))
        batch = batch.append_column("contam_ngrams", pa.array(counts, pa.int64()))
        return batch.append_column(
            "contaminated", pa.array(counts >= self.threshold))


# ---------------------------------------------------------- repetition

class RepetitionStats:
    """Gopher-style within-document repetition signals over word n-grams:

    - dup_gram_ppm: floor((1 - distinct_grams/total_grams) * 1e6)
    - top_gram_ppm: floor(max_gram_count/total_grams * 1e6)

    Docs with fewer than n tokens get 0 for both (nothing to repeat).
    Integer ppm keeps the values hash-stable for the SQL oracle (floor on
    both sides; identical double expression order)."""

    def __init__(self, text_col: str = "text", n: int = 2, prefix: str = ""):
        self.text_col = text_col
        self.n = n
        self.prefix = prefix
        self._th = _TokenHasher()

    def _gram_counts(self, text: str):
        """(total, distinct, max_count) of n-gram occurrences in one doc."""
        toks = _TOKEN_RE.findall(text.lower() if text else "")
        n = self.n
        if len(toks) < n:
            return 0, 0, 0
        h = self._th(toks)
        m = len(h) - n + 1
        from .dedup import _P1, _P2, _P3
        salts = [_P1, _P2, _P3] + [np.uint64(2 * j + 1) for j in range(3, n)]
        sh = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            sh = sh ^ (h[j:j + m] * salts[j])
        _, cnt = np.unique(sh, return_counts=True)
        return m, len(cnt), int(cnt.max())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        tot = np.zeros(len(texts), dtype=np.int64)
        dup = np.zeros(len(texts), dtype=np.int64)
        top = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            total, distinct, mx = self._gram_counts(t)
            tot[i] = total
            if total:
                dup[i] = int(np.floor((1.0 - distinct / total) * 1000000.0))
                top[i] = int(np.floor(mx / total * 1000000.0))
        batch = batch.append_column(
            self.prefix + "n_grams", pa.array(tot, pa.int64()))
        batch = batch.append_column(
            self.prefix + "dup_gram_ppm", pa.array(dup, pa.int64()))
        return batch.append_column(
            self.prefix + "top_gram_ppm", pa.array(top, pa.int64()))
