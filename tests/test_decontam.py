"""Decontamination + repetition-stats tests (stages/decontam.py)."""

import numpy as np
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.decontam import (
    BloomDecontaminator,
    BloomFilter,
    Decontaminator,
    RepetitionStats,
    build_benchmark_ngrams,
    build_bloom_ngrams,
    decontaminate,
)

BENCH = [
    "the quick brown fox jumps over the lazy dog again and again",
    "pack my box with five dozen liquor jugs please and thank you",
]
# doc 1 copies an 8-token span from BENCH[0]; doc 2 shares nothing; doc 3
# copies a 7-token span only (below n=8 -> clean); doc 4 is too short.
CORPUS = pa.table({
    "doc_id": [1, 2, 3, 4],
    "text": [
        "intro words then the quick brown fox jumps over the lazy dog closing",
        "completely different content with no overlapping sequences at all here today",
        "prefix quick brown fox jumps over the lazy suffix words here",
        "too short",
    ],
})


def _ray_ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def test_decontaminator_flags_planted_overlap():
    bench = build_benchmark_ngrams(BENCH, n=8)
    dec = Decontaminator(bench, n=8, threshold=1)
    out = dec(CORPUS)
    flags = dict(zip(out.column("doc_id").to_pylist(),
                     out.column("contaminated").to_pylist()))
    counts = dict(zip(out.column("doc_id").to_pylist(),
                      out.column("contam_ngrams").to_pylist()))
    assert flags == {1: True, 2: False, 3: False, 4: False}
    # doc 1 embeds the 9-token benchmark span "the ... dog" -> 9-8+1 = 2
    # matching 8-grams
    assert counts[1] == 2


def test_decontaminate_dataset_drop_mode():
    ds = _ray_ds(CORPUS)
    out = decontaminate(ds, list(BENCH), n=8, threshold=1, mode="drop")
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")])
    assert sorted(tbl.column("doc_id").to_pylist()) == [2, 3, 4]
    assert tbl.schema.names == ["doc_id", "text"]


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    others = rng.integers(0, 2**63, 20000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    bf = BloomFilter(m_bits=1 << 17, k=4)
    bf.add(members)
    assert bf.contains(members).all()  # no false negatives, ever
    fp = bf.contains(others).mean()
    assert fp <= 3 * bf.fp_rate(len(members)) + 0.01


def test_bloom_merge_equals_single_build():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**63, 1000, dtype=np.uint64)
    b = rng.integers(0, 2**63, 1000, dtype=np.uint64)
    one = BloomFilter(m_bits=1 << 16, k=3)
    one.add(np.concatenate([a, b]))
    m1 = BloomFilter(m_bits=1 << 16, k=3)
    m1.add(a)
    m2 = BloomFilter(m_bits=1 << 16, k=3)
    m2.add(b)
    m1.merge(m2)
    assert np.array_equal(one.words, m1.words)
    # roundtrip through bytes (the broadcast form)
    rt = BloomFilter.from_bytes(m1.to_bytes(), k=3)
    assert np.array_equal(rt.words, one.words)


def test_bloom_decontaminator_superset_of_exact():
    bench_ds = _ray_ds(pa.table({"text": BENCH}))
    exact = Decontaminator(build_benchmark_ngrams(BENCH, n=8), n=8)(CORPUS)
    bloom = build_bloom_ngrams(bench_ds, n=8, m_bits=1 << 18, k=4)
    bl = BloomDecontaminator(bloom, n=8)(CORPUS)
    ex_flags = np.array(exact.column("contaminated").to_pylist())
    bl_flags = np.array(bl.column("contaminated").to_pylist())
    # bloom can only OVER-flag (no false negatives)
    assert (bl_flags | ~ex_flags).all() and bl_flags[0]
    # at this bloom size there is no FP on 4 docs
    assert np.array_equal(ex_flags, bl_flags)


def test_repetition_stats_hand_computed():
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "a b a b a b",      # bigrams: ab,ba,ab,ba,ab -> total 5, distinct 2, top 3
            "w x y z",           # all distinct: total 3, distinct 3, top 1
            "solo",              # < 2 tokens -> zeros
        ],
    })
    out = RepetitionStats(n=2)(t)
    assert out.column("n_grams").to_pylist() == [5, 3, 0]
    dup = out.column("dup_gram_ppm").to_pylist()
    top = out.column("top_gram_ppm").to_pylist()
    assert dup[0] == int(np.floor((1 - 2 / 5) * 1e6))
    assert top[0] == int(np.floor(3 / 5 * 1e6))
    assert dup[1] == 0 and top[1] == int(np.floor(1 / 3 * 1e6))
    assert dup[2] == 0 and top[2] == 0


def test_decontaminator_fraction_mode_exact_cross_multiplication():
    bench = build_benchmark_ngrams(BENCH, n=8)
    # doc 1 has 6 distinct 8-grams, 2 matching -> 2/6 = 1/3 of grams
    dec = Decontaminator(bench, n=8, frac=(1, 3))
    out = dec(CORPUS)
    rows = {d: (c, t, f) for d, c, t, f in zip(
        out.column("doc_id").to_pylist(),
        out.column("contam_ngrams").to_pylist(),
        out.column("total_ngrams").to_pylist(),
        out.column("contaminated").to_pylist())}
    assert rows[1][0] == 2 and rows[1][2] is True   # 2*3 >= 1*total(6)
    assert rows[2][2] is False and rows[3][2] is False
    assert rows[4] == (0, 0, False)  # <8 tokens: zero grams, never flagged
    # one gram tighter and the same doc falls below the gate
    dec2 = Decontaminator(bench, n=8, frac=(1, 2))
    out2 = dec2(CORPUS)
    f2 = dict(zip(out2.column("doc_id").to_pylist(),
                  out2.column("contaminated").to_pylist()))
    assert f2[1] is False


def test_decontaminate_frac_drop_mode_strips_all_annotations():
    ds = _ray_ds(CORPUS)
    out = decontaminate(ds, list(BENCH), n=8, frac=(1, 3), mode="drop")
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")])
    assert sorted(tbl.column("doc_id").to_pylist()) == [2, 3, 4]
    assert tbl.schema.names == ["doc_id", "text"]
