"""Dedup / text-analysis / similarity / multimodal / checkpoint tests."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_with_dups():
    import ray.data as rd

    rng = np.random.RandomState(0)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    texts, ids = [], []
    for i in range(40):
        words = [vocab[rng.randint(len(vocab))] for _ in range(40)]
        texts.append(" ".join(words))
        ids.append(i)
    # planted near-dups: drop every 10th word
    for i in range(0, 40, 4):
        words = texts[i].split()
        texts.append(" ".join(w for j, w in enumerate(words) if j % 10 != 9))
        ids.append(i + 1000)
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts)}))


def test_minhash_lsh_finds_planted_dups():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs_with_dups(), threshold=0.5).to_pandas()
    planted = {(i, i + 1000) for i in range(0, 40, 4)}
    found = {(int(a), int(b)) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    recall = len(planted & found) / len(planted)
    assert recall >= 0.8, (recall, found)


def test_simhash_finds_planted_dups():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import simhash_pairs

    pairs = simhash_pairs(_docs_with_dups(), max_hamming=8).to_pandas()
    planted = {(i, i + 1000) for i in range(0, 40, 4)}
    found = {(int(a), int(b)) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert len(planted & found) / len(planted) >= 0.6


def test_popcount64_matches_python_bin_count():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import _popcount64

    rng = np.random.RandomState(9)
    x = rng.randint(0, 2**63, size=4096).astype(np.uint64)
    x[:4] = [0, 1, 0xFFFFFFFFFFFFFFFF, 1 << 63]
    expect = [bin(int(v)).count("1") for v in x]
    assert _popcount64(x).tolist() == expect
    assert _popcount64(np.zeros(0, dtype=np.uint64)).tolist() == []


def test_simhash_hot_bucket_is_fast_and_capped():
    # planted hot band bucket: 3000 docs sharing one 16-bit chunk; the
    # vectorized XOR+popcount path must stay sub-second per anchor pass
    # (the per-pair Python popcount it replaced was ~O(n^2) interpreter
    # work) and the max_bucket cap must bound membership
    import time

    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import simhash_pairs

    n = 3000
    texts = [f"shared prefix tokens alpha beta gamma delta {i}"
             for i in range(n)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts)}))
    t0 = time.perf_counter()
    full = simhash_pairs(ds, max_hamming=3).to_pandas()
    dt = time.perf_counter() - t0
    assert dt < 60, dt
    capped = simhash_pairs(ds, max_hamming=3, max_bucket=100).to_pandas()
    # cap keeps lowest ids: every surviving pair cites ids < 100 OR comes
    # from a bucket that was under the cap; capped output is a subset
    fullset = {(a, b) for a, b in zip(full.doc_a, full.doc_b)}
    capset = {(a, b) for a, b in zip(capped.doc_a, capped.doc_b)}
    assert capset <= fullset


def test_ngram_jaccard_verify():
    import ray
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        minhash_lsh_pairs,
        ngram_jaccard_verify,
    )

    ds = _docs_with_dups()
    docs = {r["doc_id"]: r["text"] for r in ds.take_all()}
    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    verified = ngram_jaccard_verify(pairs, ray.put(docs), threshold=0.5).to_pandas()
    assert len(verified) > 0
    assert (verified.jaccard >= 0.5).all()


def test_embedding_neardup():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        embedding_neardup_pairs,
    )

    rng = np.random.RandomState(1)
    base = rng.standard_normal((50, 16))
    noisy = base[:10] + rng.standard_normal((10, 16)) * 0.01
    vecs = np.concatenate([base, noisy])
    ids = list(range(50)) + [i + 1000 for i in range(10)]
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(vecs.reshape(-1), pa.float64()), 16)})
    pairs = embedding_neardup_pairs(rd.from_arrow(t), threshold=0.98).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b)}
    planted = {(i, i + 1000) for i in range(10)}
    assert len(planted & found) >= 7  # single-probe LSH: high but not full recall


def test_brute_force_vs_ivf_topk():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.RandomState(2)
    vecs = rng.standard_normal((300, 8))
    t = pa.table({"vec_id": pa.array(np.arange(300, dtype=np.int64)),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(vecs.reshape(-1), pa.float64()), 8)})
    q = vecs[:2]
    exact = brute_force_topk(rd.from_arrow(t), q, k=5, exclude_ids={0, 1}).to_pandas()
    # exact: query vector's own nearest (excluding itself) must have sim < 1
    assert set(exact.query_idx) == {0, 1}
    assert (exact.groupby("query_idx").size() == 5).all()
    approx = ivf_topk(rd.from_arrow(t), q, k=5, n_centroids=8, n_probe=4,
                      exclude_ids={0, 1}).to_pandas()
    # IVF with half the lists probed should recover most of the exact top-5
    overlap = len(set(map(tuple, exact[["query_idx", "vec_id"]].values))
                  & set(map(tuple, approx[["query_idx", "vec_id"]].values)))
    assert overlap >= 6  # of 10


def test_ivf_boundary_replication_improves_recall():
    """SPANN-style multi-assignment: recall never drops, no duplicate
    (query, vec) results, ranks stay contiguous 1..k."""
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((400, 8))
    t = pa.table({"vec_id": pa.array(np.arange(400, dtype=np.int64)),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(vecs.reshape(-1), pa.float64()), 8)})
    q = vecs[10:14]
    exact = brute_force_topk(rd.from_arrow(t), q, k=5).to_pandas()
    exact_set = set(map(tuple, exact[["query_idx", "vec_id"]].values))

    def recall(eps):
        a = ivf_topk(rd.from_arrow(t), q, k=5, n_centroids=8, n_probe=2,
                     replicate_eps=eps).to_pandas()
        # dedup + contiguous ranks even when lists share boundary vectors
        assert not a.duplicated(subset=["query_idx", "vec_id"]).any()
        for _, g in a.groupby("query_idx"):
            assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        return len(exact_set & set(map(tuple, a[["query_idx", "vec_id"]].values)))

    r0, r1 = recall(0.0), recall(0.15)
    assert r1 >= r0  # replication can only add candidates


def test_textstats_stages():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        Fingerprint,
        LanguageId,
        QualityScore,
        TokenCount,
    )

    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["the quick brown fox and the lazy dog in a field",
                           "el perro y el gato en la casa que se ve",
                           "这是中文文本的一个例子",
                           ""]})
    lang = LanguageId()(t).column("lang_guess").to_pylist()
    assert lang[0] == "en" and lang[1] == "es" and lang[2] == "zh" and lang[3] == "unknown"
    q = QualityScore()(t)
    assert q.column("q_n_tokens").to_pylist()[0] == 11
    assert q.column("q_stop_ratio").to_pylist()[3] == 0.0
    tc = TokenCount()(t).column("n_tokens_est").to_pylist()
    assert tc[3] == 0 and tc[0] >= 11
    fp = Fingerprint()(t).column("fingerprint").to_pylist()
    assert fp[0] != fp[1]
    assert Fingerprint()(t).column("fingerprint").to_pylist() == fp  # deterministic
    # whitespace-normalization invariance
    t2 = pa.table({"doc_id": [1], "text": ["the  quick\tbrown fox and the lazy dog in a  field"]})
    assert Fingerprint()(t2).column("fingerprint").to_pylist()[0] == fp[0]


def test_multimodal_plumbing():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        FrameSampler,
        ImageDecoder,
        ImageFeatureExtractor,
        synth_image_table,
    )

    ds = rd.from_arrow(synth_image_table(20))
    dec = ds.map_batches(ImageDecoder, batch_format="pyarrow", batch_size=8,
                         concurrency=1)
    feat = dec.map_batches(ImageFeatureExtractor(grid=2), batch_format="pyarrow")
    rows = feat.take_all()
    assert len(rows) == 20
    assert len(rows[0]["features"]) == 7  # 3 channel means + 2x2 blocks
    frames = ds.map_batches(FrameSampler(frames_per_item=3), batch_format="pyarrow")
    assert frames.count() == 60


def test_image_features_real_and_video_frames():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        FrameSampler,
        ImageFeatureExtractor,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        encode_bmp,
        synth_video_table,
    )

    # real features: a solid-red BMP -> channel means [1,0,0] and all
    # luminance blocks == 0.299
    px = np.zeros((10, 10, 3), dtype=np.uint8)
    px[:, :, 0] = 255
    t = pa.table({"item_id": pa.array([0], pa.int64()),
                  "payload": pa.array([encode_bmp(px)], pa.large_binary())})
    f = ImageFeatureExtractor(grid=2)(t).column("features").to_pylist()[0]
    assert abs(f[0] - 1.0) < 1e-5 and f[1] == 0.0 and f[2] == 0.0
    assert all(abs(v - 0.299) < 1e-3 for v in f[3:])

    # real raw-RGB24 frame sampling: exact frame bytes + true indices
    vt = synth_video_table(3, width=8, height=6, n_frames=12)
    out = FrameSampler(frames_per_item=4)(vt)
    assert out.column("frame_idx").to_pylist()[:4] == [0, 3, 6, 9]
    fsz = 8 * 6 * 3
    clip0 = vt.column("payload").to_pylist()[0]
    f3 = out.column("frame_payload").to_pylist()[1]
    assert f3 == clip0[3 * fsz:4 * fsz]
    got_mean = out.column("mean_pixel").to_pylist()[1]
    assert abs(got_mean - np.frombuffer(f3, np.uint8).mean()) < 1e-9
    # distributed path
    ds = rd.from_arrow(vt)
    n = ds.map_batches(FrameSampler(frames_per_item=4),
                       batch_format="pyarrow").count()
    assert n == 12


def test_checkpoint_resume(tmp_path):
    from open_telemetry_opentelemetry_collector_contrib_ray.state import run_resumable

    calls = []

    def run_shard(files, out_dir):
        calls.append(list(files))
        with open(f"{out_dir}/out.txt", "w") as f:
            f.write(",".join(files))
        return {"n_files": len(files)}

    files = [f"f{i:02d}" for i in range(8)]
    s1 = run_resumable(files, str(tmp_path / "out"), run_shard, n_shards=4)
    assert s1["shards_run"] == 4 and s1["shards_skipped"] == 0
    # resume: nothing re-runs
    s2 = run_resumable(files, str(tmp_path / "out"), run_shard, n_shards=4)
    assert s2["shards_run"] == 0 and s2["shards_skipped"] == 4
    assert len(calls) == 4


def test_conversation_policy_filter():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        conversation_policy_filter,
    )

    ds = rd.from_items([
        {"conv_id": "a", "turn_idx": 0, "attr_status": "ok"},
        {"conv_id": "a", "turn_idx": 1, "attr_status": "error"},
        {"conv_id": "b", "turn_idx": 0, "attr_status": "ok"},
    ])
    kept = conversation_policy_filter(ds, 'attributes["status"] == "error"').to_pandas()
    assert set(kept.conv_id) == {"a"} and len(kept) == 2


def test_dedup_clusters_union_find():
    import ray.data as rd
    import pyarrow as pa
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import (
        dedup_clusters,
    )

    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 2, 10, 11, 20], pa.int64()),
        "doc_b": pa.array([2, 3, 11, 12, 21], pa.int64()),
    }))
    out = dedup_clusters(pairs).to_pandas().set_index("doc_id")["cluster_id"].to_dict()
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_label_propagation():
    import ray.data as rd
    import pyarrow as pa
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import (
        dedup_clusters,
    )

    # chain 1-2-3-4 forces multiple propagation rounds
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 2, 3], pa.int64()),
        "doc_b": pa.array([2, 3, 4], pa.int64()),
    }))
    out = dedup_clusters(pairs, max_driver_pairs=0).to_pandas() \
        .set_index("doc_id")["cluster_id"].to_dict()
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_approx_top_k_matches_exact_for_heavy_hitters():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
        approx_top_k,
    )

    rng = np.random.RandomState(4)
    # zipf-ish: key i appears ~ 5000/i times
    keys = []
    for i in range(1, 60):
        keys += [f"k{i:02d}"] * (5000 // i)
    rng.shuffle(keys)
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(8)
    top = approx_top_k(ds, "k", k=5, capacity=64).to_pylist()
    assert [t["k"] for t in top] == ["k01", "k02", "k03", "k04", "k05"]
    # heavy keys above N/capacity are exact
    assert top[0]["est_count"] == 5000


def test_approx_distinct_within_error():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
        approx_distinct,
    )

    n = 20_000
    ds = rd.from_arrow(pa.table({"v": [f"item-{i}" for i in range(n)]})).repartition(8)
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - n) / n < 0.05  # ~1.6% expected at p=12


def test_neardup_dedup_docs_invariants():
    """End-to-end near-dup removal: survivors = all docs minus every
    non-representative cluster member; each caught cluster keeps exactly
    its min-id representative."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    surv = set(e.queries()["neardup_dedup_docs"](sf).to_pandas()["doc_id"])
    clusters = e.queries()["neardup_clusters"](sf).to_pandas()
    # note: neardup_clusters uses unverified LSH pairs; the dedup query
    # verifies with exact jaccard, so its clusters are a SUBSET — check
    # structural invariants instead of exact equality
    all_ids = set(e.queries()["doc_token_counts"](sf).to_pandas()["doc_id"]) \
        | {i + 100_000 for i in
           set(e.queries()["doc_token_counts"](sf).to_pandas()["doc_id"])
           if i % 5 == 0}
    dropped = all_ids - surv
    # every dropped doc must be a planted-dup participant's cluster member
    assert dropped, "pipeline should drop at least the planted duplicates"
    # representatives always survive: a cluster_id is its own min doc_id
    for cid in set(clusters["cluster_id"]):
        assert cid in surv or cid not in all_ids
    # no survivor set larger than the corpus, and survivors + dropped == corpus
    assert surv | dropped == all_ids and not (surv & dropped)


def test_approx_quantile_within_rank_error():
    """Bottom-k-by-hash quantile sample: estimates within ~3 rank
    percentile points of exact at k=1024; deterministic across runs."""
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
        approx_quantile,
    )

    rng = np.random.RandomState(9)
    n = 20000
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(rng.lognormal(3, 1, n))})
    ds = rd.from_arrow(t)
    got = approx_quantile(ds, "v", "id", qs=(0.5, 0.95), k=1024)
    got2 = approx_quantile(ds, "v", "id", qs=(0.5, 0.95), k=1024)
    assert got.equals(got2)  # deterministic
    vs = np.sort(t.column("v").to_numpy())
    for q, col in [(0.5, "p50"), (0.95, "p95")]:
        est = got.column(col)[0].as_py()
        rank = np.searchsorted(vs, est) / n
        assert abs(rank - q) < 0.03, (q, rank)


def test_audio_pipeline_real_kernels():
    """PCM16 audio path: chunking is exact byte math; RMS/ZCR are real
    signal features (a pure sine has rms ~ amp/sqrt(2) and zcr ~ 2f/sr)."""
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        AudioChunker,
        AudioFeatureExtractor,
        synth_audio_table,
    )

    t = synth_audio_table(10, sample_rate=16000, seconds=1.0)
    ds = rd.from_arrow(t)
    chunks = ds.map_batches(AudioChunker(chunk_ms=250), batch_format="pyarrow",
                            batch_size=4)
    feats = chunks.map_batches(AudioFeatureExtractor(), batch_format="pyarrow")
    df = feats.to_pandas()
    assert len(df) == 40  # 10 clips x 4 chunks of 250ms
    assert set(df.chunk_idx) == {0, 1, 2, 3}
    # clip 0 is a 100 Hz sine at amp 0.5 (+ small noise):
    c0 = df[df.item_id == 0]
    assert abs(c0.rms.mean() - 0.5 / np.sqrt(2)) < 0.05
    # noise adds crossings near the sine's zeros, so zcr is bounded below
    # by the pure-sine rate 2f/sr and stays well under the noise-floor rate
    assert 2 * 100 / 16000 <= c0.zcr.mean() < 0.06
    # deterministic
    df2 = chunks.map_batches(AudioFeatureExtractor(),
                             batch_format="pyarrow").to_pandas()
    assert np.allclose(df.rms, df2.rms)


def test_cluster_keep_best_priority_keeper():
    import pyarrow as pa
    import ray.data

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import (
        cluster_keep_best,
    )

    clusters = pa.table({"doc_id": pa.array([1, 2, 3, 7, 8], pa.int64()),
                         "cluster_id": pa.array([1, 1, 1, 7, 7], pa.int64())})
    docs = pa.table({"doc_id": pa.array([1, 2, 3, 7, 8, 9], pa.int64()),
                     "quality": pa.array([5, 9, 9, 1, 2, 100], pa.int64())})
    out = cluster_keep_best(ray.data.from_arrow(clusters),
                            ray.data.from_arrow(docs), "quality") \
        .to_pandas().sort_values("cluster_id").reset_index(drop=True)
    # cluster 1: quality tie 9 between docs 2,3 -> smaller id wins;
    # cluster 7: doc 8 (quality 2) beats doc 7; doc 9 is in no cluster
    assert list(map(tuple, out[["cluster_id", "doc_id"]].to_numpy())) == \
        [(1, 2), (7, 8)]


def test_conversation_policy_filter_semi_join_fallback():
    # past max_broadcast_keys the filter must switch to the bucketed
    # semi-join and return the identical row set
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        conversation_policy_filter,
    )

    rows = []
    for c in range(40):
        rows.append({"conv_id": f"c{c:02d}", "turn_idx": 0,
                     "attr_status": "error" if c % 3 == 0 else "ok"})
        rows.append({"conv_id": f"c{c:02d}", "turn_idx": 1,
                     "attr_status": "ok"})
    cond = 'attributes["status"] == "error"'
    broad = conversation_policy_filter(rd.from_items(rows), cond) \
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    joined = conversation_policy_filter(rd.from_items(rows), cond,
                                        max_broadcast_keys=1, n_buckets=4) \
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert set(broad.conv_id) == {f"c{c:02d}" for c in range(0, 40, 3)}
    assert broad[joined.columns].equals(joined[joined.columns]) or \
        broad.sort_index(axis=1).equals(joined.sort_index(axis=1))
    # no conversation matches -> empty, both paths
    none = conversation_policy_filter(
        rd.from_items(rows), 'attributes["status"] == "nope"').to_pandas()
    assert len(none) == 0


def test_semdedup_drops_planted_exact_copies(ray_session):
    """SemDeDup: exact copies (higher ids) flagged keep=False, their
    originals keep=True; random isotropic vectors never collide at 0.9."""
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.cluster import (
        seed_centroids,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import (
        semdedup_flags,
    )

    rng = np.random.RandomState(11)
    n, d = 400, 32
    vecs = rng.standard_normal((n, d))
    ids = list(range(n)) + [i + 10_000 for i in range(0, n, 4)]
    allv = np.concatenate([vecs, vecs[::4]])
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(allv.reshape(-1), pa.float64()), d),
    })
    cents = seed_centroids(rd.from_arrow(tbl), 8)
    out = semdedup_flags(rd.from_arrow(tbl), cents, threshold=0.9) \
        .to_pandas().set_index("vec_id")
    planted = [i + 10_000 for i in range(0, n, 4)]
    assert not out.loc[planted, "keep"].any()          # all copies dropped
    assert out.loc[list(range(n)), "keep"].all()       # all originals kept


def test_cms_never_underestimates_and_merges():
    import numpy as np
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
        CMS,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        hash64,
    )
    import pyarrow as pa

    rng = np.random.RandomState(7)
    keys = pa.array([f"u{i}" for i in range(300)])
    counts = rng.randint(1, 50, size=300).astype(np.int64)
    h = hash64(keys)

    # one-shot build vs a 3-way split merge must be identical
    whole = CMS(w=32, d=4)
    whole.add_hashed(h, counts)
    parts = [CMS(w=32, d=4) for _ in range(3)]
    for i in range(3):
        parts[i].add_hashed(h[i::3], counts[i::3])
    merged = parts[0].merge(parts[1]).merge(parts[2])
    assert np.array_equal(whole.m, merged.m)

    est = whole.estimate_hashed(h)
    assert (est >= counts).all()          # structural: never under
    assert int(whole.m[0].sum()) == int(counts.sum())  # N readable


def test_cms_bound_check_query_other_scales():
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_cms_bound_check,
    )

    for sf in ("/root/testdata/sf0.001",):
        t = q_cms_bound_check(sf)
        row = t.to_pylist()[0]
        assert row["n_underestimates"] == 0
        assert row["n_over_bound"] == 0
        assert row["n_keys"] > 0


def test_split_sentences_rule_and_positions():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
        split_sentences,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "Hello world. How are you?  Fine!",
            "No terminal punctuation here",
            "Multi!!! Marks... and end.",
        ], pa.string()),
    })
    out = split_sentences(rd.from_arrow(t), min_chars=2)
    rows = sorted((r["doc_id"], r["sent_idx"], r["sentence"])
                  for r in out.take_all())
    assert rows == [
        (1, 0, "Hello world"), (1, 1, "How are you"), (1, 2, "Fine"),
        (2, 0, "No terminal punctuation here"),
        (3, 0, "Multi"), (3, 1, "Marks"), (3, 2, "and end"),
    ]


def test_split_sentences_min_chars_and_empty():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
        split_sentences,
    )

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["A. Bc. D.", ""], pa.string())})
    out = split_sentences(rd.from_arrow(t), min_chars=2)
    rows = sorted((r["doc_id"], r["sent_idx"], r["sentence"])
                  for r in out.take_all())
    # 'A' and 'D' dropped (< 2 chars); positions renumber over KEPT
    assert rows == [(1, 0, "Bc")]
