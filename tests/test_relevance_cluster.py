"""Relevance (DF / BM25) and distributed-KMeans stage tests."""

import math

import numpy as np
import pyarrow as pa
import pytest
import pyarrow.compute as pc


def _docs():
    import ray.data as rd

    texts = [
        "spark spark fast table",
        "vector table join",
        "stream stream stream spark",
        "the quick brown fox",
        "",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})), texts


def test_token_df_matches_bruteforce():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.relevance import token_df

    ds, texts = _docs()
    got = {r["token"]: r["df"] for r in token_df(ds).take_all()}
    import re
    exp = {}
    for t in texts:
        for tok in set(re.findall(r"\w+", t.lower())):
            exp[tok] = exp.get(tok, 0) + 1
    assert got == exp


def test_token_df_min_df():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.relevance import token_df

    ds, _ = _docs()
    got = {r["token"]: r["df"] for r in token_df(ds, min_df=2).take_all()}
    assert got == {"spark": 2, "table": 2}


def test_bm25_matches_reference_formula():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.relevance import bm25

    ds, texts = _docs()
    terms = ["spark", "stream"]
    got = {r["doc_id"]: r["score"]
           for r in bm25(ds, terms).take_all()}

    import re
    dls = [len(re.findall(r"\w+", t.lower())) for t in texts]
    n, avgdl = len(texts), sum(dls) / len(texts)
    k1, b = 1.2, 0.75
    for i, t in enumerate(texts):
        score = 0.0
        for term in terms:
            tf = len(re.findall(r"\b" + term + r"\b", t.lower()))
            df = sum(1 for x in texts
                     if re.search(r"\b" + term + r"\b", x.lower()))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            norm = k1 * (1.0 - b + b * (dls[i] / avgdl))
            score = score + idf * (tf * (k1 + 1.0)) / (tf + norm)
        assert got[i] == pytest.approx(score, rel=1e-12), (i, t)
    # empty doc scores 0 (tf = 0 for every term)
    assert got[4] == 0.0


def _blobs(n_per=60, k=3, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-10, 10, size=(k, dim))
    pts = np.concatenate(
        [centers[j] + 0.1 * rng.randn(n_per, dim) for j in range(k)])
    labels = np.repeat(np.arange(k), n_per)
    # ids 0..k-1 are one point from each blob (deterministic seeds land
    # in distinct blobs)
    order = np.concatenate([[j * n_per] for j in range(k)] +
                           [np.setdiff1d(np.arange(k * n_per),
                                         [j * n_per for j in range(k)])])
    pts, labels = pts[order], labels[order]
    return pts.astype(np.float32), labels


def test_kmeans_recovers_planted_blobs():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.cluster import (
        kmeans_assign,
        kmeans_fit,
    )

    pts, labels = _blobs()
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(pts)), pa.int64()),
        "embedding": pa.array(pts.tolist(),
                              pa.list_(pa.float32()))})).repartition(4)
    cents, inertia = kmeans_fit(ds, k=3, iters=5)
    assigned = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    got = assigned["cluster_id"].to_numpy()
    # every planted blob maps to exactly one cluster (perfect separation)
    for j in range(3):
        vals = np.unique(got[labels == j])
        assert len(vals) == 1, (j, vals)
    # tight blobs: inertia ~ n * dim * 0.01 scale, far below one
    # inter-center distance
    assert inertia < 100.0


def test_kmeans_assign_tie_breaks_low_id():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.cluster import kmeans_assign

    # two identical centroids: every point must go to cluster 0
    cents = np.zeros((2, 4), dtype=np.float32)
    pts = np.ones((10, 4), dtype=np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array(pts.tolist(), pa.list_(pa.float32()))}))
    out = kmeans_assign(ds, cents).to_pandas()
    assert (out["cluster_id"] == 0).all()


def test_kmeans_empty_cluster_keeps_centroid():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.cluster import kmeans_fit

    # all points at (5, 5); explicit init puts centroid 1 far away so it
    # attracts NOTHING — Lloyd's empty-cluster fallback must keep its
    # position (no NaNs from 0/0)
    pts = np.full((6, 2), 5.0, dtype=np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(pts.tolist(), pa.list_(pa.float32()))}))
    init = np.array([[5.0, 5.0], [200.0, 200.0]], dtype=np.float32)
    cents, _ = kmeans_fit(ds, k=2, iters=3, init=init)
    assert np.allclose(cents[0], [5.0, 5.0], atol=1e-4)
    assert np.allclose(cents[1], [200.0, 200.0], atol=1e-4)
    assert np.isfinite(cents).all()


def test_grouped_ntile_sql_semantics():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import grouped_ntile

    # group a: 10 rows into 4 tiles -> sizes 3,3,2,2; group b: 2 rows
    # into 4 tiles -> each row its own tile (SQL ntile n < k case)
    tbl = pa.table({
        "k": pa.array(["a"] * 10 + ["b"] * 2),
        "v": pa.array(list(range(10)) + [5, 1], pa.int64()),
        "id": pa.array(range(12), pa.int64())})
    out = grouped_ntile(rd.from_arrow(tbl), ["k"], ["v", "id"],
                        n_tiles=4).to_pandas()
    a = out[out.k == "a"].sort_values("v")["tile"].tolist()
    assert a == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    b = out[out.k == "b"].sort_values("v")["tile"].tolist()
    assert b == [1, 2]


def test_kmeans_fit_on_hash_sample():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.cluster import (
        kmeans_assign,
        kmeans_fit,
    )

    pts, labels = _blobs(n_per=200)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(pts)), pa.int64()),
        "embedding": pa.array(pts.tolist(),
                              pa.list_(pa.float32()))})).repartition(4)
    # train on ~1/4 hash-sample of ids, assign the FULL corpus (the
    # 100 TB pattern); blobs are tight so membership still perfect
    cents, _ = kmeans_fit(ds, k=3, iters=5, sample_mod=4)
    got = kmeans_assign(ds, cents).to_pandas() \
        .sort_values("vec_id")["cluster_id"].to_numpy()
    for j in range(3):
        assert len(np.unique(got[labels == j])) == 1


def test_anti_join_empty_right_still_applies_reduce():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.join import bucketed_hash_join

    # left has cross-batch duplicates; right is EMPTY (schema-less plan)
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 1, 2, 3], pa.int64())})) \
        .repartition(3)
    right = rd.from_arrow(pa.table({"k": pa.array([9], pa.int64())})) \
        .map_batches(lambda t: t.filter(pc.equal(t.column("k"), -1)),
                     batch_format="pyarrow")
    out = bucketed_hash_join(left, right, on=["k"], how="anti",
                             reduce=lambda df: df.drop_duplicates())
    got = sorted(r["k"] for r in out.take_all())
    assert got == [1, 2, 3]


def test_bm25_escapes_regex_metacharacters():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.relevance import bm25

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["uses c++ daily", "axb plain"])}))
    # 'c++' must not be a regex repetition; 'a.b' must not match 'axb'
    got = {r["doc_id"]: r["score"] for r in bm25(ds, ["c++", "a.b"]).take_all()}
    assert got[0] > 0.0          # literal 'c++' matched
    assert got[1] == 0.0         # 'a.b' did NOT match 'axb'


def test_kmeans_sample_is_not_a_stride():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.cluster import kmeans_fit

    pts, _ = _blobs(n_per=100)
    n = len(pts)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(pts.tolist(), pa.list_(pa.float32()))}))
    # capture which ids the sampler keeps by running the same mix here
    ids = np.arange(n, dtype=np.uint64)
    h = ids * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(31)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(29)
    kept = np.flatnonzero(h % np.uint64(4) == 0)
    assert len(kept) > 0
    # a pure stride would be exactly {0,4,8,...}; the mixed hash must not be
    assert set(kept.tolist()) != set(range(0, n, 4))
    # and the sampled fit still succeeds
    cents, _ = kmeans_fit(ds, k=3, iters=2, sample_mod=4)
    assert np.isfinite(cents).all()


def test_pq_adc_with_rerank_recovers_exact_topk():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.similarity import (
        brute_force_topk, pq_encode, pq_topk, pq_train,
    )

    rng = np.random.default_rng(9)
    n, d = 2000, 64
    mat = rng.normal(size=(n, d))
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([list(map(float, r)) for r in mat],
                                          pa.list_(pa.float64(), d))})
    ds = ray.data.from_arrow(tbl)
    queries = mat[:3]
    books = pq_train(ds, m=8, ksub=32, sample_size=2000)
    assert books.shape == (8, 32, 8)
    codes = pq_encode(ds, books).materialize()
    excl = {0, 1, 2}
    exact = brute_force_topk(ds, queries, k=10, exclude_ids=excl).to_pandas()
    # raw ADC (no rerank): recall is quantization-limited but nonzero
    adc = pq_topk(codes, books, queries, k=10, exclude_ids=excl).to_pandas()
    # with exact rerank of a 5x shortlist: near-perfect recall
    rr = pq_topk(codes, books, queries, k=10, rerank_ds=ds,
                 rerank_factor=15, exclude_ids=excl).to_pandas()
    recs_adc, recs_rr = [], []
    for q in range(3):
        truth = set(exact[exact["query_idx"] == q]["vec_id"])
        recs_adc.append(len(truth & set(adc[adc["query_idx"] == q]["vec_id"])) / 10)
        recs_rr.append(len(truth & set(rr[rr["query_idx"] == q]["vec_id"])) / 10)
    assert np.mean(recs_rr) >= 0.8, (recs_adc, recs_rr)
    assert np.mean(recs_rr) >= np.mean(recs_adc) - 1e-9
    # reranked sims are EXACT (match brute-force sims on shared ids)
    mr = rr.merge(exact, on=["query_idx", "vec_id"], suffixes=("_pq", "_ex"))
    assert np.allclose(mr["sim_pq"], mr["sim_ex"])


def test_lsh_topk_finds_planted_neighbors():
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    rng = np.random.RandomState(11)
    n, d = 2000, 24
    base = rng.normal(size=(n, d))
    queries = rng.normal(size=(3, d))
    # plant one near-duplicate of each query in the corpus
    for i in range(3):
        base[100 + i] = queries[i] + rng.normal(scale=0.01, size=d)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(base.tolist(), pa.list_(pa.float32()))}))

    got = lsh_topk(ds, queries, k=5, n_bits=10, n_tables=12).to_pandas()
    # a near-identical vector shares every hyperplane side w.h.p. in at
    # least one of 12 tables -> must be retrieved at rank 1
    for i in range(3):
        top = got[(got.query_idx == i) & (got["rank"] == 1)].iloc[0]
        assert top.vec_id == 100 + i
        assert top.sim > 0.99

    # every LSH hit must carry the exact cosine the brute path computes
    brute = brute_force_topk(ds, queries, k=50).to_pandas()
    bmap = {(r.query_idx, r.vec_id): r.sim for r in brute.itertuples()}
    for r in got.itertuples():
        if (r.query_idx, r.vec_id) in bmap:
            assert abs(bmap[(r.query_idx, r.vec_id)] - r.sim) < 1e-9

    # sane recall@5 vs brute on isotropic data with 12 tables
    b5 = brute[brute["rank"] <= 5]
    hits = 0
    for i in range(3):
        want = set(b5[b5.query_idx == i].vec_id)
        have = set(got[got.query_idx == i].vec_id)
        hits += len(want & have)
    assert hits / 15 >= 0.2, hits


def test_kmeans_assign_fast_path_agrees_on_separated_blobs():
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.cluster import (
        kmeans_assign,
    )

    pts, labels = _blobs(n_per=200)
    n = len(pts)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(pts.tolist(), pa.list_(pa.float32()))}))
    cents = np.stack([pts[labels == c].mean(axis=0) for c in range(3)])
    a = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    b = kmeans_assign(ds, cents, exact=False).to_pandas().sort_values("vec_id")
    assert (a.cluster_id.to_numpy() == b.cluster_id.to_numpy()).all()


def test_top_ngrams_bruteforce_parity():
    import re
    from collections import Counter

    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.relevance import (
        top_ngrams,
    )

    texts = [
        "click here to subscribe now",
        "click here to subscribe now",
        "click here to unsubscribe",
        "the quick brown fox and the quick brown dog",
        "Mixed CASE click HERE to Subscribe now!",
        "",
        None,
        "ab",  # fewer tokens than n
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(3)

    brute = Counter()
    for t in texts:
        toks = re.findall(r"[a-z0-9_]+", (t or "").lower())
        for i in range(len(toks) - 1):
            brute[" ".join(toks[i:i + 2])] += 1
    expect = sorted(((c, g) for g, c in brute.items() if c >= 2),
                    key=lambda x: (-x[0], x[1]))[:5]

    got = top_ngrams(ds, n=2, k=5, min_count=2).take_all()
    assert [(r["n_occurrences"], r["gram"]) for r in got] == expect
    # boundary: grams never straddle documents
    assert all(" " in r["gram"] for r in got)


def _aniso_table(n=1500, d=16, seed=11):
    # anisotropic clustered data: strong planted covariance structure
    # where a learned rotation genuinely helps PQ
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    scales = np.geomspace(4.0, 0.1, d)
    centers = rng.normal(size=(6, d)) * 2
    mat = centers[rng.integers(0, 6, n)] + \
        (rng.normal(size=(n, d)) * scales) @ Q
    return pa.table({"vec_id": pa.array(range(n), pa.int64()),
                     "embedding": pa.array(
                         [list(map(float, r)) for r in mat],
                         pa.list_(pa.float64(), d))})


def test_opq_rotation_orthonormal_and_monotone():
    import numpy as np
    import ray.data

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.similarity import (
        opq_train, pq_quantization_mse, pq_train,
    )

    ds = ray.data.from_arrow(_aniso_table())
    books_pq = pq_train(ds, m=4, ksub=16, sample_size=1500)
    R, books_opq = opq_train(ds, m=4, ksub=16, sample_size=1500,
                             opq_iters=6)
    # R orthonormal to fp precision
    assert np.abs(R.T @ R - np.eye(len(R))).max() < 1e-10
    mse_pq = pq_quantization_mse(ds, books_pq)
    mse_opq = pq_quantization_mse(ds, books_opq, R=R)
    # warm-start alternation starts AT plain PQ (same seeded RNG), so
    # the final error can only be <=; on this anisotropic corpus the
    # improvement is substantial
    assert mse_opq <= mse_pq + 1e-12, (mse_opq, mse_pq)
    assert mse_opq < 0.9 * mse_pq, (mse_opq, mse_pq)


def test_opq_end_to_end_search_exact_rerank():
    import numpy as np
    import ray.data

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.similarity import (
        brute_force_topk, opq_train, pq_encode, pq_topk, rotate_embeddings,
    )

    tbl = _aniso_table()
    ds = ray.data.from_arrow(tbl)
    mat = np.asarray(tbl.column("embedding").to_pylist())
    queries = mat[:2]
    R, books = opq_train(ds, m=4, ksub=16, sample_size=1500, opq_iters=4)
    rot = rotate_embeddings(ds, R)
    codes = pq_encode(rot, books).materialize()
    excl = {0, 1}
    # rotated-space ADC shortlist + exact rerank on the ROTATED
    # vectors (rotation preserves cosine, so sims must match brute
    # force over the ORIGINAL vectors on shared ids)
    rr = pq_topk(codes, books, queries @ R, k=5, rerank_ds=rot,
                 rerank_factor=10, exclude_ids=excl).to_pandas()
    exact = brute_force_topk(ds, queries, k=5, exclude_ids=excl).to_pandas()
    mr = rr.merge(exact, on=["query_idx", "vec_id"],
                  suffixes=("_opq", "_ex"))
    assert len(mr) >= 8  # high overlap with truth
    assert np.allclose(mr["sim_opq"], mr["sim_ex"])


def test_pq_train_unchanged_by_refactor():
    # _lloyd extraction must preserve the exact RNG sequence: books for
    # the standard corpus shape stay deterministic run-to-run
    import numpy as np
    import ray.data

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.similarity import (
        pq_train,
    )

    ds = ray.data.from_arrow(_aniso_table())
    b1 = pq_train(ds, m=4, ksub=16, sample_size=1500)
    b2 = pq_train(ds, m=4, ksub=16, sample_size=1500)
    assert np.array_equal(b1, b2)
