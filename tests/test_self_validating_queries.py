"""Invariant floors for the rows-only self-validating queries (VERDICT
r3 item 5): the driver records these rows; pytest pins what they must
say at sf0.001."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _q(name):
    import __ray_entry__ as e

    got = e.queries()[name](SF)
    return got.to_pandas() if hasattr(got, "to_pandas") else pd.DataFrame(got)


def test_knn_invariants(ray_session):
    for name, min_hits in [("knn_ivf", 1), ("knn_pq", 2)]:
        df = _q(name)
        assert (df.k_returned == 5).all(), name
        # the recompute MUST agree below 1e-12 (true-cosine scoring)
        assert (df.max_sim_diff_e12 == 0).all(), name
        assert (df.brute_hits >= min_hits).all(), (name, df.brute_hits.tolist())
    # single-probe LSH recall floor is aggregate, not per-query
    df = _q("knn_lsh")
    assert (df.max_sim_diff_e12 == 0).all()
    assert df.brute_hits.sum() >= 2


def test_neardup_planted_summaries(ray_session):
    mh = _q("minhash_neardup")
    assert int(mh.planted_pairs[0]) == 100
    assert int(mh.found_planted[0]) >= 10   # boundary-straddling corpus
    sh = _q("simhash_neardup")
    assert int(sh.found_planted[0]) >= 30
    em = _q("embedding_neardup")
    assert int(em.found_planted[0]) >= 60
    assert int(em.extra_pairs[0]) == 0      # 0.98 cosine: no false pairs


def test_bloom_never_under_flags(ray_session):
    row = _q("doc_decontaminate_bloom").iloc[0]
    assert row.bloom_missed == 0            # Bloom has no false negatives
    assert row.bloom_flagged >= row.exact_flagged
    assert row.exact_flagged > 0            # planted overlap must exist


def test_bpe_detok_lossless(ray_session):
    df = _q("doc_bpe_tokens")
    assert len(df) > 0 and bool(df.detok_ok.all())


def test_fingerprint_copy_determinism(ray_session):
    df = _q("doc_fingerprint")
    m = df.copy_fp_match.dropna()
    assert len(m) == 50 and bool(m.all())


def test_multimodal_structural_invariants(ray_session):
    img = _q("image_dedup").iloc[0]
    assert img.recovered_pairs == img.planted_pairs == 30
    au = _q("audio_pipeline")
    assert bool(au.chunks_ok.all()) and bool(au.rms_in_range.all())
    mm = _q("multimodal_pipeline")
    assert bool(mm.frames_ok.all()) and (mm.n_frames == 4).all()


def test_approx_distinct_error_bound(ray_session):
    df = _q("approx_distinct_users")
    assert (df.err_ppm < 80_000).all(), df.to_dict("records")


def test_tpch_q17_join_fallback_equals_broadcast(sf_dir):
    """Past max_broadcast_parts the correlated predicate moves into a
    co-partitioned join; both paths must produce the identical row."""
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_tpch_q17,
    )

    a = q_tpch_q17(sf_dir)
    b = q_tpch_q17(sf_dir, max_broadcast_parts=0)
    assert a.equals(b)
