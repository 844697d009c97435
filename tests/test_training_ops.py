"""Training-data ops: deterministic shuffle, token-budget mixture,
hashed linear classifier, incremental-corpus dedup."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.stages.classifier import (
    HashedLinearScorer,
    classify_docs,
    deterministic_weights,
)
from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import (
    dedup_against,
)
from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
    budget_sample,
    deterministic_shuffle,
)


def _docs(texts, start_id=0):
    return pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})


def test_deterministic_shuffle_is_seeded_permutation():
    tbl = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    a = deterministic_shuffle(ray.data.from_arrow(tbl), "doc_id",
                              seed=1).to_pandas()
    b = deterministic_shuffle(ray.data.from_arrow(tbl), "doc_id",
                              seed=1).to_pandas()
    c = deterministic_shuffle(ray.data.from_arrow(tbl), "doc_id",
                              seed=2).to_pandas()
    # a permutation of the input, stable across runs, seed-dependent
    assert sorted(a["doc_id"]) == list(range(100))
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["doc_id"]) != list(c["doc_id"])
    # output is genuinely sorted by the emitted rank
    assert list(a["shuffle_key"]) == sorted(a["shuffle_key"])
    # rank replays the documented md5 formula
    i = int(a["doc_id"][0])
    exp = int.from_bytes(hashlib.md5(f"{i}:1".encode()).digest()[8:16],
                         "little") % (1 << 62)
    assert int(a["shuffle_key"][0]) == exp


def test_budget_sample_caps_tokens_per_source():
    n = 60
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["a" if i % 2 else "b" for i in range(n)]),
        "tokens": pa.array([10] * n, pa.int64())})
    out = budget_sample(ray.data.from_arrow(tbl), budgets={"a": 95},
                        token_col="tokens", seed=3).to_pandas()
    got_a = out[out["source"] == "a"]
    # 95-token budget over 10-token docs keeps exactly 9 'a' docs;
    # uncapped 'b' keeps all 30
    assert len(got_a) == 9
    assert len(out[out["source"] == "b"]) == 30
    # the kept 'a' docs are the 9 lowest-md5(key:3) ones
    def rank(i):
        return int.from_bytes(hashlib.md5(f"{i}:3".encode()).digest()[8:16],
                              "little") % (1 << 62)
    a_ids = [i for i in range(n) if i % 2]
    want = sorted(a_ids, key=rank)[:9]
    assert sorted(got_a["doc_id"]) == sorted(want)
    # default_budget applies to unlisted sources when set
    out2 = budget_sample(ray.data.from_arrow(tbl), budgets={"a": 95},
                         token_col="tokens", seed=3,
                         default_budget=45).to_pandas()
    assert len(out2[out2["source"] == "b"]) == 4


def test_hashed_linear_scorer_matches_bruteforce():
    texts = ["the quick brown fox", "fox fox fox", "", None,
             "punct, only!!", "naïve café tokens"]
    tbl = _docs(texts)
    out = classify_docs(ray.data.from_arrow(tbl), n_buckets=64) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    w = deterministic_weights(64)
    import re

    for i, text in enumerate(texts):
        # RE2 \w is ASCII-only (pyarrow AND the DuckDB oracle agree);
        # Python re defaults to unicode word chars, so pin ASCII here
        toks = re.findall(r"\w+", (text or "").lower(), flags=re.ASCII)
        exp = sum(int(w[int.from_bytes(
            hashlib.md5(t.encode()).digest()[8:16], "little") % 64])
            for t in toks)
        assert int(out["clf_score"][i]) == exp, (i, text)
        assert bool(out["keep"][i]) == (exp > 0)
    # repeated tokens weigh once per occurrence (doc 1 = 3x doc's token)
    single = out["clf_score"][1]
    one = HashedLinearScorer(deterministic_weights(64))(
        _docs(["fox"]))["clf_score"][0].as_py()
    assert single == 3 * one


def test_dedup_against_drops_seen_content():
    ref = _docs(["alpha doc", "beta doc", "gamma doc"])
    new = _docs(["beta doc", "delta doc", "alpha doc", "epsilon doc"],
                start_id=100)
    out = dedup_against(ray.data.from_arrow(new), ray.data.from_arrow(ref)) \
        .to_pandas()
    assert sorted(out["doc_id"].astype(np.int64)) == [101, 103]
    assert sorted(out["text"]) == ["delta doc", "epsilon doc"]
    # duplicates WITHIN the new corpus survive (documented contract)
    new2 = _docs(["delta doc", "delta doc"], start_id=200)
    out2 = dedup_against(ray.data.from_arrow(new2),
                         ray.data.from_arrow(ref)).to_pandas()
    assert len(out2) == 2


def test_budget_sample_histogram_equals_shuffle_strategy():
    rng = np.random.default_rng(11)
    n = 500
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % 7}" for i in range(n)]),
        "tokens": pa.array(rng.integers(1, 50, n), pa.int64())})
    kw = dict(budgets={"s0": 300, "s1": 5, "s2": 0}, token_col="tokens",
              seed=5, default_budget=400)
    a = budget_sample(ray.data.from_arrow(tbl), **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = budget_sample(ray.data.from_arrow(tbl), strategy="shuffle",
                      **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "source", "tokens"]].equals(
        b[["doc_id", "source", "tokens"]])
    # budget 0 drops the whole source; tiny budget keeps <= 1 doc
    assert (a["source"] != "s2").all()
    assert len(a[a["source"] == "s1"]) <= 1


def test_funnel_strict_order_and_reached():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        funnel,
    )

    # u1 completes all 3 in order; u2 clicks BEFORE signup (stage 1 only);
    # u3 has no signup (stage 0); u4 purchase ties click ts (strict > drops)
    rows = [
        (1, "signup", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "click", 50), (2, "signup", 60), (2, "purchase", 40),
        (3, "view", 10),
        (4, "signup", 10), (4, "click", 20), (4, "purchase", 20),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.int64())})
    out = funnel(ray.data.from_arrow(tbl),
                 stages=[("signup", "signup"), ("click", "click"),
                         ("purchase", "purchase")]).to_pandas() \
        .set_index("user_id").sort_index()
    assert out.loc[1, "reached"] == 3
    assert out.loc[2, "reached"] == 1   # click at 50 < signup at 60
    assert out.loc[3, "reached"] == 0
    assert out.loc[4, "reached"] == 2   # purchase not strictly after click
    assert out.loc[1, "ts_purchase"] == 300


def test_retention_cohorts_hand_computed():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        retention_cohorts,
    )

    # period = 10us; u1 first at p0, active p0+p2; u2 first at p2, active p2
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([5, 7, 25, 21], pa.int64())})
    out = retention_cohorts(ray.data.from_arrow(tbl), period_us=10) \
        .to_pandas().sort_values(["cohort_period", "period_offset"]) \
        .reset_index(drop=True)
    got = list(map(tuple, out[["cohort_period", "period_offset",
                               "n_users"]].to_numpy()))
    assert got == [(0, 0, 1), (0, 2, 1), (2, 0, 1)]


def test_budget_sample_null_sources_both_strategies():
    tbl = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "source": pa.array(["a", None, "b"] * 4),
        "tokens": pa.array([10] * 12, pa.int64())})
    # default_budget caps the NULL-source group like any other
    kw = dict(budgets={"a": 25}, token_col="tokens", seed=1,
              default_budget=15)
    a = budget_sample(ray.data.from_arrow(tbl), **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = budget_sample(ray.data.from_arrow(tbl), strategy="shuffle",
                      **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "tokens"]].equals(b[["doc_id", "tokens"]])
    assert len(a[a["source"] == "a"]) == 2       # 25 // 10
    assert len(a[a["source"].isna()]) == 1       # 15 // 10
    assert len(a[a["source"] == "b"]) == 1
    # without default_budget the null group is uncapped on both paths
    kw2 = dict(budgets={"a": 25}, token_col="tokens", seed=1)
    a2 = budget_sample(ray.data.from_arrow(tbl), **kw2).to_pandas()
    b2 = budget_sample(ray.data.from_arrow(tbl), strategy="shuffle",
                       **kw2).to_pandas()
    assert len(a2[a2["source"].isna()]) == 4
    assert len(a2) == len(b2)


def test_shuffle_null_key_matches_duckdb_concat():
    import duckdb

    tbl = pa.table({"k": pa.array(["x", None, "y"], pa.string())})
    out = deterministic_shuffle(ray.data.from_arrow(tbl), "k",
                                seed=7).to_pandas()
    null_key = int(out[out["k"].isna()]["shuffle_key"].iloc[0])
    exp = duckdb.sql(
        "SELECT CAST(md5_number_lower(concat(CAST(NULL AS VARCHAR), ':7'))"
        " % 4611686018427387904 AS BIGINT)").fetchone()[0]
    assert null_key == int(exp)


def test_time_window_null_ts_yields_null_frame():
    import pandas as pd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.window import (
        WindowSpec, grouped_window,
    )

    tbl = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([1_000_000, None, 2_000_000, 5_000_000],
                       pa.timestamp("us")),
        "v": pa.array([10, 20, 30, 40], pa.int64()),
        "rid": pa.array(range(4), pa.int64())})
    out = grouped_window(ray.data.from_arrow(tbl), ["k"], ["ts", "rid"],
                         [WindowSpec("time_sum", col="v",
                                     range_us=2_000_000, out="tsum")]) \
        .to_pandas().sort_values("rid").reset_index(drop=True)
    assert pd.isna(out.loc[1, "tsum"])           # null ts -> null frame
    assert out.loc[0, "tsum"] == 10
    assert out.loc[2, "tsum"] == 40              # 10 + 30 within 2s
    assert out.loc[3, "tsum"] == 40


def test_text_normalizer_preserves_u2028_edge():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
        TextNormalizer,
    )

    tbl = pa.table({"text": pa.array(["hi ", "  x  "])})
    got = TextNormalizer(out_col="t")(tbl).column("t").to_pylist()
    # U+2028 is not RE2 \s and DuckDB trim() keeps it — so must we
    assert got[0] == "hi "
    assert got[1] == "x"


def test_approx_distinct_grouped_within_error():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
        approx_distinct_grouped,
    )

    rng = np.random.default_rng(3)
    n = 20000
    tbl = pa.table({
        "g": pa.array(rng.integers(0, 3, n).astype(np.int64)),
        "u": pa.array(rng.integers(0, 2000, n).astype(np.int64))})
    out = approx_distinct_grouped(ray.data.from_arrow(tbl), ["g"], "u") \
        .to_pandas().set_index("g")["approx_distinct"]
    import pandas as pd

    exact = pa.table(tbl).to_pandas().groupby("g")["u"].nunique()
    for g in exact.index:
        err = abs(out.loc[g] - exact.loc[g]) / exact.loc[g]
        assert err < 0.08, (g, out.loc[g], exact.loc[g])


def test_tfidf_keywords_bruteforce_parity():
    import math
    import re
    from collections import Counter

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.relevance import (
        tfidf_keywords,
    )

    texts = ["apple banana apple cherry", "banana cherry cherry date",
             "apple apple apple", "unique words only here", ""]
    tbl = _docs(texts)
    out = tfidf_keywords(lambda: ray.data.from_arrow(tbl), k=2) \
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    # brute force
    docs = [re.findall(r"\w+", (t or "").lower(), flags=re.ASCII)
            for t in texts]
    df = Counter()
    for d in docs:
        df.update(set(d))
    N = len(texts)
    for i, d in enumerate(docs):
        tf = Counter(d)
        scored = sorted(((tf[w] * math.log(N / df[w]), w) for w in tf),
                        key=lambda x: (-x[0], x[1]))[:2]
        got = out[out["doc_id"] == i]
        assert len(got) == len(scored)
        for (s, w), (_, row) in zip(scored, got.iterrows()):
            assert row["token"] == w and abs(row["score"] - s) < 1e-12


def test_weighted_sample_proportional_and_deterministic():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        weighted_sample,
    )

    n = 4000
    # half the rows carry 10x the weight -> they should dominate winners
    w = np.where(np.arange(n) < n // 2, 100, 10).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "w": pa.array(w)})
    out = weighted_sample(ray.data.from_arrow(tbl), n=200, weight_col="w",
                          seed=2).to_pandas()
    assert len(out) == 200
    heavy = (out["doc_id"] < n // 2).mean()
    assert heavy > 0.75  # 10x weight ~ 10x inclusion odds
    out2 = weighted_sample(ray.data.from_arrow(tbl), n=200, weight_col="w",
                           seed=2).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # zero/negative weights never win
    tbl2 = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                     "w": pa.array([0] * 5 + [1] * 5, pa.int64())})
    out3 = weighted_sample(ray.data.from_arrow(tbl2), n=10, weight_col="w",
                           seed=1).to_pandas()
    assert sorted(out3["doc_id"]) == [5, 6, 7, 8, 9]


def test_grouped_hll_null_semantics_and_int_keys():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
        approx_distinct_grouped,
    )

    t = pa.table({"g": pa.array([1, 1, None, 2, 2, 2], pa.int64()),
                  "u": pa.array([1, None, 5, 7, 7, 8], pa.int64())})
    out = approx_distinct_grouped(ray.data.from_arrow(t), ["g"], "u") \
        .to_pandas()
    by_g = {(None if __import__("pandas").isna(r.g) else int(r.g)):
            int(r.approx_distinct) for r in out.itertuples()}
    # null u excluded (SQL count(DISTINCT)); null g is its own group
    assert by_g == {1: 1, 2: 2, None: 1}


def test_pq_train_sample_smaller_than_ksub():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.similarity import (
        pq_train,
    )

    tiny = pa.table({
        "vec_id": pa.array(range(12), pa.int64()),
        "embedding": pa.array([[float(i + j) for j in range(8)]
                               for i in range(12)], pa.list_(pa.float64(), 8))})
    books = pq_train(ray.data.from_arrow(tiny), m=2, ksub=64, sample_size=12)
    assert books.shape == (2, 12, 4)


def test_ordered_prefix_sum_matches_cumsum():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        ordered_prefix_sum,
    )

    rng = np.random.default_rng(6)
    n = 500
    ids = rng.permutation(n).astype(np.int64)      # arbitrary row order
    tok = rng.integers(1, 100, n).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "tok": pa.array(tok)})
    out = ordered_prefix_sum(ray.data.from_arrow(tbl).repartition(7),
                             "doc_id", "tok", out_col="off",
                             n_buckets=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    by_id = tok[np.argsort(ids)]
    exp = np.concatenate([[0], np.cumsum(by_id)[:-1]])
    assert np.array_equal(out["off"].to_numpy(), exp)
    # offsets are a valid exclusive scan: strictly increasing, start 0
    assert out["off"].iloc[0] == 0
    assert (np.diff(out["off"]) == by_id[:-1]).all()


def test_tfidf_keywords_min_df_and_top_v_cap():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.relevance import (
        tfidf_keywords,
    )

    texts = ["apple banana apple cherry", "banana cherry cherry date",
             "apple apple apple", "unique words only here", ""]
    tbl = _docs(texts)
    full = tfidf_keywords(lambda: ray.data.from_arrow(tbl), k=10) \
        .to_pandas()
    # min_df=2 must drop exactly the df==1 tokens, keep everything else
    pruned = tfidf_keywords(lambda: ray.data.from_arrow(tbl), k=10,
                            min_df=2).to_pandas()
    singletons = {"date", "unique", "words", "only", "here"}
    assert set(full.token) - set(pruned.token) == singletons
    kept = full[~full.token.isin(singletons)]
    m = pruned.sort_values(["doc_id", "token"]).reset_index(drop=True)
    km = kept.sort_values(["doc_id", "token"]).reset_index(drop=True)
    # scores of surviving tokens are unchanged; ranks recompute densely
    assert (m.token == km.token).all() and (m.score == km.score).all()
    # top_v keeps only the V highest-df tokens (ties break token-asc):
    # dfs: apple 2, banana 2, cherry 2, rest 1 -> top_v=2 keeps apple,banana
    capped = tfidf_keywords(lambda: ray.data.from_arrow(tbl), k=10,
                            top_v=2).to_pandas()
    assert set(capped.token) == {"apple", "banana"}


def test_minhash_dedup_against_drops_fuzzy_copies():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import (
        minhash_dedup_against,
        minhash_pairs_against,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on the quiet green meadow near the old farm "
            "house where children play games every single summer day %d")
    ref_texts = [base % i for i in range(12)]
    # near-copies of refs 0-3 (one word swapped), plus 6 unrelated docs
    new_texts = [t.replace("softly", "gently") for t in ref_texts[:4]] + [
        f"completely unrelated database vector query engine text {i} "
        f"columnar storage arrow batches shuffle partitions" +
        " filler" * i for i in range(6)]
    ref = ray.data.from_arrow(_docs(ref_texts))
    new = ray.data.from_arrow(_docs(new_texts, start_id=100))

    pairs = minhash_pairs_against(new, ref, threshold=0.5).to_pandas()
    flagged = set(pairs["new_id"].astype(np.int64))
    # every planted near-copy is flagged; est column bounded in [0, 1]
    assert {100, 101, 102, 103} <= flagged
    assert ((pairs["est_jaccard"] >= 0.5) & (pairs["est_jaccard"] <= 1)).all()
    # pairs point new -> ref, never ref ids on the new side
    assert (pairs["new_id"] >= 100).all()
    assert (pairs["ref_id"] < 100).all()

    kept = minhash_dedup_against(new, ref, threshold=0.5).to_pandas()
    kept_ids = set(kept["doc_id"].astype(np.int64))
    # unrelated docs survive, planted copies are gone
    assert kept_ids & {100, 101, 102, 103} == set()
    assert {104, 105, 106, 107, 108, 109} <= kept_ids
    # survivors = new - flagged (exact set identity)
    assert kept_ids == set(range(100, 110)) - flagged
