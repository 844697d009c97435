"""Declarative steps for the round-2 session-3 ops (window/skew_join/bpe)."""
import numpy as np
import pandas as pd
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
    build_pipeline)


def _mk(df, parts=3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


def test_window_step():
    df = pd.DataFrame({"k": [0, 0, 0, 1, 1], "o": [1, 2, 3, 1, 2],
                       "v": [10, 20, 30, 5, 7]})
    out = build_pipeline(_mk(df), [
        {"type": "window", "keys": ["k"], "order_by": ["o"],
         "specs": [{"kind": "row_number", "out": "rn"},
                   {"kind": "lag", "col": "v", "out": "pv"}]},
    ]).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    assert out["rn"].tolist() == [1, 2, 3, 1, 2]
    assert out["pv"].fillna(-1).tolist() == [-1, 10, 20, -1, 5]


def test_skew_join_step():
    left = pd.DataFrame({"k": [7] * 50 + [1, 2], "lv": range(52)})
    right = pd.DataFrame({"k": [7, 1, 3], "rv": [70, 10, 30]})
    out = build_pipeline(_mk(left), [
        {"type": "skew_join", "right": _mk(right, 2), "on": ["k"],
         "hot_keys": [7], "n_salt": 4},
    ]).to_pandas()
    assert len(out) == 51  # 50 hot + k=1; k=2 unmatched
    assert (out.loc[out["k"] == 7, "rv"] == 70).all()


def test_bpe_count_step():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.bpe import (
        bpe_train, word_frequencies)

    df = pd.DataFrame({"text": ["low lower", "newest widest"]})
    wt = word_frequencies(_mk(df, 1))
    merges = bpe_train(wt, 6)
    out = build_pipeline(_mk(df, 1), [
        {"type": "bpe_count", "merges": [list(m) for m in merges]},
    ]).to_pandas()
    assert (out["n_bpe_tokens"] > 0).all()


def test_shuffle_and_budget_sample_steps():
    df = pd.DataFrame({"doc_id": range(20),
                       "source": ["a"] * 10 + ["b"] * 10,
                       "tokens": [5] * 20})
    out = build_pipeline(_mk(df), [
        {"type": "shuffle", "key_col": "doc_id", "seed": 4},
    ]).to_pandas()
    assert sorted(out["doc_id"]) == list(range(20))
    assert out["shuffle_key"].is_monotonic_increasing
    out2 = build_pipeline(_mk(df), [
        {"type": "budget_sample", "budgets": {"a": 22}, "token_col": "tokens",
         "seed": 4},
    ]).to_pandas()
    assert len(out2[out2["source"] == "a"]) == 4  # floor(22/5)
    assert len(out2[out2["source"] == "b"]) == 10


def test_classifier_and_dedup_against_steps():
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["alpha beta", "alpha beta"]})
    out = build_pipeline(_mk(df), [
        {"type": "classifier", "n_buckets": 64},
    ]).to_pandas()
    assert out["clf_score"].nunique() == 1  # identical texts, same score
    ref = pd.DataFrame({"doc_id": [9], "text": ["alpha beta"]})
    out2 = build_pipeline(_mk(df), [
        {"type": "dedup_against", "ref": _mk(ref, 1)},
    ]).to_pandas()
    assert len(out2) == 0


def test_normalize_chunk_funnel_retention_steps():
    df = pd.DataFrame({"doc_id": [0], "text": ["  Hello   WORLD  "]})
    out = build_pipeline(_mk(df, 1), [
        {"type": "normalize_text"},
        {"type": "chunk", "chunk_size": 5, "overlap": 0},
    ]).to_pandas()
    assert out["chunk_text"].tolist() == ["hello", " worl", "d"]
    ev = pd.DataFrame({"user_id": [1, 1, 2], "event_type": ["a", "b", "a"],
                       "ts": [10, 20, 30]})
    f = build_pipeline(_mk(ev, 1), [
        {"type": "funnel", "stages": [["a", "a"], ["b", "b"]]},
    ]).to_pandas().set_index("user_id")
    assert f.loc[1, "reached"] == 2 and f.loc[2, "reached"] == 1
    r = build_pipeline(_mk(ev, 1), [
        {"type": "retention", "period_us": 10},
    ]).to_pandas()
    assert r["n_users"].sum() == 3  # u1 in periods 1+2, u2 in period 3


def test_gopher_filter_step():
    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["the quick brown fox jumps over that lazy dog today.",
                 "tiny the be"]})
    out = build_pipeline(_mk(df, 1), [
        {"type": "gopher_filter", "min_words": 5, "min_stop_hits": 2},
    ]).to_pandas().sort_values("doc_id")
    assert out["keep"].tolist() == [True, False]
    dropped = build_pipeline(_mk(df, 1), [
        {"type": "gopher_filter", "min_words": 5, "min_stop_hits": 2,
         "mode": "drop"},
    ]).to_pandas()
    assert len(dropped) == 1 and dropped["doc_id"].iloc[0] == 0


def test_fuzzy_dedup_against_step():
    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on the quiet green meadow near the farm %d")
    ref = pd.DataFrame({"doc_id": [0, 1], "text": [base % 0, base % 1]})
    new = pd.DataFrame({"doc_id": [100, 101],
                        "text": [(base % 0).replace("softly", "gently"),
                                 "totally different text about arrow "
                                 "columnar batches and ray datasets"]})
    out = build_pipeline(_mk(new, 1), [
        {"type": "fuzzy_dedup_against", "ref": _mk(ref, 1),
         "threshold": 0.5},
    ]).to_pandas()
    assert out["doc_id"].tolist() == [101]


def test_fuzzy_match_step():
    base = "shared sixteen!! tail goes here with plenty of words"
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [base, base + " x", "other prefix doc"]})
    out = build_pipeline(_mk(df, 1), [
        {"type": "fuzzy_match", "max_dist": 3},
    ]).to_pandas()
    assert list(zip(out["id_a"], out["id_b"], out["dist"])) == [(1, 2, 2)]


def test_linear_stats_step():
    df = pd.DataFrame({"k": ["a"] * 3, "x": [1, 2, 3], "y": [2, 4, 6]})
    out = build_pipeline(_mk(df, 1), [
        {"type": "linear_stats", "keys": ["k"], "x": "x", "y": "y"},
    ]).to_pandas()
    assert out["slope"].iloc[0] == 2.0 and out["n"].iloc[0] == 3
