"""Quantized n-gram LM scoring (stages/lmscore.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.stages.lmscore import (
    NgramScorer,
    _bits,
    build_ngram_model,
    lm_familiarity,
)


def _tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_bits_exact_at_power_boundaries():
    c = np.array([0, 1, 2, 3, 7, 8, 15, 2**40 - 1, 2**40], dtype=np.int64)
    assert list(_bits(c)) == [0, 1, 1, 2, 3, 3, 4, 40, 40]


def test_hand_computed_bigram_scores():
    tbl = _tbl(["a b a b", "a b c"])
    out = lm_familiarity(lambda: ray.data.from_arrow(tbl)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # corpus bigram counts: "a b" x3, "b a" x1, "b c" x1; min_count=2
    # keeps only "a b" at floor(log2(4)) = 2 bits
    assert list(out["n_ngrams"]) == [3, 2]
    assert list(out["lm_score"]) == [4, 2]


def test_min_count_one_scores_every_gram():
    tbl = _tbl(["a b a b", "a b c"])
    out = lm_familiarity(lambda: ray.data.from_arrow(tbl), min_count=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # "a b": floor(log2(4))=2, "b a"/"b c": floor(log2(2))=1
    assert list(out["lm_score"]) == [2 + 1 + 2, 2 + 1]


def test_empty_and_null_docs_score_zero():
    tbl = _tbl(["x y x y", None, "", "solo"])
    out = lm_familiarity(lambda: ray.data.from_arrow(tbl)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_ngrams"]) == [3, 0, 0, 0]
    assert list(out["lm_score"])[1:] == [0, 0, 0]


def test_top_v_cap_keeps_most_frequent():
    tbl = _tbl(["a b a b a b", "c d c d", "a b c d"])
    # counts: "a b" x4, "b a" x2, "c d" x3, "d c" x1, "b c" x1
    ref, vocab = build_ngram_model(ray.data.from_arrow(tbl), min_count=1,
                                   top_v=2)
    assert vocab == 2
    out = ray.data.from_arrow(_tbl(["a b", "b a", "c d"])).map_batches(
        NgramScorer, fn_constructor_kwargs=dict(model_ref=ref),
        batch_format="pyarrow",
        concurrency=1).to_pandas().sort_values("doc_id")
    # only "a b" (floor log2 5 = 2) and "c d" (floor log2 4 = 2) survive
    assert list(out["lm_score"]) == [2, 0, 2]


def test_dsir_select_prefers_target_like_docs():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.lmscore import (
        dsir_select,
    )

    # target distribution speaks "alpha beta gamma"; the raw corpus is
    # mostly "noise noise noise" with a few target-like docs planted
    target_texts = ["alpha beta gamma alpha beta", "beta gamma alpha beta"] * 3
    raw_texts = (["noise words filler noise words"] * 10
                 + ["alpha beta gamma beta gamma"] * 3)
    target = pa.table({"doc_id": pa.array(range(len(target_texts)), pa.int64()),
                       "text": pa.array(target_texts, pa.string())})
    raw = _tbl(raw_texts)
    out = dsir_select(lambda: ray.data.from_arrow(raw),
                      lambda: ray.data.from_arrow(target),
                      k=3, n=2, min_count=2).to_pandas()
    # exactly the 3 planted target-like docs (ids 10..12) win
    assert sorted(out["doc_id"]) == [10, 11, 12]
    assert (out["importance"] ==
            out["target_score"] - out["raw_score"]).all()
    # deterministic: same call again yields identical rows
    out2 = dsir_select(lambda: ray.data.from_arrow(raw),
                       lambda: ray.data.from_arrow(target),
                       k=3, n=2, min_count=2).to_pandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True))
