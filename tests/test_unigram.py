"""Unigram-LM tokenizer tests (stages/unigram.py)."""

import math

import numpy as np
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.unigram import (
    UnigramEncoder,
    unigram_train,
    viterbi_encode,
)


def _wt(pairs):
    return pa.table({"word": pa.array([w for w, _ in pairs], pa.string()),
                     "n": pa.array([n for _, n in pairs], pa.int64())})


def test_unigram_em_ll_monotone_and_prune():
    wt = _wt([("abab", 50), ("ababab", 30), ("cd", 20), ("abcd", 10)])
    logp, segs = unigram_train(wt, vocab_size=6, seed_size=64,
                               max_piece_len=3, em_iters=4)
    for seg in segs:
        for a, b in zip(seg, seg[1:]):
            assert b >= a - 1e-9 * abs(a)
    n_chars = sum(1 for s in logp if len(s) == 1)
    assert len(logp) <= max(6, n_chars)
    # chars always survive pruning
    assert {"a", "b", "c", "d"} <= set(logp)
    # the dominant repeated bigram must be a retained piece
    assert "ab" in logp
    # and EM must prefer it to char-by-char: p(ab) > p(a)p(b)
    assert logp["ab"] > logp["a"] + logp["b"]


def test_viterbi_encode_lossless_and_deterministic():
    wt = _wt([("abab", 50), ("cd", 20)])
    logp, _ = unigram_train(wt, vocab_size=8, seed_size=64,
                            max_piece_len=3, em_iters=2)
    for w in ("abab", "cd", "abcd", "dcba", "a"):
        pieces = viterbi_encode(w, logp, 3)
        assert "".join(pieces) == w
    assert viterbi_encode("abab", logp, 3) == ["ab", "ab"]


def test_unigram_encoder_stage_counts_and_detok():
    import ray
    import ray.data as rd

    wt = _wt([("hello", 5), ("world", 5)])
    logp, _ = unigram_train(wt, vocab_size=30, seed_size=64,
                            max_piece_len=4, em_iters=2)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["hello world", "Hello HELLO"], pa.string()),
    }))
    out = ds.map_batches(UnigramEncoder,
                         fn_constructor_args=(ray.put(logp), 4),
                         batch_format="pyarrow",
                         concurrency=1).to_pandas().sort_values("doc_id")
    assert out["detok_ok"].all()
    # lowercased encode: both rows tokenize two known words
    assert (out["n_pieces"] > 0).all()
    total_w1 = len(viterbi_encode("hello", logp, 4)) \
        + len(viterbi_encode("world", logp, 4))
    assert out.iloc[0]["n_pieces"] == total_w1
