"""BPE trainer/encoder: Sennrich example, brute-force parity, roundtrip."""
import collections

import numpy as np
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.bpe import (
    BpeEncoder, bpe_encode_word, bpe_train, bpe_tokenize, word_frequencies)

_EOW = "</w>"


def _wt(d):
    return pa.table({"word": pa.array(sorted(d)),
                     "n": pa.array([d[w] for w in sorted(d)], pa.int64())})


def _ref_train(freqs: dict, n_merges: int):
    """Independent reference: recompute ALL pair counts from scratch
    every iteration (the O(n*m) textbook form)."""
    words = {tuple(list(w) + [_EOW]): c for w, c in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pc_ = collections.Counter()
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pc_[p] += c
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc_[best] <= 0:
            break
        merges.append(best)
        new = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        words = new
    return merges


def test_sennrich_example_first_merges():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(_wt(freqs), 4)
    # 'es' appears in newest+widest = 9, then 'est', then 'est</w>'
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", _EOW)
    assert merges == _ref_train(freqs, 4)


def test_train_matches_bruteforce_on_random_corpus():
    rng = np.random.default_rng(7)
    vocab = ["ab", "abc", "banana", "bandana", "cab", "dab", "abba",
             "cacao", "coco", "dodo"]
    freqs = {w: int(rng.integers(1, 20)) for w in vocab}
    assert bpe_train(_wt(freqs), 25) == _ref_train(freqs, 25)


def test_encode_roundtrip_and_rank_greediness():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(_wt(freqs), 10)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in list(freqs) + ["lowest", "wide", "news", "xyzzy"]:
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks) == w + _EOW  # lossless
    # a fully-learned training word collapses to few symbols
    assert len(bpe_encode_word("newest", ranks)) <= 2


def test_word_frequencies_distributed_equals_counter():
    import ray.data as rd

    texts = ["the cat sat", "the cat", "a dog", "", "THE the"]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(3)
    wt = word_frequencies(ds, min_count=1)
    got = dict(zip(wt.column("word").to_pylist(),
                   wt.column("n").to_pylist()))
    exp = collections.Counter(
        w for t in texts for w in t.lower().split())
    assert got == dict(exp)


def test_bpe_tokenize_end_to_end_counts():
    import ray.data as rd

    texts = ["low lower", "newest widest newest", "low"]
    mk = lambda: rd.from_arrow(  # noqa: E731
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(texts)})).repartition(2)
    out, merges = bpe_tokenize(mk, n_merges=8, min_count=1,
                               emit_tokens=True)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for i, t in enumerate(texts):
        toks = [tok for w in t.lower().split()
                for tok in bpe_encode_word(w, ranks)]
        assert df.loc[i, "n_bpe_tokens"] == len(toks)
        assert list(df.loc[i, "bpe_tokens"]) == toks
