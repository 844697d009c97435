"""C4-style line filters, document gates, line dedup (stages/textfilters.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
    C4DocFilter,
    LineFilter,
    c4_filter,
    dedup_lines,
)


def _tbl(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_line_filter_rules():
    t = _tbl(["good line stays here.\nshort.\nno terminal punct line",
              "contains lorem ipsum filler here.\nanother fine line stays!",
              None,
              ""])
    out = LineFilter(min_words=3)(t)
    texts = out.column("text").to_pylist()
    assert texts[0] == "good line stays here."
    assert texts[1] == "another fine line stays!"
    assert texts[2] is None  # null preserved
    assert texts[3] == ""
    assert out.column("n_lines").to_pylist() == [3, 2, 1, 1]
    assert out.column("n_lines_kept").to_pylist() == [1, 1, 0, 0]


def test_line_filter_all_kept_roundtrips():
    body = "one two three four.\nfive six seven eight!"
    out = LineFilter(min_words=3)(_tbl([body]))
    assert out.column("text").to_pylist() == [body]


def test_doc_filter_gates():
    t = _tbl(["solid document with enough words here.",       # keep
              "tiny.",                                        # < min_words
              "no terminal punctuation in this document at all",  # 0 sentences
              "a { b } c d e f.",                             # blocklist {
              "aaaaaaaaaaaaaaaaaaaaaaaaa" * 4 + " x y z a b.",  # mwl > 12
              None])
    out = C4DocFilter(min_words=5, min_sentences=1)(t)
    assert out.column("keep").to_pylist() == [True, False, False, False,
                                              False, False]
    dropped = C4DocFilter(min_words=5, min_sentences=1, mode="drop")(t)
    assert dropped.num_rows == 1


def test_c4_filter_composed_dataset():
    texts = ["keep this longer line intact.\njs { inline }",
             "drop me entirely"]
    ds = ray.data.from_arrow(_tbl(texts))
    got = c4_filter(ds).to_pandas()
    assert list(got["text"]) == ["keep this longer line intact."]


def test_dedup_lines_first_occurrence_wins():
    texts = ["shared boilerplate footer line\nunique alpha content",
             "unique beta content\nshared boilerplate footer line",
             "shared boilerplate footer line\nunique gamma content"]
    tbl = _tbl(texts)
    out = dedup_lines(lambda: ray.data.from_arrow(tbl)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "text"] == texts[0]          # doc 0 keeps its copy
    assert out.loc[1, "text"] == "unique beta content"
    assert out.loc[2, "text"] == "unique gamma content"
    assert list(out["n_lines_kept"]) == [2, 1, 1]


def test_dedup_lines_within_doc_and_empties():
    texts = ["dup line\n\ndup line\ntail line", "\n\n"]
    tbl = _tbl(texts)
    out = dedup_lines(lambda: ray.data.from_arrow(tbl)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # second occurrence inside the same doc is cut; empty lines survive
    assert out.loc[0, "text"] == "dup line\n\ntail line"
    assert out.loc[1, "text"] == "\n\n"


def test_dedup_lines_idempotent():
    texts = ["x y z\nshared line", "shared line\nq r s"]
    tbl = _tbl(texts)
    once = dedup_lines(lambda: ray.data.from_arrow(tbl)) \
        .drop_columns(["n_lines_kept"])
    t1 = once.to_arrow_refs()
    deduped = pa.concat_tables([__import__("ray").get(r) for r in t1])
    again = dedup_lines(lambda: ray.data.from_arrow(deduped)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = deduped.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(again["text"]) == list(exp["text"])


def test_dedup_lines_join_matches_broadcast():
    # cut delivery parity: the co-partitioned join path must produce
    # byte-identical text and counts to the broadcast path, including
    # docs with no cuts (null list rows after the left join) and
    # within-doc duplicates
    texts = ["shared footer\nalpha\nshared footer",
             "beta\nshared footer",
             "no dups here at all",
             "\n\n",
             "gamma\nshared footer\ngamma"]
    tbl = _tbl(texts)

    def run(strategy):
        return dedup_lines(lambda: ray.data.from_arrow(tbl),
                           strategy=strategy, n_buckets=3) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)

    b, j = run("broadcast"), run("join")
    assert list(b.columns) == list(j.columns)
    assert list(b["text"]) == list(j["text"])
    assert list(b["n_lines_kept"]) == list(j["n_lines_kept"])


def test_dedup_lines_join_forced_from_driver_branch():
    # strategy="join" with triples under driver_threshold: the driver
    # cut frame is lifted back into a Dataset and delivered by join
    texts = ["dup\nx", "dup\ny"]
    out = dedup_lines(lambda: ray.data.from_arrow(_tbl(texts)),
                      strategy="join") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["text"]) == ["dup\nx", "y"]


def test_dedup_lines_unknown_strategy():
    import pytest

    with pytest.raises(ValueError, match="strategy"):
        dedup_lines(lambda: ray.data.from_arrow(_tbl(["a"])),
                    strategy="bogus")


def test_text_normalizer_nfc_lower_ws():
    import unicodedata

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
        TextNormalizer,
    )

    # NFD "é" (e + combining accent) must collapse to NFC "é"
    nfd = unicodedata.normalize("NFD", "Élan  Vital")
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array([nfd, "  A\tB\n\nC  ", None])})
    out = TextNormalizer(out_col="t")(tbl)
    got = out.column("t").to_pylist()
    assert got[0] == "élan vital"
    assert len(got[0].encode()) == len("élan vital".encode())  # truly NFC
    assert got[1] == "a b c"
    assert got[2] == ""


def test_chunk_documents_edges_and_overlap():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
        chunk_documents,
    )
    import ray.data

    texts = ["abcdefghij",      # 10 chars: chunks(5, ov 2): 0-5,3-8,6-10
             "abc",             # shorter than chunk -> 1 chunk
             "",                # empty -> 1 empty chunk
             None,              # null -> 1 empty chunk
             "日本語テキストです"]   # unicode, 9 codepoints
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = chunk_documents(ray.data.from_arrow(tbl), chunk_size=5, overlap=2) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    d0 = out[out["doc_id"] == 0]["chunk_text"].tolist()
    assert d0 == ["abcde", "defgh", "ghij"]
    assert out[out["doc_id"] == 1]["chunk_text"].tolist() == ["abc"]
    assert out[out["doc_id"] == 2]["chunk_text"].tolist() == [""]
    assert out[out["doc_id"] == 3]["chunk_text"].tolist() == [""]
    d4 = out[out["doc_id"] == 4]["chunk_text"].tolist()
    # 9 codepoints, stride 3: starts at 0, 3, 6
    assert d4 == ["日本語テキ", "テキストで", "トです"]
    # every chunk boundary overlaps the previous by exactly `overlap`
    assert all(a[-2:] == b[:2] for a, b in zip(d0, d0[1:]))
    assert (out.groupby("doc_id")["n_chunks"].nunique() == 1).all()


def test_gopher_quality_filter_rules():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
        GopherQualityFilter,
    )

    texts = [
        # passes every gate (2 stopwords: the, that)
        "the quick brown fox jumps over that lazy dog today.",
        # word count below min_words
        "tiny the be",
        # symbol-to-word: 3 '#' in 15 words (alpha ratio 12/15 still ok)
        "that with been long word nice warm cold gone tall blue pink # # #",
        # bullet lines: 10 of 11 lines start '- ' (> 90%)
        "the fox and dog\n" + "\n".join(["- item number one two"] * 10),
        # ellipsis lines: 2 of 4 end '...' (> 30%)
        "the fox and dog\nmore to come...\nanother line here\n"
        "to be continued...",
        # alphabetic-word ratio: 6 of 9 words (< 80%)
        "the fox and dog ran far 111 222 333",
        # zero required stopwords
        "big fast cars race down empty streets quickly today maybe.",
        # stopword match is case-insensitive (The, With)
        "The fierce Wolf ran With great speed around everything else.",
        None,
    ]
    t = _tbl(texts)
    out = GopherQualityFilter(min_words=5, min_stop_hits=2)(t)
    assert out.column("keep").to_pylist() == [
        True, False, False, False, False, False, False, True, False]
    # counters are exact (hand-computed)
    assert out.column("n_words").to_pylist()[:6] == [10, 3, 15, 54, 13, 9]
    assert out.column("n_lines").to_pylist()[3:5] == [11, 4]
    assert out.column("n_alpha_words").to_pylist()[2] == 12
    assert out.column("n_stop_hits").to_pylist()[:2] == [2, 2]
    dropped = GopherQualityFilter(min_words=5, min_stop_hits=2,
                                  mode="drop")(t)
    assert dropped.num_rows == 2
