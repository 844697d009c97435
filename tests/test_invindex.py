import numpy as np
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.invindex import (
    boolean_search,
    phrase_search,
    token_stats,
)


def _corpus():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "The quick Brown fox, the quick fox!",
            "quick quick quick",
            "",                      # empty doc -> no tokens
            None,                    # null text -> no tokens
            "brown FOX runs; fox",
        ], pa.string()),
    }))


def test_token_stats_case_punct_and_nulls():
    out = token_stats(_corpus(), n_buckets=4).to_pandas() \
        .set_index("token").sort_index()
    # lowercase, punctuation-split tokens
    assert out.loc["quick", "tf"] == 5 and out.loc["quick", "df"] == 2
    assert out.loc["fox", "tf"] == 4 and out.loc["fox", "df"] == 2
    assert out.loc["fox", "min_doc"] == 1 and out.loc["fox", "max_doc"] == 5
    assert out.loc["the", "tf"] == 2  # "The" and "the" fold together
    assert "" not in out.index


def test_token_stats_min_df_prunes():
    out = token_stats(_corpus(), min_df=2, n_buckets=4).to_pandas()
    assert set(out["token"]) == {"quick", "fox", "brown"}


def test_phrase_search_adjacency():
    t = phrase_search(_corpus(), ["quick", "fox"], n_buckets=4).to_pandas()
    # doc1: "quick brown fox" is NOT adjacent; "quick fox" (2nd) is
    assert t["n_docs"][0] == 1 and t["n_occurrences"][0] == 1
    # repeated-token phrase: overlapping occurrences both count
    t = phrase_search(_corpus(), ["quick", "quick"], n_buckets=4).to_pandas()
    assert t["n_docs"][0] == 1  # only doc2; doc1's quicks aren't adjacent
    assert t["n_occurrences"][0] == 2  # doc2 positions (0,1) and (1,2)
    # absent phrase
    t = phrase_search(_corpus(), ["fox", "zebra"], n_buckets=4).to_pandas()
    assert t["n_docs"][0] == 0 and t["n_occurrences"][0] == 0


def test_phrase_search_trigram():
    t = phrase_search(_corpus(), ["the", "quick", "fox"],
                      n_buckets=4).to_pandas()
    assert t["n_docs"][0] == 1 and t["n_occurrences"][0] == 1


def test_boolean_search():
    assert boolean_search(_corpus(), must=["quick", "fox"],
                          n_buckets=4) == 1
    assert boolean_search(_corpus(), must=["fox"],
                          must_not=["quick"], n_buckets=4) == 1  # doc5
    assert boolean_search(_corpus(), must=["zebra"], n_buckets=4) == 0
    assert boolean_search(_corpus(), must=["fox"],
                          must_not=["brown"], n_buckets=4) == 0


def test_phrase_matches_direct_scan(sf_dir):
    # index probe path == direct per-row regex scan on real testdata
    import re

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    t = phrase_search(ds, ["table", "value"], n_buckets=4).to_pandas()
    docs = ds.take_all()
    pat = re.compile(r"(?<![a-z0-9_])table[^a-z0-9_]+value")
    n_docs = sum(1 for r in docs
                 if r["text"] and pat.search(r["text"].lower()))
    assert int(t["n_docs"][0]) == n_docs
