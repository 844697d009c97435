"""Blocked fuzzy matching tests (stages/linkage.py)."""

import numpy as np
import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.linkage import (
    blocked_levenshtein_pairs,
    levenshtein,
)


def _ref_lev(a: str, b: str) -> int:
    """Textbook O(nm) reference DP (independent op order)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                           prev[j] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_known_values():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("flaw", "lawn") == 2
    assert levenshtein("a", "b") == 1


def test_levenshtein_matches_reference_dp_randomized():
    rng = np.random.RandomState(7)
    alpha = "abcd"
    for _ in range(200):
        la, lb = rng.randint(0, 12, size=2)
        a = "".join(rng.choice(list(alpha), la))
        b = "".join(rng.choice(list(alpha), lb))
        assert levenshtein(a, b) == _ref_lev(a, b), (a, b)


def test_levenshtein_matches_duckdb():
    import duckdb

    rng = np.random.RandomState(11)
    alpha = "abcde é✓"  # include multibyte code points
    cases = []
    for _ in range(80):
        la, lb = rng.randint(0, 30, size=2)
        cases.append(("".join(rng.choice(list(alpha), la)),
                      "".join(rng.choice(list(alpha), lb))))
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_levenshtein_unit_semantics():
    # DuckDB (byte unit): 'é' is two UTF-8 bytes -> substitution costs 2
    assert levenshtein("héllo", "hallo") == 2
    assert levenshtein("héllo", "hallo", unit="codepoint") == 1


def test_levenshtein_band_sentinel():
    # true distance 3 > max_dist 2 -> sentinel max_dist+1
    assert levenshtein("kitten", "sitting", max_dist=2) == 3
    assert levenshtein("kitten", "sitting", max_dist=3) == 3
    # length-gap short-circuit
    assert levenshtein("ab", "abcdefgh", max_dist=3) == 4


def test_blocked_pairs_end_to_end():
    import ray.data

    base = "shared sixteen!! tail goes here with plenty of words"
    tbl = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            base,                          # block A
            base + " x",                   # block A, dist 2 to doc 1
            base.replace("tail", "TAIL"),  # block A, dist 4 to doc 1
            "different prefix entirely for this one",  # alone
            None,                          # null never matches
        ],
    })
    out = blocked_levenshtein_pairs(
        ray.data.from_arrow(tbl), block_chars=16, cmp_chars=200,
        max_dist=3).to_pandas().sort_values(["id_a", "id_b"])
    got = set(zip(out["id_a"], out["id_b"], out["dist"]))
    assert got == {(1, 2, 2)}  # (1,3) is dist 4 > 3; 4 alone; 5 null


def test_blocked_pairs_max_block_drops_with_warning():
    import ray.data

    tbl = pa.table({
        "doc_id": list(range(6)),
        "text": ["common prefix 16 suffix %d" % i for i in range(6)],
    })
    with pytest.warns(UserWarning, match="max_block"):
        # max_block=2 < 6 members -> whole block dropped, zero pairs.
        # map_groups runs in-process only via a local pandas path; to
        # guarantee the warning surfaces, call the bucket fn directly.
        from open_telemetry_opentelemetry_collector_contrib_ray.stages.linkage import (  # noqa: E501
            _verify_block_pairs,
        )
        import pandas as pd

        df = pd.DataFrame({"doc_id": range(6),
                           "__blk": ["common prefix 16"] * 6,
                           "__s": ["common prefix 16 suffix %d" % i
                                   for i in range(6)]})
        out = _verify_block_pairs(df, "doc_id", max_dist=5, max_block=2)
    assert len(out) == 0
    # and with a big enough cap the same block yields all C(6,2) pairs
    out2 = blocked_levenshtein_pairs(
        ray.data.from_arrow(tbl), block_chars=16, cmp_chars=200,
        max_dist=5, max_block=64).to_pandas()
    assert len(out2) == 15


def test_blocked_pairs_string_ids():
    import ray.data

    base = "shared sixteen!! tail goes here"
    tbl = pa.table({
        "doc_id": ["u-1", "u-2"],
        "text": [base, base + " x"],
    })
    out = blocked_levenshtein_pairs(
        ray.data.from_arrow(tbl), block_chars=16, cmp_chars=200,
        max_dist=3).to_pandas()
    assert list(zip(out["id_a"], out["id_b"], out["dist"])) == \
        [("u-1", "u-2", 2)]


def test_entity_clusters_query_driver_vs_distributed_cc():
    """entity_clusters (blocked match edges -> CC) must be identical
    whether the components are found by driver union-find or by the
    distributed min-label propagation path."""
    import ray.data
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_entity_clusters,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import (
        dedup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    got = q_entity_clusters(sf).to_pandas()
    assert (got["doc_id"] != got["cluster_id"]).any()  # non-trivial clusters
    # representative is the component minimum: every cluster_id is itself
    # a member labelled with itself
    reps = got.set_index("doc_id")["cluster_id"].to_dict()
    assert all(reps[c] == c for c in set(got["cluster_id"]))

    pairs = blocked_levenshtein_pairs(
        ray.data.read_parquet(f"{sf}/documents.parquet",
                              columns=["doc_id", "text"]),
        block_chars=16, cmp_chars=200, max_dist=20)
    edges = pairs.map_batches(
        lambda t: pa.table({"doc_a": t.column("id_a"),
                            "doc_b": t.column("id_b")}),
        batch_format="pyarrow")
    dist = dedup_clusters(edges, max_driver_pairs=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert dist.equals(got)
