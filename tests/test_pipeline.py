"""End-to-end pipeline tests under the session Ray: routed-row equality
and per-sink aggregate-count equality — the round-trip gates from
BASELINE.md, modeled on the reference's routingconnector split tests
(connector/routingconnector/logs_test.go:80,235,471)."""

import pandas as pd
import pyarrow.compute as pc

SF = "/root/testdata/sf0.001"


def _ref_route(df: pd.DataFrame) -> pd.Series:
    """Slow row-wise reference interpreter for the flagship routing table
    (FIXTURES.md F3 golden-path)."""
    import re

    pat = re.compile(
        r"^(\S+) ([A-Z]+) tool=(\w+) status=(\w+) latency_ms=(\d+) msg=(.*)$")

    def route(row):
        m = pat.match(row.text) if row.role == "tool" and row.text else None
        status = m.group(4) if m else None
        lat = int(m.group(5)) if m else None
        if status == "error":
            return "errors"
        if row.role == "tool" and lat is not None and lat > 500:
            return "slow"
        if row.text and re.search("(?i)timeout", row.text):
            return "timeouts"
        return "default"

    return df.apply(route, axis=1)


def test_flagship_routing_row_equality():
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines import build_flagship
    from open_telemetry_opentelemetry_collector_contrib_ray.sources import read_transcripts

    got = build_flagship(SF).to_pandas()[["conv_id", "turn_idx", "text", "route_id"]]
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    raw = read_transcripts(SF).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    expected = _ref_route(raw)
    # per-turn text equality under stable (conv_id, turn_idx) order
    assert (got["text"].fillna("") == raw["text"].fillna("")).all()
    assert (got["route_id"] == expected).all()


def test_per_sink_counts_match_reference_interpreter():
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines import (
        flagship_sink_counts,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.sources import read_transcripts

    counts = flagship_sink_counts(SF).to_pandas()
    raw = read_transcripts(SF).to_pandas()
    raw["route_id"] = _ref_route(raw)
    exp = raw.groupby(["route_id", "role"]).size().rename("n").reset_index()
    m = counts.merge(exp, on=["route_id", "role"], how="outer", suffixes=("_got", "_exp"))
    assert (m["n_got"].fillna(-1) == m["n_exp"].fillna(-1)).all(), m


def test_routed_write_partitions(tmp_path):
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines import run_flagship
    import os

    out, lineage_dir = run_flagship(SF, str(tmp_path / "routed"))
    subdirs = sorted(os.listdir(out))
    assert any(d.startswith("route_id=") for d in subdirs)
    import pyarrow.dataset as pads

    back = pads.dataset(out, partitioning="hive").to_table()
    assert back.num_rows == 2000
    # lineage sidecars: totals + per-sink counts match the data
    from open_telemetry_opentelemetry_collector_contrib_ray.state.lineage import (
        counts_from_lineage,
        summarize_lineage,
    )

    total = summarize_lineage(lineage_dir)
    assert total["rows_in"] == total["rows_out"] == 2000
    assert total["parse_failures"] > 0
    counts = counts_from_lineage(lineage_dir).to_pandas()
    assert counts["n"].sum() == 2000
    assert set(counts.columns) == {"route_id", "role", "n"}


def test_grouped_agg_two_phase():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import grouped_agg

    ds = rd.from_items([{"k": "a", "v": i} for i in range(10)] +
                       [{"k": "b", "v": 100}])
    out = grouped_agg(ds, ["k"], [("count", None, "n"), ("sum", "v", "total"),
                                  ("min", "v", "lo"), ("max", "v", "hi"),
                                  ("mean", "v", "avg")]).to_pandas()
    a = out[out.k == "a"].iloc[0]
    assert a.n == 10 and a.total == 45 and a.lo == 0 and a.hi == 9 and a.avg == 4.5


def test_recombine_order():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import recombine

    ds = rd.from_items([
        {"conv_id": "c", "turn_idx": 2, "text": "third", "ts": 3},
        {"conv_id": "c", "turn_idx": 0, "text": "first", "ts": 1},
        {"conv_id": "c", "turn_idx": 1, "text": "second", "ts": 2},
    ])
    out = recombine(ds, sep=" ").to_pandas()
    assert out.combined.iloc[0] == "first second third"


def test_recombine_multiline_modes():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        recombine_multiline,
    )

    ds = rd.from_items([
        {"src": "a", "seq": 0, "text": "START one"},
        {"src": "a", "seq": 1, "text": "cont"},
        {"src": "a", "seq": 2, "text": "START two"},
        {"src": "a", "seq": 3, "text": "cont"},
        {"src": "a", "seq": 4, "text": "cont"},
        {"src": "b", "seq": 0, "text": "orphan"},      # before first START
        {"src": "b", "seq": 1, "text": "START only"},
    ])
    out = recombine_multiline(
        ds, source_col="src", order_col="seq",
        is_first_entry='IsMatch(text, "^START")', sep=" ").to_pandas()
    got = {(r.src, r.entry_idx): (r.combined, r.n_lines)
           for r in out.itertuples()}
    assert got[("a", 1)] == ("START one cont", 2)
    assert got[("a", 2)] == ("START two cont cont", 3)
    assert got[("b", 0)] == ("orphan", 1)
    assert got[("b", 1)] == ("START only", 1)

    # is_last_entry: the boundary row CLOSES its entry
    out2 = recombine_multiline(
        ds, source_col="src", order_col="seq",
        is_last_entry='IsMatch(text, "cont")', sep=" ").to_pandas()
    got2 = {(r.src, r.entry_idx): r.combined for r in out2.itertuples()}
    assert got2[("a", 0)] == "START one cont"
    assert got2[("a", 1)] == "START two cont"
    assert got2[("a", 2)] == "cont"

    # max_batch_size: an entry flushes every 2 members
    out3 = recombine_multiline(
        ds, source_col="src", order_col="seq",
        is_first_entry='IsMatch(text, "^START")', sep=" ",
        max_batch_size=2).to_pandas()
    a2 = out3[(out3.src == "a") & (out3.entry_idx == 2)] \
        .sort_values("part")
    assert list(a2.combined) == ["START two cont", "cont"]
    assert list(a2.part) == [0, 1]

    import pytest

    with pytest.raises(ValueError):
        recombine_multiline(ds, source_col="src", order_col="seq")


def test_recombine_max_batch_size():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import recombine

    rows = [{"conv_id": "c1", "turn_idx": i, "text": str(i)} for i in range(5)]
    out = recombine(rd.from_items(rows), sep=",",
                    max_batch_size=2).to_pandas().sort_values("part")
    assert list(out.combined) == ["0,1", "2,3", "4"]
    assert list(out.n_turns) == [2, 2, 1]


def test_round_robin_and_failover(tmp_path):
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.route import (
        failover_write,
        round_robin_split,
    )

    ds = rd.range(100)
    out = round_robin_split(ds, 4).to_pandas()
    assert out.rr_sink.value_counts().tolist() == [25, 25, 25, 25]

    # by=: globally deterministic arrival-order rotation (value % n),
    # independent of batch boundaries
    out_by = round_robin_split(rd.range(100), 4, by="id").to_pandas()
    assert (out_by.rr_sink == out_by.id % 4).all()

    calls = []

    def bad(d):
        calls.append("bad")
        raise OSError("sink down")

    def good(d):
        calls.append("good")
        d.write_parquet(str(tmp_path / "fo"))

    winner = failover_write(rd.range(10), [bad, good])
    assert winner == 1 and calls == ["bad", "good"]


def test_split_match_once_and_match_all_datasets():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.route import (
        Route,
        split_match_all,
        split_match_once,
    )
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({
        "x": [1, 2, 3, 4],
        "text": ["err slow", "err", "slow", "fine"],
    }))
    routes = [Route("errors", 'IsMatch(text, "err")'),
              Route("slow", 'IsMatch(text, "slow")')]
    once = {k: sorted(r["x"] for r in v.take_all())
            for k, v in split_match_once(ds, routes).items()}
    # MOVE: row 1 matches both but lands only on the first route
    assert once == {"errors": [1, 2], "slow": [3], "default": [4]}
    alldup = {k: sorted(r["x"] for r in v.take_all())
              for k, v in split_match_all(ds, routes).items()}
    # COPY: row 1 appears in both routes
    assert alldup == {"errors": [1, 2], "slow": [1, 3], "default": [4]}


def test_flagship_actor_pool_variant():
    """The stateful-stage contract: FlagshipStage as an actor pool
    (concurrency=) must produce identical results to task mode."""
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.flagship import (
        FlagshipStage,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.sources import (
        read_transcripts,
    )

    task_mode = read_transcripts(SF).map_batches(
        FlagshipStage(), batch_format="pyarrow").to_pandas()
    actor_mode = read_transcripts(SF).map_batches(
        FlagshipStage, batch_format="pyarrow", concurrency=2).to_pandas()
    t = task_mode.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    a = actor_mode.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (t["route_id"] == a["route_id"]).all()
    assert (t["text"].fillna("") == a["text"].fillna("")).all()


def test_dedup_exact_sorted_equals_global():
    """Locality-aware dedup == global-shuffle dedup on the conv-contiguous
    corpus (its precondition)."""
    from open_telemetry_opentelemetry_collector_contrib_ray.sources import (
        read_transcripts,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.transcripts import (
        transcript_files,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        dedup_exact,
        dedup_exact_sorted,
    )

    keys = ["conv_id", "role", "text"]
    fast = dedup_exact_sorted(transcript_files(SF), keys).to_pandas()
    slow = dedup_exact(read_transcripts(SF), keys).to_pandas()
    cols = keys + ["log_count", "first_observed", "last_observed",
                   "representative_turn_idx"]
    f = fast[cols].sort_values(keys).reset_index(drop=True)
    s = slow[cols].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, s, check_dtype=False)


def test_recombine_sorted_equals_global():
    from open_telemetry_opentelemetry_collector_contrib_ray.sources import (
        read_transcripts,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.transcripts import (
        transcript_files,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        recombine,
        recombine_sorted,
    )

    fast = recombine_sorted(transcript_files(SF), sep="\n").to_pandas()
    slow = recombine(read_transcripts(SF), sep="\n").to_pandas()
    cols = ["conv_id", "combined", "n_turns", "first_ts", "last_ts"]
    f = fast[cols].sort_values("conv_id").reset_index(drop=True)
    s = slow[cols].sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(f, s, check_dtype=False)


def test_recombine_multiline_property():
    """Distributed boundary stitch == single-process reference replay,
    over randomized source/order/boundary layouts (batching and bucket
    hashing must not leak into results)."""
    import ray.data as rd
    from hypothesis import given, settings, strategies as st
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        recombine_multiline,
    )

    @settings(max_examples=10, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def run(seed):
        import numpy as np

        rng = np.random.RandomState(seed)
        n = int(rng.randint(5, 120))
        src = rng.randint(0, 4, n)
        start = rng.rand(n) < 0.3
        rows = [{"src": f"s{src[i]}", "seq": i,
                 "text": ("S" if start[i] else "c") + str(i)}
                for i in range(n)]
        got = recombine_multiline(
            rd.from_items(rows).repartition(5), source_col="src",
            order_col="seq", is_first_entry='IsMatch(text, "^S")',
            sep=" ").to_pandas()
        got_map = {(r.src, r.entry_idx): (r.combined, r.n_lines)
                   for r in got.itertuples()}
        # reference replay: per source in seq order, new entry at each S
        expect = {}
        counters = {}
        for r in sorted(rows, key=lambda x: x["seq"]):
            s = r["src"]
            if s not in counters:
                counters[s] = 0
            if r["text"].startswith("S"):
                counters[s] += 1
            key = (s, counters[s])
            if key in expect:
                expect[key] = (expect[key][0] + " " + r["text"],
                               expect[key][1] + 1)
            else:
                expect[key] = (r["text"], 1)
        assert got_map == expect

    run()
