"""Stage-level tests over small in-memory tables (no Ray needed for the
pure-batch stages; Ray only for Dataset-level ops)."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.sources import TOOL_CATALOG
from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
    AttributesStage,
    CsvParser,
    JsonParser,
    KeyValueParser,
    LookupEnricher,
    ProbabilisticSampler,
    RegexParser,
    Route,
    RouteIdStage,
    SeverityParser,
    TimeParser,
    make_tool_log_parser,
)


def _tool_batch():
    return pa.table({
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
        "role": ["tool", "user", "tool", "tool"],
        "text": [
            "2023-11-14T22:13:58Z ERROR tool=calc status=error latency_ms=1356 msg=a b",
            "hello there",
            "corrupted gibberish",
            "2023-11-14T22:14:58Z INFO tool=search status=ok latency_ms=20 msg=ok",
        ],
        "tool": ["calc", "", "shell", "search"],
        "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
    })


def test_tool_log_parser_on_error_send():
    out = make_tool_log_parser()(_tool_batch())
    assert out.num_rows == 4  # send keeps malformed rows
    assert out.column("attr_status").to_pylist() == ["error", None, None, "ok"]
    assert out.column("attr_latency_ms").to_pylist() == [1356, None, None, 20]
    # user row is skipped (if_condition), not a failure; corrupted tool row is
    assert out.column("parse_failure").to_pylist() == [False, False, True, False]


def test_tool_log_parser_on_error_drop():
    out = make_tool_log_parser(on_error="drop")(_tool_batch())
    assert out.num_rows == 3
    assert out.column("conv_id").to_pylist() == ["c1", "c1", "c2"]


def test_regex_parser_propagate_raises():
    import pytest

    p = RegexParser(r"^(?P<a>\d+)$", on_error="propagate")
    with pytest.raises(ValueError):
        p(pa.table({"text": ["1", "x"]}))


def test_severity_parser():
    t = pa.table({"attr_level": ["INFO", "error", "Warning", "bogus", None]})
    out = SeverityParser()(t)
    assert out.column("severity_number").to_pylist() == [9, 17, 13, None, None]
    assert out.column("severity_text").to_pylist() == ["INFO", "ERROR", "WARN", None, None]


def test_severity_parser_range_mappings():
    # severity_builder.go:94-103 HTTP aliases, :166-196 min/max ranges
    t = pa.table({"status": pa.array([200, 204, 301, 404, 500, 555, 700, None],
                                     pa.int64())})
    p = SeverityParser(parse_from="status", preset="none",
                       mapping={"info": ["2xx"], "warn": ["3xx"],
                                "error": ["4xx"],
                                "fatal": ["5xx", {"min": 600, "max": 650}]})
    out = p(t)
    assert out.column("severity_number").to_pylist() == \
        [9, 9, 13, 17, 21, 21, None, None]
    assert out.column("severity_text").to_pylist()[:5] == \
        ["INFO", "INFO", "WARN", "ERROR", "FATAL"]
    # custom entries overlay the builtin preset (builder.go:124-146)
    p2 = SeverityParser(parse_from="status",
                        mapping={"fatal": [{"min": 500, "max": 599}]})
    out2 = p2(pa.table({"status": ["error", "502"]}))
    assert out2.column("severity_number").to_pylist() == [17, 21]
    with pytest.raises(ValueError):
        SeverityParser(mapping={"nosuch": ["2xx"]})
    with pytest.raises(ValueError):
        SeverityParser(preset="bogus")


def test_time_parser_strptime_and_epoch():
    t = pa.table({"attr_log_ts": ["2023-11-14T22:13:58Z", "bad"]})
    out = TimeParser("attr_log_ts")(t)
    vals = out.column("time").to_pylist()
    assert vals[0] is not None and vals[1] is None
    t2 = pa.table({"epoch": pa.array([1_700_000_000], pa.int64())})
    out2 = TimeParser("epoch", layout_type="epoch_s")(t2)
    assert out2.column("time").to_pylist()[0].year == 2023


def test_json_and_kv_and_csv_parsers():
    jt = pa.table({"text": ['{"a": 1, "b": "x"}', "notjson", None]})
    out = JsonParser()(jt)
    assert out.column("attr_a").to_pylist() == [1, None, None]
    assert out.column("parse_failure").to_pylist() == [False, True, True]

    kt = pa.table({"text": ["a=1 b=2", "b=9", ""]})
    out = KeyValueParser(["a", "b"])(kt)
    assert out.column("attr_a").to_pylist() == ["1", None, None]
    assert out.column("attr_b").to_pylist() == ["2", "9", None]

    ct = pa.table({"text": ["x,1,z", "only,two"]})
    out = CsvParser(["c1", "c2", "c3"])(ct)
    assert out.column("attr_c1").to_pylist() == ["x", "only"]
    assert out.column("attr_c3").to_pylist() == ["z", None]


def test_lookup_enricher_defaults():
    out = LookupEnricher(TOOL_CATALOG, key_col="tool",
                         defaults={"tool_category": "other", "risk_level": 0})(_tool_batch())
    # "calc" and "shell" are NOT in the catalog -> defaults (insert-if-absent)
    assert out.column("attr_tool_category").to_pylist() == ["other", "other", "other", "retrieval"]


def test_attributes_stage_actions():
    t = pa.table({"attr_a": ["1", None], "attr_b": ["x", "y"], "role": ["u", "t"]})
    stage = AttributesStage([
        {"action": "insert", "key": "a", "value": "ins"},
        {"action": "upsert", "key": "c", "from_attribute": "b"},
        {"action": "convert", "key": "a", "converted_type": "int"},
        {"action": "hash", "key": "b"},
        {"action": "delete", "key": "c"},
    ])
    out = stage(t)
    assert out.column("attr_a").to_pylist() == [1, None]  # insert only filled null... then convert
    assert "attr_c" not in out.column_names
    import hashlib

    assert out.column("attr_b").to_pylist()[0] == hashlib.sha256(b"x").hexdigest()


def test_attributes_insert_semantics():
    t = pa.table({"attr_a": ["keep", None]})
    out = AttributesStage([{"action": "insert", "key": "a", "value": "new"}])(t)
    assert out.column("attr_a").to_pylist() == ["keep", "new"]
    out = AttributesStage([{"action": "update", "key": "a", "value": "upd"}])(t)
    assert out.column("attr_a").to_pylist() == ["upd", None]


def test_route_first_match_wins():
    t = pa.table({
        "role": ["tool", "tool", "user", "user"],
        "attr_status": ["error", "ok", None, None],
        "attr_latency_ms": pa.array([2000, 800, None, None], pa.int64()),
        "text": ["x", "y", "timeout here", "fine"],
    })
    stage = RouteIdStage([
        Route("errors", 'attributes["status"] == "error"'),
        Route("slow", 'attributes["latency_ms"] > 500'),
        Route("timeouts", 'IsMatch(text, "timeout")'),
    ])
    out = stage(t)
    # row0 matches errors AND slow -> errors (priority / MOVE semantics)
    assert out.column("route_id").to_pylist() == ["errors", "slow", "timeouts", "default"]


def test_sampler_deterministic():
    t = pa.table({"conv_id": [f"conv-{i:06d}" for i in range(1000)]})
    s = ProbabilisticSampler(10.0, "conv_id")
    a, b = s(t), s(t)
    assert a.num_rows == b.num_rows
    assert 50 < a.num_rows < 200  # ~10%
    inv = ProbabilisticSampler(10.0, "conv_id", invert=True)
    assert inv(t).num_rows == 1000 - a.num_rows


def test_container_parser_mixed_formats():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        ContainerParser,
    )

    t = pa.table({"text": [
        '{"log":"docker line\\n","stream":"stdout","time":"2024-01-01T00:00:01Z"}',
        "2024-01-01T00:00:02.000000000Z stderr F cri full line",
        "2024-01-01T00:00:03.000000000Z stdout P cri partial",
        "garbage that matches neither",
    ]})
    out = ContainerParser()(t)
    assert out.column("attr_log").to_pylist() == [
        "docker line", "cri full line", "cri partial", None]
    assert out.column("attr_stream").to_pylist() == ["stdout", "stderr", "stdout", None]
    assert out.column("attr_logtag").to_pylist() == ["F", "F", "P", None]
    assert out.column("parse_failure").to_pylist() == [False, False, False, True]


def test_syslog_parser():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        SyslogParser,
    )

    t = pa.table({"text": [
        "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed",
        "<13>Feb  5 17:32:18 host app: simple message",
        "not syslog",
    ]})
    out = SyslogParser()(t)
    assert out.column("attr_hostname").to_pylist() == ["mymachine", "host", None]
    # Arrow extract_regex yields "" for optional non-participating groups
    assert out.column("attr_pid").to_pylist() == ["230", "", None]
    assert out.column("attr_facility").to_pylist() == [4, 1, None]
    assert out.column("attr_syslog_severity").to_pylist() == [2, 5, None]
    assert out.column("parse_failure").to_pylist() == [False, False, True]


def test_reassemble_container_partials():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        ContainerParser,
        reassemble_container_partials,
    )

    t = pa.table({"text": [
        "2024-01-01T00:00:01.0Z stdout P part one ",
        "2024-01-01T00:00:02.0Z stdout P part two ",
        "2024-01-01T00:00:03.0Z stdout F done",
        "2024-01-01T00:00:04.0Z stdout F single full line",
        "2024-01-01T00:00:05.0Z stderr F other stream",
    ]})
    parsed = ContainerParser()(t)
    import ray.data as rd

    ds = rd.from_arrow(parsed)
    out = reassemble_container_partials(ds).to_pandas().sort_values("attr_log_time")
    logs = out.attr_log.tolist()
    assert "part one part two done" in logs
    assert "single full line" in logs
    assert "other stream" in logs
    assert out[out.attr_log == "part one part two done"].n_partials.iloc[0] == 3


def test_schema_rename_stage():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.enrich import (
        SchemaRenameStage,
    )

    t = pa.table({"attr_net_peer_name": ["h"], "attr_keep": ["x"], "other": ["y"]})
    out = SchemaRenameStage({"net_peer_name": "server_address"})(t)
    assert "attr_server_address" in out.column_names
    assert "attr_net_peer_name" not in out.column_names
    assert out.column("attr_keep").to_pylist() == ["x"]


def test_jsonarray_parser_header_and_list():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        JsonArrayParser,
    )

    t = pa.table({"text": ['["a", 1, true, {"x": 2}]', "junk", None,
                           '["b", 2, false, null]']})
    out = JsonArrayParser(header=["name", "num", "flag", "obj"])(t)
    assert out.column("attr_name").to_pylist() == ["a", None, None, "b"]
    assert out.column("attr_num").to_pylist() == [1, None, None, 2]
    assert out.column("attr_flag").to_pylist() == [True, None, None, False]
    # nested objects stringify, like the reference (jsonarray/parser.go)
    assert out.column("attr_obj").to_pylist()[0] == '{"x": 2}'
    assert out.column("parse_failure").to_pylist() == [False, True, True, False]
    # no header -> one list column
    out2 = JsonArrayParser()(pa.table({"text": ['["a","b"]', "junk"]}))
    assert out2.column("attr_parsed").to_pylist() == [["a", "b"], None]


def test_trace_and_scope_parsers():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        ScopeParser,
        TraceParser,
    )

    t = pa.table({
        "attr_trace_id": ["0123456789ABCDEF0123456789abcdef", "xyz", None],
        "attr_span_id": ["0123456789abcdef", "0123", "aaaaaaaaaaaaaaaa"],
        "attr_trace_flags": ["01", "01", "zz"],
        "svc": ["s1", "s2", "s3"],
    })
    out = TraceParser()(t)
    assert out.column("trace_id").to_pylist() == [
        "0123456789abcdef0123456789abcdef", None, None]
    assert out.column("span_id").to_pylist() == [
        "0123456789abcdef", None, "aaaaaaaaaaaaaaaa"]
    assert out.column("trace_flags").to_pylist() == ["01", "01", None]
    assert out.column("parse_failure").to_pylist() == [False, True, True]
    out2 = ScopeParser("svc")(t)
    assert out2.column("scope_name").to_pylist() == ["s1", "s2", "s3"]


def test_assign_keys_unquote_noop_steps():
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
        STEP_REGISTRY,
    )

    import pyarrow.compute as pc

    t = pa.table({"attr_vals": pc.split_pattern(
        pa.array(["1,2,3", "x,y", ""]), ",")})
    stage = STEP_REGISTRY["assign_keys"](
        {"type": "assign_keys", "field": 'attributes["vals"]',
         "keys": ["a", "b", "c"]})
    out = stage(t)
    assert out.column("attr_a").to_pylist() == ["1", "x", ""]
    assert out.column("attr_b").to_pylist() == ["2", "y", None]
    assert out.column("attr_c").to_pylist() == ["3", None, None]

    t2 = pa.table({"text": ['"hello\\nworld"', "`raw text`", "'c'",
                            "plain", None]})
    out = STEP_REGISTRY["unquote"]({"type": "unquote", "field": "body"})(t2)
    assert out.column("text").to_pylist() == [
        "hello\nworld", "raw text", "c", "plain", None]

    out = STEP_REGISTRY["noop"]({"type": "noop"})(t2)
    assert out is t2


def test_exp_histogram_exact_vs_log_mapping():
    """scale=0 integer fast path == OTel ceil(log2(v))-1 mapping, incl.
    power-of-two boundaries where float log could drift."""
    import math

    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        exp_histogram_agg,
    )

    vals = [1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 1023, 1024, 1025, 0]
    ds = rd.from_arrow(pa.table({"k": ["x"] * len(vals),
                                 "v": pa.array(vals, pa.int64())}))
    out = exp_histogram_agg(ds, ["k"], "v", scale=0).to_pandas()
    got = {row["bucket"] if not pd.isna(row["bucket"]) else None: row["n"]
           for _, row in out.iterrows()}

    def ref_idx(v):
        if v <= 0:
            return None
        if v == 1:
            return -1
        return math.ceil(math.log2(v)) - 1

    import collections

    exp = collections.Counter(ref_idx(v) for v in vals)
    assert {k: int(c) for k, c in got.items()} == dict(exp)


def test_uri_parser():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        UriParser,
    )

    t = pa.table({"text": ["https://example.com:8443/a/b?x=1&y=two",
                           "http://host/path", "", None]})
    out = UriParser()(t)
    assert out.column("attr_scheme").to_pylist() == ["https", "http", None, None]
    assert out.column("attr_host").to_pylist() == ["example.com", "host", None, None]
    assert out.column("attr_port").to_pylist() == [8443, None, None, None]
    assert out.column("attr_path").to_pylist() == ["/a/b", "/path", None, None]
    assert dict(out.column("attr_query_params").to_pylist()[0]) == {"x": "1", "y": "two"}
    assert out.column("parse_failure").to_pylist() == [False, False, True, True]


def test_to_mat_null_rows_stay_aligned():
    """flatten() drops nulls — a naive reshape misaligns every following
    row (code-review finding): null embeddings must become zero vectors."""
    import numpy as np

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.similarity import (
        _to_mat,
    )

    col = pa.array([[1.0, 2.0, 3.0, 4.0], None, [5.0, 6.0, 7.0, 8.0], None],
                   type=pa.list_(pa.float64()))
    m = _to_mat(col)
    assert m.shape == (4, 4)
    assert (m[0] == [1, 2, 3, 4]).all() and (m[2] == [5, 6, 7, 8]).all()
    assert (m[1] == 0).all() and (m[3] == 0).all()


def test_tail_sample_nothing_matches_returns_empty():
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.tailsampling import (
        tail_sample,
    )

    ds = rd.from_arrow(pa.table({"conv_id": ["a", "b"], "turn_idx": [0, 0],
                                 "ts": [0, 1]}))
    out = tail_sample(ds, [{"type": "span_count", "min_spans": 10**6}])
    assert out.count() == 0


def test_jsonarray_all_failed_batch_keeps_string_schema():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        JsonArrayParser,
        JsonParser,
    )

    t = pa.table({"text": ["junk", "also junk"]})
    out = JsonArrayParser(header=["a"])(t)
    assert pa.types.is_string(out.column("attr_a").type)
    out = JsonParser(keys=["k"])(t)
    assert pa.types.is_string(out.column("attr_k").type)


def test_attributes_masked_delete_targets_matched_rows():
    """Code-review finding: masked delete nulled the WRONG rows (inverted
    gate) — redaction leaked on targeted rows, destroyed untargeted."""
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        AttributesStage,
    )

    t = pa.table({"attr_secret": ["s1", "s2"], "role": ["tool", "user"]})
    out = AttributesStage([{"action": "delete", "key": "secret"}],
                          include='role == "tool"')(t)
    assert out.column("attr_secret").to_pylist() == [None, "s2"]
    out = AttributesStage([{"action": "delete", "pattern": "^sec"}],
                          include='role == "tool"')(t)
    assert out.column("attr_secret").to_pylist() == [None, "s2"]


def test_attributes_extract_preserves_on_nonmatch():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        AttributesStage,
    )

    t = pa.table({"attr_src": ["user=alice", "no match"],
                  "attr_user": ["old1", "keepme"]})
    out = AttributesStage([{"action": "extract", "key": "src",
                            "pattern": r"user=(?P<user>\w+)"}])(t)
    # matched row updated, non-matching row keeps its existing value
    # (attraction.go only upserts on match)
    assert out.column("attr_user").to_pylist() == ["alice", "keepme"]


def test_sampler_rounds_threshold_and_drops_null_keys():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        ProbabilisticSampler,
    )

    assert ProbabilisticSampler(0.29).threshold == 29  # int() truncated to 28
    t = pa.table({"conv_id": ["a", None, "b"]})
    kept = ProbabilisticSampler(100.0)(t)
    # null keys never pass, in either polarity (DuckDB NULL-WHERE parity)
    assert None not in kept.column("conv_id").to_pylist()
    inv = ProbabilisticSampler(0.0, invert=True)(t)
    assert None not in inv.column("conv_id").to_pylist()


def test_route_error_goes_to_default_and_quote_safe_split():
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.route import (
        Route,
        RouteIdStage,
        split_match_once,
    )

    # Int("abc"-typed column) inside a condition that raises for the batch:
    # unassigned rows must land on DEFAULT, later routes NOT tried
    t = pa.table({"x": ["1", "2"], "y": ["b", "b"]})
    stage = RouteIdStage([Route("r1", 'UnknownFn(x) == 1'),
                          Route("r2", 'y == "b"')], error_mode="ignore")
    out = stage(t)
    assert out.column("route_id").to_pylist() == ["default", "default"]
    # a route name containing a quote must not break the per-sink filter
    ds = rd.from_arrow(pa.table({"text": ["hit", "miss"]}))
    sinks = split_match_once(ds, [Route("ops' team", 'text == "hit"')])
    assert sinks["ops' team"].count() == 1
    assert sinks["default"].count() == 1


def test_resource_stamper_idempotent_and_lookup_default_only_fields():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        LookupEnricher,
        ResourceStamper,
    )

    t = pa.table({"x": [1]})
    out = ResourceStamper({"env": "prod"})(ResourceStamper({"env": "dev"})(t))
    assert out.column("res_env").to_pylist() == ["prod"]
    t2 = pa.table({"tool": ["a", "zz"]})
    out = LookupEnricher({"a": {"cat": "x"}},
                         defaults={"cat": "other", "risk": 9})(t2)
    assert out.column("attr_cat").to_pylist() == ["x", "other"]
    assert out.column("attr_risk").to_pylist() == [9, 9]


def test_asof_join_directions_tolerance_and_left():
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import asof_join

    left = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "t": pa.array([10, 20, 30, 10], pa.int64()),
        "lv": pa.array([1, 2, 3, 4], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": ["a", "a", "b"],
        "t": pa.array([9, 21, 50], pa.int64()),
        "rv": pa.array([100, 200, 300], pa.int64())}))

    back = asof_join(left, right, by="k", on="t", how="inner").to_pandas()
    got = dict(zip(back.lv, back.rv))
    assert got == {1: 100, 2: 100, 3: 200}  # b@10 has no right <= 10

    fwd = asof_join(left, right, by="k", on="t", how="inner",
                    direction="forward").to_pandas()
    got = dict(zip(fwd.lv, fwd.rv))
    assert got == {1: 200, 2: 200, 4: 300}  # a@30 has no right >= 30

    tol = asof_join(left, right, by="k", on="t", how="inner",
                    tolerance=10).to_pandas()
    got = dict(zip(tol.lv, tol.rv))
    assert got == {1: 100, 3: 200}  # a@20 is 11 past 9 -> out of tolerance

    lft = asof_join(left, right, by="k", on="t", how="left").to_pandas()
    assert len(lft) == 4
    unmatched = lft[lft.lv == 4]
    assert unmatched.rv.isna().all()


def test_range_join_interval_spans_bins():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import range_join

    # one interval spanning 3 bins (bin width 10): [5, 25]; another fully
    # inside a bin: [42, 44]
    right = rd.from_arrow(pa.table({
        "k": ["a", "a"],
        "s": pa.array([5, 42], pa.int64()),
        "e": pa.array([25, 44], pa.int64()),
        "iv": pa.array([1, 2], pa.int64())}))
    left = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "a", "a", "b"],
        "t": pa.array([4, 5, 15, 25, 43, 43], pa.int64()),
        "lv": pa.array([0, 1, 2, 3, 4, 5], pa.int64())}))
    out = range_join(left, right, left_ts="t", right_start="s", right_end="e",
                     by="k", bin_width_us=10).to_pandas()
    pairs = sorted(zip(out.lv, out.iv))
    # t=4 before interval; endpoints inclusive; k mismatch excluded
    assert pairs == [(1, 1), (2, 1), (3, 1), (4, 2)]
    # no duplicate (left, interval) pairs despite 3-bin replication
    assert len(pairs) == len(set(pairs))


def test_sliding_window_agg_matches_naive():
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        sliding_window_agg,
    )

    rng = np.random.RandomState(3)
    ts = rng.randint(0, 40, size=200).astype(np.int64)
    val = rng.randint(1, 10, size=200).astype(np.int64)
    key = np.where(rng.rand(200) < 0.5, "x", "y")
    t = pa.table({"ts": pa.array(ts), "v": pa.array(val), "g": pa.array(key)})

    W, S = 8, 2  # window 8us sliding 2us -> m=4
    out = sliding_window_agg(rd.from_arrow(t), "ts",
                             [("count", None, "n"), ("sum", "v", "sv"),
                              ("min", "v", "mn"), ("max", "v", "mx")],
                             window_us=W, slide_us=S, keys=["g"]).to_pandas()

    # naive: every (g, window) where window = (ts//S - i)*S
    import collections
    naive = collections.defaultdict(list)
    for tt, vv, gg in zip(ts, val, key):
        for i in range(W // S):
            naive[(gg, (tt // S - i) * S)].append(vv)
    assert len(out) == len(naive)
    for _, r in out.iterrows():
        vals = naive[(r.g, r.window_start)]
        assert (r.n, r.sv, r.mn, r.mx) == (len(vals), sum(vals), min(vals), max(vals))


def test_consistent_hash_ring():
    import numpy as np
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        ConsistentHashRing,
    )

    keys = [f"conv-{i}" for i in range(2000)]
    t = pa.table({"conv_id": keys})
    eps3 = ["a", "b", "c"]
    r3 = ConsistentHashRing(eps3, weight=100, source="conv_id")
    out3 = r3(t).column("endpoint").to_pylist()
    # deterministic and reasonably balanced
    assert out3 == r3(t).column("endpoint").to_pylist()
    import collections
    c = collections.Counter(out3)
    assert set(c) == set(eps3)
    assert min(c.values()) > 2000 / 3 * 0.5  # no endpoint starved

    # THE consistent-hashing property: removing one endpoint only remaps
    # keys that endpoint owned; every other key keeps its endpoint
    r2 = ConsistentHashRing(["a", "b"], weight=100, source="conv_id")
    out2 = r2(t).column("endpoint").to_pylist()
    moved = sum(1 for e3, e2 in zip(out3, out2) if e3 != e2)
    stayed_wrong = sum(1 for e3, e2 in zip(out3, out2)
                       if e3 in ("a", "b") and e3 != e2)
    assert stayed_wrong == 0        # survivors keep every key they had
    assert moved == c["c"]          # only c's keys moved

    # crc32 mode: bit-parity with the reference ring semantics
    # (consistent_hashing.go): position = crc32(ep || byte(i)) % 36000,
    # first-endpoint-wins collisions in config order, key routes to the
    # next position clockwise with wraparound.
    import zlib
    rc = ConsistentHashRing(eps3, weight=100, source="conv_id", algo="crc32")
    outc = rc(t).column("endpoint").to_pylist()
    ref_ring: dict[int, str] = {}
    for ep in eps3:
        for i in range(100):
            ref_ring.setdefault(zlib.crc32(ep.encode() + bytes([i])) % 36000, ep)
    ring_sorted = sorted(ref_ring.items())
    for key, got in list(zip(keys, outc))[:200]:
        kp = zlib.crc32(key.encode()) % 36000
        exp = next((e for p, e in ring_sorted if p >= kp), ring_sorted[0][1])
        assert got == exp, (key, got, exp)


def test_joins_match_bruteforce_on_random_inputs():
    """asof_join and range_join vs naive O(n^2) references on randomized
    keys/times (3 seeds; covers ties, empty sides per bucket, multi-key
    groups)."""
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        asof_join,
        range_join,
    )

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        nl, nr = 60, 40
        lk = rng.choice(["a", "b", "c", "d"], nl)
        lt = rng.randint(0, 100, nl).astype(np.int64)
        rk = rng.choice(["a", "b", "e"], nr)
        rt = rng.randint(0, 100, nr).astype(np.int64)
        left = pa.table({"k": lk, "t": pa.array(lt),
                         "lid": pa.array(np.arange(nl, dtype=np.int64))})
        right = pa.table({"k": rk, "t": pa.array(rt),
                          "rid": pa.array(np.arange(nr, dtype=np.int64))})

        out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                        by="k", on="t", how="inner", n_buckets=4).to_pandas()
        got = dict(zip(out.lid, out.rid))
        exp = {}
        for i in range(nl):
            cands = [(rt[j], -j) for j in range(nr)
                     if rk[j] == lk[i] and rt[j] <= lt[i]]
            if cands:
                # merge_asof picks the LAST right row among equal times
                best_t = max(c[0] for c in cands)
                best_j = max(j for j in range(nr)
                             if rk[j] == lk[i] and rt[j] == best_t)
                exp[i] = best_j
        assert got == exp, f"asof mismatch seed={seed}"

        rs = rt
        re_ = rt + rng.randint(0, 30, nr).astype(np.int64)
        right2 = pa.table({"k": rk, "s": pa.array(rs), "e": pa.array(re_),
                           "rid": pa.array(np.arange(nr, dtype=np.int64))})
        out2 = range_join(rd.from_arrow(left), rd.from_arrow(right2),
                          left_ts="t", right_start="s", right_end="e",
                          by="k", bin_width_us=16, n_buckets=4).to_pandas()
        got2 = sorted(zip(out2.lid, out2.rid))
        exp2 = sorted((i, j) for i in range(nl) for j in range(nr)
                      if lk[i] == rk[j] and rs[j] <= lt[i] <= re_[j])
        assert got2 == exp2, f"range mismatch seed={seed}"


def test_semi_anti_join_and_grouped_topk_and_stratified():
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        bucketed_hash_join,
        grouped_top_k,
        stratified_sample,
    )

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 2, 4, 9], pa.int64()),
        "w": pa.array([1, 2, 3, 4], pa.int64())}))
    semi = bucketed_hash_join(left, right, on=["k"], how="semi",
                              n_buckets=4).to_pandas()
    assert sorted(semi.k) == [2, 4] and list(semi.columns) == ["k", "v"]
    anti = bucketed_hash_join(left, right, on=["k"], how="anti",
                              n_buckets=4).to_pandas()
    assert sorted(anti.k) == [1, 3, 5]

    rng = np.random.RandomState(11)
    n = 300
    t = pa.table({
        "g": pa.array(rng.choice(["x", "y", "z"], n)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "val": pa.array(rng.randint(0, 50, n).astype(np.int64))})
    top = grouped_top_k(rd.from_arrow(t), ["g"], ["val", "id"], k=4,
                        descending=[True, False], n_buckets=4).to_pandas()
    df = t.to_pandas()
    exp = df.sort_values(["val", "id"], ascending=[False, True]) \
            .groupby("g").head(4)
    assert sorted(map(tuple, top[["g", "id"]].values)) == \
        sorted(map(tuple, exp[["g", "id"]].values))

    samp = stratified_sample(rd.from_arrow(t), ["g"], n_per_group=7,
                             id_col="id", n_buckets=4).to_pandas()
    assert (samp.groupby("g").size() == 7).all()
    # deterministic across runs
    samp2 = stratified_sample(rd.from_arrow(t), ["g"], n_per_group=7,
                              id_col="id", n_buckets=4).to_pandas()
    assert sorted(samp.id) == sorted(samp2.id)


def test_grouped_quantile_matches_percentile_disc():
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        grouped_quantile,
    )

    rng = np.random.RandomState(5)
    n = 500
    t = pa.table({"g": pa.array(rng.choice(["a", "b", "c"], n)),
                  "v": pa.array(rng.randint(0, 1000, n).astype(np.int64))})
    out = grouped_quantile(rd.from_arrow(t), ["g"], "v",
                           qs=(0.5, 0.9), aliases=["p50", "p90"],
                           n_buckets=4).to_pandas().set_index("g")
    df = t.to_pandas()
    for g, sub in df.groupby("g"):
        arr = np.sort(sub["v"].to_numpy())
        for q, col in [(0.5, "p50"), (0.9, "p90")]:
            exp = arr[int(np.ceil(q * len(arr))) - 1]  # percentile_disc
            assert out.loc[g, col] == exp, (g, col)


def test_grouped_quantile_cont_matches_duckdb():
    import duckdb
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        grouped_quantile,
    )

    rng = np.random.RandomState(6)
    n = 400
    t = pa.table({"g": pa.array(rng.choice(["a", "b", "c", "d"], n)),
                  "v": pa.array(rng.uniform(-10, 10, n))})
    out = grouped_quantile(rd.from_arrow(t), ["g"], "v",
                           qs=(0.25, 0.5, 0.77), aliases=["a25", "a50", "a77"],
                           n_buckets=4, interpolate=True) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    df = t.to_pandas()  # noqa: F841
    exp = duckdb.sql("""
        SELECT g, quantile_cont(v, 0.25) AS a25,
               quantile_cont(v, 0.50) AS a50,
               quantile_cont(v, 0.77) AS a77
        FROM df GROUP BY g ORDER BY g""").df()
    for c in ("a25", "a50", "a77"):
        # bitwise: the interpolation mirrors DuckDB's op order
        assert np.array_equal(out[c].to_numpy().view(np.uint64),
                              exp[c].to_numpy().view(np.uint64)), c


def test_empty_batches_and_empty_inputs_keep_schemas():
    """A filter that empties SOME batches must not degrade aggregate key
    dtypes (the old hand-built empty partial typed every key as string);
    fully-empty inputs flow through the new operators without crashing."""
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        asof_join,
        grouped_agg,
        grouped_top_k,
        range_join,
        sliding_window_agg,
    )

    # int64 keys, 4 tiny blocks, filter empties half of them
    t = pa.table({"k": pa.array([1, 1, 2, 2, 3, 3, 4, 4], pa.int64()),
                  "v": pa.array([10, 1, 20, 2, 30, 3, 40, 4], pa.int64())})
    ds = rd.from_arrow(t).repartition(4).map_batches(
        lambda b: b.filter(pa.compute.greater(b.column("v"), 5)),
        batch_format="pyarrow")
    out = grouped_agg(ds, ["k"], [("sum", "v", "sv")], combine="bucket",
                      n_buckets=2).to_pandas()
    assert out.k.dtype.kind == "i" and sorted(out.sv) == [10, 20, 30, 40]
    out2 = grouped_agg(ds, ["k"], [("sum", "v", "sv")],
                       combine="driver").to_pandas()
    assert out2.k.dtype.kind == "i" and sorted(out2.sv) == [10, 20, 30, 40]

    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.string()), "t": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64())}))
    some = rd.from_arrow(pa.table({
        "k": pa.array(["a"]), "t": pa.array([5], pa.int64()),
        "v": pa.array([1], pa.int64())}))
    assert asof_join(some, empty, by="k", on="t", how="inner",
                     n_buckets=2).count() == 0
    assert range_join(empty.map_batches(
        lambda b: b.rename_columns(["k", "s", "v"]).append_column(
            "e", pa.array([], pa.int64())), batch_format="pyarrow"),
        some, left_ts="s", right_start="t", right_end="t", by="k",
        bin_width_us=10, n_buckets=2).count() == 0
    assert sliding_window_agg(empty, "t", [("count", None, "n")],
                              window_us=4, slide_us=2,
                              keys=["k"]).count() == 0
    assert grouped_top_k(empty, ["k"], ["v"], k=2, n_buckets=2).count() == 0


def test_review_fixes_null_keys_and_window_conflict():
    import numpy as np
    import pytest
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        grouped_top_k,
        stratified_sample,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
        approx_quantile,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.tailsampling import (
        tail_sample_decisions,
    )

    # NULL group keys form their own partition (SQL PARTITION BY parity)
    t = pa.table({"g": pa.array(["a", "a", None, None, None], pa.string()),
                  "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "v": pa.array([10, 20, 30, 40, 50], pa.int64())})
    top = grouped_top_k(rd.from_arrow(t), ["g"], ["v", "id"], k=2,
                        n_buckets=2).to_pandas()
    assert len(top) == 4  # 2 from 'a', 2 from the NULL partition
    assert top.g.isna().sum() == 2
    samp = stratified_sample(rd.from_arrow(t), ["g"], n_per_group=2,
                             id_col="id", n_buckets=2).to_pandas()
    assert samp.g.isna().sum() == 2
    aq = approx_quantile(rd.from_arrow(t), "v", "id", qs=(0.5,), k=8,
                         keys=["g"])
    assert aq.num_rows == 2  # 'a' + the None stratum, no TypeError

    # conflicting window_us across rate-limited policies is an error
    ds = rd.from_arrow(pa.table({
        "conv_id": ["c1"], "ts": pa.array([1], pa.timestamp("us"))}))
    with pytest.raises(ValueError, match="window_us"):
        tail_sample_decisions(ds, [
            {"type": "rate_limiting", "spans_per_second": 10,
             "window_us": 1_000_000},
            {"type": "composite", "max_total_spans_per_second": 10,
             "window_us": 2_000_000, "subpolicies": []},
        ])


def test_make_explode_with_nulls_and_ragged():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.transform import (
        make_explode,
    )

    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "xs": pa.array([[10, 20], None, [], [30]],
                                 pa.list_(pa.int64()))})
    out = make_explode("xs", value_col="x", index_col="i")(t)
    assert out.column("id").to_pylist() == [1, 1, 4]
    assert out.column("i").to_pylist() == [0, 1, 0]
    assert out.column("x").to_pylist() == [10, 20, 30]


def test_severity_presets():
    # severity_builder.go:16-84 preset ladder
    t = pa.table({"attr_level": ["warn", "warning", "9", "notice", "zzz"]})
    # otel/aliases: canonical names + numeric strings, NO warning alias
    out = SeverityParser(preset="otel")(t)
    assert out.column("severity_number").to_pylist() == [13, None, 9, None, None]
    # default: warning/err aliases + engine extras recognized
    out2 = SeverityParser()(t)
    assert out2.column("severity_number").to_pylist() == [13, 13, 9, 10, None]


def test_severity_overwrite_text_modes():
    # severity.go Parse: overwrite_text=False keeps the raw input string
    t = pa.table({"attr_level": ["WARN", "bogus", None]})
    keep = SeverityParser(overwrite_text=False)(t)
    assert keep.column("severity_text").to_pylist() == ["WARN", "bogus", None]
    assert keep.column("severity_number").to_pylist() == [13, None, None]
    canon = SeverityParser()(t)  # default: canonical
    assert canon.column("severity_text").to_pylist() == ["WARN", None, None]


def test_fnv1a32_reference_golden_vectors():
    # fnvhasher_test.go TestEmptyHashFunction golden values:
    # computeHash([]byte{}, 0) & 0x3FFF == 0x3515
    # computeHash(16 zero bytes, 0) & 0x3FFF == 0x2455
    import struct

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        fnv1a32,
    )

    h0 = fnv1a32(struct.pack("<I", 0))
    assert h0 & 0x3FFF == 0x3515
    assert fnv1a32(b"\x00" * 16, h=h0) & 0x3FFF == 0x2455


def test_fnv32_vectorized_matches_scalar():
    import struct

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        _fnv32_values,
        fnv1a32,
    )

    vals = ["conv-000123", "x", "", None, "a much longer conversation id",
            b"\x00\x01\x02", "conv-000123"]
    seed = 4312  # the reference's defaultHashSeed
    h, valid = _fnv32_values(vals, seed)
    h0 = fnv1a32(struct.pack("<I", seed))
    for i, v in enumerate(vals):
        if v is None or v == "" :
            assert not valid[i]
            continue
        b = v if isinstance(v, bytes) else str(v).encode()
        assert valid[i]
        assert int(h[i]) == fnv1a32(b, h=h0), (i, v)


def test_probabilistic_sampler_fnv_mode():
    import struct

    import numpy as np

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        ProbabilisticSampler,
        fnv1a32,
    )

    ids = [f"conv{i:04d}" for i in range(1000)] + [None]
    t = pa.table({"conv_id": pa.array(ids, pa.string())})
    pct, seed = 25.0, 4312
    s = ProbabilisticSampler(pct, "conv_id", mode="fnv", hash_seed=seed)
    out = s(t)
    # hand-compute the legacy HashSeed verdicts (sampler_mode.go:436-444)
    scaled = int(np.float32(pct) * np.float32(0x4000 / 100.0))
    h0 = fnv1a32(struct.pack("<I", seed))
    expect = [i for i in ids if i is not None
              and (fnv1a32(i.encode(), h=h0) & 0x3FFF) < scaled]
    assert out.column("conv_id").to_pylist() == expect
    assert 150 < out.num_rows < 350  # ~25%
    # determinism + invert partitions the non-null rows
    inv = ProbabilisticSampler(pct, "conv_id", mode="fnv", hash_seed=seed,
                               invert=True)
    assert inv(t).num_rows == 1000 - out.num_rows
    # scaled == 0 -> neverSampler (sampler_mode.go:438-440)
    assert ProbabilisticSampler(0.0, "conv_id", mode="fnv")(t).num_rows == 0


def test_fnv32_values_long_value_rowwise_parity():
    """Values past the padded-matrix cap hash row-wise; result must be
    bit-identical to the vectorized path's definition (fnv1a32 over
    le32(seed) ++ value bytes)."""
    import struct

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        _fnv32_values,
        fnv1a32,
    )

    big = b"z" * 5000
    vals = ["abc", big.decode(), "de"]
    h, valid = _fnv32_values(vals, seed=22)
    assert valid.all()
    for i, v in enumerate(vals):
        assert h[i] == fnv1a32(struct.pack("<I", 22) + v.encode())


def test_key_value_parser_quote_aware():
    # quoted values protect the pair delimiter and strip their quotes
    # (parseutils.SplitString semantics, keyvalue/parser.go:42-47);
    # quote-free batches stay on the vectorized regex path
    kt = pa.table({"text": [
        'user="jane doe" level=info',
        "user=bob level='very bad'",
        "user=plain level=warn",      # mixed batch: plain rows still parse
        "user='broken level=x",       # unterminated quote: all-null row
        None,
    ]})
    out = KeyValueParser(["user", "level"])(kt)
    assert out.column("attr_user").to_pylist() == [
        "jane doe", "bob", "plain", None, None]
    assert out.column("attr_level").to_pylist() == [
        "info", "very bad", "warn", None, None]


def test_temperature_mix_budgets_and_determinism():
    """alpha=0.5 budgets: floor(sqrt(per-source tokens)) shares of the
    total; small sources get proportionally MORE than raw share; two
    runs pick identical docs."""
    import numpy as np
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        temperature_mix,
    )

    rng = np.random.RandomState(8)
    n = 600
    src = np.where(rng.rand(n) < 0.9, "big", "small")
    t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(n)]),
                  "source": pa.array(src),
                  "tok": pa.array(np.full(n, 10, dtype=np.int64))})
    out = temperature_mix(rd.from_arrow(t), total_tokens=1000,
                          token_col="tok", seed=3).to_pandas()
    tot = {s: int(t.to_pandas().loc[t.to_pandas().source == s, "tok"].sum())
           for s in ("big", "small")}
    w = {s: int(np.floor(np.sqrt(v))) for s, v in tot.items()}
    wsum = sum(w.values())
    for s in ("big", "small"):
        budget = 1000 * w[s] // wsum
        got = int(out.loc[out.source == s, "tok"].sum())
        assert got <= budget and got > budget - 10, (s, got, budget)
    # sqrt weighting gives `small` a larger share than its raw 10%
    small_share = (out.source == "small").mean()
    assert small_share > 0.2
    out2 = temperature_mix(rd.from_arrow(t), total_tokens=1000,
                           token_col="tok", seed=3).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_grouped_linear_stats_hand_computed():
    import math

    import pyarrow as pa
    import ray.data

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (  # noqa: E501
        grouped_linear_stats,
    )

    # group "a": y = 2x exactly -> corr 1, slope 2
    # group "b": constant y -> zero variance -> corr/slope NULL
    # group "c": hand case x=[0,1,2], y=[1,3,2]
    tbl = pa.table({
        "k": ["a"] * 4 + ["b"] * 3 + ["c"] * 3 + ["d"] * 2,
        "x": [1, 2, 3, 4, 5, 6, 7, 0, 1, 2, 4, 4],
        "y": [2, 4, 6, 8, 9, 9, 9, 1, 3, 2, 1, 5],
    })
    out = grouped_linear_stats(ray.data.from_arrow(tbl), ["k"], "x", "y")
    rows = {r["k"]: r for r in out.to_pylist()}
    # a: num=40, den_x=20, den_y=80 — corr is num/(sqrt*sqrt) in THE
    # fixed op order (sqrt(20)*sqrt(80) != 40.0 exactly in binary64)
    assert rows["a"]["corr"] == 40.0 / (math.sqrt(20.0) * math.sqrt(80.0))
    assert rows["a"]["slope"] == 2.0
    # b: constant y -> den_y=0 kills corr; slope is a true 0 (den_x>0)
    assert rows["b"]["corr"] is None and rows["b"]["slope"] == 0.0
    # d: constant x -> den_x=0 kills both
    assert rows["d"]["corr"] is None and rows["d"]["slope"] is None
    # c: n=3 sx=3 sy=6 sxy=7 sxx=5 syy=14 -> num=21-18=3,
    # den_x=15-9=6, den_y=42-36=6 -> slope=3/6, corr=3/(sqrt6*sqrt6)
    assert rows["c"]["slope"] == 0.5
    assert rows["c"]["corr"] == 3.0 / (math.sqrt(6.0) * math.sqrt(6.0))
    assert rows["c"]["n"] == 3


def test_grouped_linear_stats_nulls_and_128bit_sums():
    import pyarrow as pa
    import ray.data

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (  # noqa: E501
        grouped_linear_stats,
    )

    # null x or y rows are skipped (SQL corr/regr pairwise deletion):
    # group reduces to x=[1,2,3], y=[2,4,6]
    tbl = pa.table({
        "k": ["a"] * 5,
        "x": [1, 2, 3, None, 9],
        "y": [2, 4, 6, 7, None],
    })
    out = grouped_linear_stats(ray.data.from_arrow(tbl), ["k"], "x", "y")
    r = out.to_pylist()[0]
    assert r["n"] == 3 and r["slope"] == 2.0

    # Σy² past int64: 200 rows of y = 2^30 -> syy = 200 * 2^60 ≈ 2.3e20.
    # int64 accumulation would wrap; decimal128 partials must stay exact
    # (constant y -> corr NULL, slope exactly 0.0 — garbage if wrapped).
    big = 1 << 30
    n = 200
    tbl2 = pa.table({"k": ["g"] * n,
                     "x": pa.array(list(range(n)), pa.int64()),
                     "y": pa.array([big] * n, pa.int64())})
    out2 = grouped_linear_stats(ray.data.from_arrow(tbl2), ["k"], "x", "y")
    r2 = out2.to_pylist()[0]
    assert r2["n"] == n and r2["corr"] is None and r2["slope"] == 0.0


def test_grouped_linear_stats_overflow_guard():
    import pyarrow as pa
    import pytest
    import ray.data

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (  # noqa: E501
        grouped_linear_stats,
    )

    tbl = pa.table({"k": ["a"], "x": pa.array([1 << 32], pa.int64()),
                    "y": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="2\\^31"):
        grouped_linear_stats(ray.data.from_arrow(tbl), ["k"], "x", "y")
