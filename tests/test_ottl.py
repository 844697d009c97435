"""OTTL-lite conformance tests.

Modeled on the reference's e2e corpus
(/root/reference/pkg/ottl/e2e/e2e_test.go): a table of
(statement, input, expected mutation) cases, evaluated here against
columnar batches instead of single records.
"""

import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.functions import (
    parse_condition,
    parse_statement,
    registered_functions,
)


def tbl(**cols):
    return pa.table(cols)


BASE = {
    "text": ["alpha beta", "timeout error", "", None],
    "role": ["user", "tool", "assistant", "tool"],
    "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
    "attr_status": ["ok", "error", None, "error"],
    "attr_latency_ms": pa.array([10, 600, None, 70], pa.int64()),
}


# ---- condition cases: (expr, expected mask) ------------------------------
CONDITIONS = [
    ('role == "tool"', [False, True, False, True]),
    ('role != "tool"', [True, False, True, False]),
    ("turn_idx >= 2", [False, False, True, True]),
    ("turn_idx < 1", [True, False, False, False]),
    # mixed int/float compared as float (LANGUAGE.md:261-286)
    ("turn_idx == 2.0", [False, False, True, False]),
    ("turn_idx * 2 + 1 == 7", [False, False, False, True]),
    ('attributes["latency_ms"] > 500', [False, True, False, False]),
    # nil semantics: null comparisons false; == nil is an is-null check
    ('attributes["status"] == nil', [False, False, True, False]),
    ('attributes["status"] != nil', [True, True, False, True]),
    ('attributes["missing"] > 5', [False, False, False, False]),
    # incompatible types: == false, != true
    ('turn_idx == "2"', [False, False, False, False]),
    ('turn_idx != "2"', [True, True, True, True]),
    ('role == "tool" and attributes["status"] == "error"', [False, True, False, True]),
    ('role == "user" or turn_idx == 3', [True, False, False, True]),
    ('not (role == "user")', [False, True, True, True]),
    ('IsMatch(text, "^time")', [False, True, False, False]),
    ('IsMatch(text, "(?i)TIMEOUT")', [False, True, False, False]),
    ("IsString(text)", [True, True, True, False]),
    ("IsInt(turn_idx)", [True, True, True, True]),
    ('Len(text) == 0', [False, False, True, False]),
    ('Substring(text, 0, 5) == "alpha"', [True, False, False, False]),
    ('ConvertCase(role, "upper") == "TOOL"', [False, True, False, True]),
]


@pytest.mark.parametrize("expr,expected", CONDITIONS, ids=[c[0] for c in CONDITIONS])
def test_condition(expr, expected):
    got = parse_condition(expr)(tbl(**BASE)).to_pylist()
    assert got == expected


# ---- statement cases: (statement, column, expected values) ----------------
STATEMENTS = [
    ('set(attributes["x"], "v")', "attr_x", ["v"] * 4),
    ('set(attributes["x"], "v") where role == "tool"', "attr_x", [None, "v", None, "v"]),
    ('set(attributes["x"], turn_idx * 10)', "attr_x", [0, 10, 20, 30]),
    ('set(attributes["x"], attributes["status"]) where attributes["status"] != nil',
     "attr_x", ["ok", "error", None, "error"]),
    # update semantics via where on presence
    ('set(attributes["status"], "seen") where attributes["status"] != nil',
     "attr_status", ["seen", "seen", None, "seen"]),
    ('set(text, Concat([role, text], ":"))', "text",
     ["user:alpha beta", "tool:timeout error", "assistant:", None]),
    ('replace_pattern(text, "[aeiou]", "_")', "text",
     ["_lph_ b_t_", "t_m___t _rr_r", "", None]),
    ('replace_match(text, "timeout*", "REDACTED")', "text",
     ["alpha beta", "REDACTED", "", None]),
    ('set(attributes["h"], Substring(text, 0, 3)) where Len(text) >= 3',
     "attr_h", ["alp", "tim", None, None]),
    ('truncate_all(attributes, 2)', "attr_status", ["ok", "er", None, "er"]),
    ('set(attributes["sha"], SHA256(role))', "attr_sha",
     # sha256("user"), sha256("tool") ... spot check first only below
     None),
    ('set(cache["tmp"], 1)', "cache_tmp", [1, 1, 1, 1]),
    ('append(text, "!") where role == "user"', "text",
     ["alpha beta!", "timeout error", "", None]),
]


@pytest.mark.parametrize("stmt,col,expected", STATEMENTS, ids=[s[0][:40] for s in STATEMENTS])
def test_statement(stmt, col, expected):
    out = parse_statement(stmt).apply(tbl(**BASE))
    got = out.column(col).to_pylist()
    if expected is not None:
        assert got == expected
    else:
        import hashlib

        assert got[0] == hashlib.sha256(b"user").hexdigest()


def test_delete_and_keep_keys():
    t = tbl(**BASE)
    out = parse_statement('delete_key(attributes, "status")').apply(t)
    assert "attr_status" not in out.column_names
    out = parse_statement('keep_keys(attributes, ["status"])').apply(t)
    assert out.column_names.count("attr_latency_ms") == 0
    assert "attr_status" in out.column_names
    out = parse_statement('delete_matching_keys(attributes, "^lat")').apply(t)
    assert "attr_latency_ms" not in out.column_names
    assert "attr_status" in out.column_names


def test_merge_maps_strategies():
    t = tbl(text=["a=1 b=2", "a=9", None], attr_a=pa.array(["keep", None, None]))
    ins = parse_statement('merge_maps(attributes, ParseKeyValue(text), "insert")').apply(t)
    assert ins.column("attr_a").to_pylist() == ["keep", "9", None]
    ups = parse_statement('merge_maps(attributes, ParseKeyValue(text), "upsert")').apply(t)
    assert ups.column("attr_a").to_pylist() == ["1", "9", None]
    assert ups.column("attr_b").to_pylist() == ["2", None, None]
    upd = parse_statement('merge_maps(attributes, ParseKeyValue(text), "update")').apply(t)
    assert upd.column("attr_a").to_pylist() == ["1", None, None]
    assert "attr_b" not in upd.column_names


def test_grok_and_extract():
    t = tbl(text=["2023-11-14T22:13:58Z ERROR tool=calc status=error latency_ms=13 msg=x y",
                  "corrupted line"])
    out = parse_statement(
        'merge_maps(attributes, ExtractGrokPatterns(text, '
        '"%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} tool=%{WORD:tool} '
        'status=%{WORD:status} latency_ms=%{INT:latency_ms} msg=%{GREEDYDATA:msg}"), "upsert")'
    ).apply(t)
    assert out.column("attr_level").to_pylist() == ["ERROR", None]
    assert out.column("attr_latency_ms").to_pylist() == ["13", None]
    assert out.column("attr_msg").to_pylist() == ["x y", None]


def test_error_modes():
    t = tbl(**BASE)
    bad = parse_statement('set(attributes["x"], UnknownFn(text))')
    with pytest.raises(KeyError):
        bad.apply(t, error_mode="propagate")
    out = bad.apply(t, error_mode="ignore")
    assert out.equals(t)  # unchanged


def test_time_functions():
    t = tbl(ts=pa.array([1_700_000_000_000_000, 1_700_000_123_456_789], pa.timestamp("us")))
    out = parse_statement('set(attributes["s"], UnixSeconds(ts))').apply(t)
    assert out.column("attr_s").to_pylist() == [1_700_000_000, 1_700_000_123]
    out = parse_statement('set(attributes["t"], TruncateTime(ts, "1h"))').apply(t)
    trunc = out.column("attr_t").to_pylist()
    assert trunc[0] == trunc[1]
    out = parse_statement('set(attributes["h"], Hour(ts))').apply(t)
    assert out.column("attr_h").to_pylist() == [22, 22]


def test_registry_surface():
    fns = registered_functions()
    for must in ["set", "merge_maps", "ExtractGrokPatterns", "IsMatch", "SHA256",
                 "ParseJSON", "ParseKeyValue", "Concat", "Int", "TruncateTime"]:
        assert must in fns


def test_more_converters():
    t = tbl(text=["Hello World", "foo,bar,baz", "  pad  ", None],
            n=pa.array([3, -1, 0, 7], pa.int64()))
    cases = [
        ('set(attributes["o"], Split(text, ",")[1])', ["World" if False else None, "bar", None, None]),
        ('set(attributes["o"], ConvertCase(text, "snake"))',
         ["hello_world", "foo,bar,baz", "__pad__", None]),
        ('set(attributes["o"], Trim(text))', ["Hello World", "foo,bar,baz", "pad", None]),
        ('set(attributes["o"], Double(n))', [3.0, -1.0, 0.0, 7.0]),
        ('set(attributes["o"], String(n))', ["3", "-1", "0", "7"]),
        ('set(attributes["o"], Hex(n))',
         ["0000000000000003", "ffffffffffffffff",
          "0000000000000000", "0000000000000007"]),
        ('set(attributes["o"], n * n + 1)', [10, 2, 1, 50]),
        ('set(attributes["o"], n % 2)', [1, -1, 0, 1]),
        ('set(attributes["o"], -n)', [-3, 1, 0, -7]),
    ]
    for stmt, expected in cases:
        out = parse_statement(stmt).apply(t)
        got = out.column("attr_o").to_pylist()
        if stmt.startswith('set(attributes["o"], Hex'):
            # func_hex.go binary-representation hex (int64 big-endian)
            assert got == expected, got
        elif stmt.startswith('set(attributes["o"], Split'):
            assert got[1] == "bar", got
        else:
            assert got == expected, (stmt, got)


def test_parse_csv_and_format():
    t = tbl(text=["a,b,c", "x,y,z"])
    out = parse_statement(
        'merge_maps(attributes, ParseCSV(text, "f1,f2,f3"), "upsert")').apply(t)
    assert out.column("attr_f2").to_pylist() == ["b", "y"]
    t2 = tbl(a=["x", "y"], n=pa.array([1, 2], pa.int64()))
    out2 = parse_statement('set(attributes["f"], Format("%s-%03d", [a, n]))').apply(t2)
    assert out2.column("attr_f").to_pylist() == ["x-001", "y-002"]


def test_replace_all_editors():
    t = tbl(attr_a=["v1x", "v2y"], attr_b=["zzz", "v9k"], other=["no", "no"])
    out = parse_statement(
        'replace_all_patterns(attributes, "value", "v\\\\d", "V")').apply(t)
    assert out.column("attr_a").to_pylist() == ["Vx", "Vy"]
    assert out.column("attr_b").to_pylist() == ["zzz", "Vk"]
    assert out.column("other").to_pylist() == ["no", "no"]
    out2 = parse_statement(
        'replace_all_matches(attributes, "v*", "MATCHED")').apply(t)
    assert out2.column("attr_a").to_pylist() == ["MATCHED", "MATCHED"]
    assert out2.column("attr_b").to_pylist() == ["zzz", "MATCHED"]
    # key-rename mode
    out3 = parse_statement(
        'replace_all_patterns(attributes, "key", "^a$", "renamed")').apply(t)
    assert "attr_renamed" in out3.column_names and "attr_a" not in out3.column_names


def test_limit_and_keep_matching():
    t = tbl(attr_a=["1", "1"], attr_b=["2", "2"], attr_c=["3", "3"], x=["k", "k"])
    out = parse_statement('limit(attributes, 2, ["c"])').apply(t)
    attrs = [c for c in out.column_names if c.startswith("attr_")]
    assert len(attrs) == 2 and "attr_c" in attrs
    out2 = parse_statement('keep_matching_keys(attributes, "^[ab]$")').apply(t)
    assert sorted(c for c in out2.column_names if c.startswith("attr_")) == \
        ["attr_a", "attr_b"]


def test_duration_and_fnv():
    from open_telemetry_opentelemetry_collector_contrib_ray.functions.registry import (
        parse_duration_us,
    )

    assert parse_duration_us("1h") == 3_600_000_000
    assert parse_duration_us("1h30m") == 5_400_000_000
    assert parse_duration_us("250ms") == 250_000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_duration_us("xyz")
    t = tbl(s=["hello", "hello", "world"])
    out = parse_statement('set(attributes["h"], FNV(s))').apply(t)
    h = out.column("attr_h").to_pylist()
    assert h[0] == h[1] != h[2]


def test_time_strptime_converter():
    t = tbl(s=["2023-11-14T22:13:58Z", "garbage"])
    out = parse_statement('set(attributes["t"], Time(s, "%Y-%m-%dT%H:%M:%SZ"))').apply(t)
    vals = out.column("attr_t").to_pylist()
    assert vals[0] is not None and vals[0].year == 2023
    assert vals[1] is None


def test_extract_patterns_direct():
    t = tbl(text=["user=alice id=7", "nothing"])
    out = parse_statement(
        'merge_maps(attributes, ExtractPatterns(text, "user=(?P<user>\\\\w+) id=(?P<id>\\\\d+)"), "upsert")'
    ).apply(t)
    assert out.column("attr_user").to_pylist() == ["alice", None]
    assert out.column("attr_id").to_pylist() == ["7", None]


def test_user_registered_function():
    from open_telemetry_opentelemetry_collector_contrib_ray.functions import (
        register_row_converter,
    )

    register_row_converter("ReverseStr", lambda s: None if s is None else s[::-1])
    out = parse_statement('set(attributes["r"], ReverseStr(role))').apply(tbl(**BASE))
    assert out.column("attr_r").to_pylist() == ["resu", "loot", "tnatsissa", "loot"]


def test_url_useragent_decode():
    t = tbl(u=["https://example.com:8443/a/b?q=1", "not a url"],
            b64=["aGVsbG8=", "!!!"],
            ua=["Mozilla/5.0 (Windows NT 10.0; Win64) Chrome/120.0.0.0", "curl/8.1"])
    out = parse_statement('merge_maps(attributes, URL(u), "upsert")').apply(t)
    assert out.column("attr_url.domain").to_pylist() == ["example.com", ""]
    assert out.column("attr_url.port").to_pylist() == [8443, None]
    # Go url.Parse accepts "not a url" as a relative path (no error)
    assert out.column("attr_url.path").to_pylist() == ["/a/b", "not a url"]
    out2 = parse_statement('set(attributes["d"], Base64Decode(b64))').apply(t)
    assert out2.column("attr_d").to_pylist() == ["hello", None]
    out3 = parse_statement('set(attributes["d"], Decode(b64, "base64"))').apply(t)
    assert out3.column("attr_d").to_pylist() == ["hello", None]
    out4 = parse_statement('merge_maps(attributes, UserAgent(ua), "upsert")').apply(t)
    assert out4.column("attr_user_agent.name").to_pylist() == ["Chrome", "curl"]
    out5 = parse_statement('set(attributes["os"], UserAgentOS(ua))').apply(t)
    assert out5.column("attr_os").to_pylist()[0].startswith("Windows")


def test_math_converters():
    t = tbl(n=pa.array([4.0, -2.25, 9.0], pa.float64()))
    for stmt, exp in [
        ('set(attributes["o"], Sqrt(n))', [2.0, None, 3.0]),
        ('set(attributes["o"], Abs(n))', [4.0, 2.25, 9.0]),
        ('set(attributes["o"], Floor(n))', [4.0, -3.0, 9.0]),
        ('set(attributes["o"], Ceil(n))', [4.0, -2.0, 9.0]),
    ]:
        got = parse_statement(stmt).apply(t, error_mode="ignore").column("attr_o").to_pylist()
        if "Sqrt" in stmt:
            import math
            assert got[0] == 2.0 and got[2] == 3.0 and (got[1] is None or math.isnan(got[1]))
        else:
            assert got == exp, (stmt, got)


def test_context_prefixed_paths():
    t = tbl(**BASE)
    out = parse_statement('set(log.attributes["x"], log.body) where log.attributes["status"] == "error"').apply(t)
    assert out.column("attr_x").to_pylist() == [None, "timeout error", None, None]


def test_parse_xml():
    # func_parse_xml.go shape: {tag, attributes, content, children};
    # malformed rows -> null (on_error semantics)
    t = tbl(x=['<event id="7"><name>boot</name><level>info</level></event>',
               "not xml"])
    out = parse_statement('set(attributes["doc"], ParseXML(x))').apply(t)
    rows = out.column("attr_doc").to_pylist()
    assert rows[1] is None
    d = dict(rows[0])
    assert d["tag"] == "event"
    assert dict(d["attributes"]) == {"id": "7"}
    kids = [dict(k) for k in d["children"]]
    assert kids == [{"tag": "name", "content": "boot"},
                    {"tag": "level", "content": "info"}]


def test_parse_simplified_xml_slices():
    # repeated child tags collapse to a slice
    # (func_parse_simplified_xml.go:70-95)
    t = tbl(x=['<r><a>1</a><a>2</a><b><c>x</c></b></r>'])
    out = parse_statement(
        'set(attributes["doc"], ParseSimplifiedXML(x))').apply(t)
    d = dict(out.column("attr_doc").to_pylist()[0])
    r = dict(d["r"]) if not isinstance(d["r"], dict) else d["r"]
    assert r["a"] == ["1", "2"]
    assert (dict(r["b"]) if not isinstance(r["b"], dict) else r["b"]) \
        == {"c": "x"}


def test_map_literal():
    t = tbl(role=["user", "tool"], turn_idx=pa.array([1, 2], pa.int32()))
    out = parse_statement(
        'merge_maps(attributes, {"who": role, "idx2": turn_idx * 2, "k": "const"}, "upsert")'
    ).apply(t)
    assert out.column("attr_who").to_pylist() == ["user", "tool"]
    assert out.column("attr_idx2").to_pylist() == [2, 4]
    assert out.column("attr_k").to_pylist() == ["const", "const"]


def test_nested_converters_and_contexts():
    t = tbl(text=["Hello World Foo", "x", None],
            role=["tool", "user", "tool"])
    cases = [
        # nested converter calls
        ('set(attributes["a"], ConvertCase(Substring(text, 0, 5), "upper"))',
         "attr_a", ["HELLO", "X", None]),
        ('set(attributes["b"], Len(Split(text, " ")))', "attr_b", [3, 1, None]),
        ('set(attributes["c"], SHA256(Concat([role, "x"], "-")))', "attr_c", None),
        # resource context writes res_ columns
        ('set(resource.attributes["svc"], "transcripts")', "res_svc",
         ["transcripts"] * 3),
        ('set(resource["env"], "prod")', "res_env", ["prod"] * 3),
        # cache as scratch then read back in same statement list is covered
        # by TransformStage; single-statement write:
        ('set(cache["tmp2"], Len(text))', "cache_tmp2", [15, 1, None]),
    ]
    for stmt, col, expected in cases:
        out = parse_statement(stmt).apply(t)
        got = out.column(col).to_pylist()
        if expected is not None:
            assert got == expected, (stmt, got)
        else:
            import hashlib

            assert got[0] == hashlib.sha256(b"tool-x").hexdigest()


def test_cache_across_statements_and_cleanup():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.transform import (
        TransformStage,
    )

    t = tbl(text=["abc", "defg"])
    stage = TransformStage([
        'set(cache["n"], Len(text))',
        'set(attributes["doubled"], cache["n"] * 2)',
    ])
    out = stage(t)
    assert out.column("attr_doubled").to_pylist() == [6, 8]
    assert not any(c.startswith("cache_") for c in out.column_names)  # dropped


def test_grok_custom_definitions():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import GrokParser

    p = GrokParser("%{MYID:req_id} %{GREEDYDATA:rest}",
                   definitions={"MYID": r"req-\d{4}"})
    t = tbl(text=["req-0042 hello there", "nope"])
    out = p(t)
    assert out.column("attr_req_id").to_pylist() == ["req-0042", None]
    assert out.column("parse_failure").to_pylist() == [False, True]


def test_kv_parser_custom_separators():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        KeyValueParser,
    )

    t = tbl(text=["a:1;b:2", "b:9"])
    out = KeyValueParser(["a", "b"], kv_sep=":", pair_sep=";")(t)
    assert out.column("attr_a").to_pylist() == ["1", None]
    assert out.column("attr_b").to_pylist() == ["2", "9"]


def test_severity_alias_boundaries():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        SeverityParser,
    )

    t = pa.table({"attr_level": ["critical", "emerg", "notice", "err", "severe",
                                 "trace4", "fatal4"]})
    out = SeverityParser()(t)
    assert out.column("severity_number").to_pylist() == [21, 24, 10, 17, 17, 4, 24]


def test_where_with_converters_both_sides():
    t = tbl(text=["short", "a much longer text here"], n=pa.array([5, 1], pa.int64()))
    out = parse_statement(
        'set(attributes["flag"], true) where Len(text) > n * 2').apply(t)
    assert out.column("attr_flag").to_pylist() == [None, True]


def test_sha512_and_duration_components():
    t = tbl(s=["abc"])
    out = parse_statement('set(attributes["h"], SHA512(s))').apply(t)
    import hashlib

    assert out.column("attr_h").to_pylist() == [hashlib.sha512(b"abc").hexdigest()]
    # duration components match Go time.Duration accessors (func_hours.go etc.)
    t2 = tbl(x=[1])
    out = parse_statement('set(attributes["h"], Hours(Duration("90m")))').apply(t2)
    assert out.column("attr_h").to_pylist() == [1.5]
    out = parse_statement('set(attributes["m"], Minutes(Duration("90m")))').apply(t2)
    assert out.column("attr_m").to_pylist() == [90.0]
    out = parse_statement('set(attributes["s"], Seconds(Duration("1500ms")))').apply(t2)
    assert out.column("attr_s").to_pylist() == [1.5]
    out = parse_statement('set(attributes["ms"], Milliseconds(Duration("1500ms")))').apply(t2)
    assert out.column("attr_ms").to_pylist() == [1500]
    out = parse_statement('set(attributes["us"], Microseconds(Duration("2ms")))').apply(t2)
    assert out.column("attr_us").to_pylist() == [2000]
    out = parse_statement('set(attributes["ns"], Nanoseconds(Duration("2us")))').apply(t2)
    assert out.column("attr_ns").to_pylist() == [2000]


def test_sort_converter():
    t = tbl(s=["b,a,c", "z,x", ""])
    out = parse_statement('set(attributes["sorted"], Sort(Split(s, ","), "asc"))').apply(t)
    assert out.column("attr_sorted").to_pylist() == [["a", "b", "c"], ["x", "z"], [""]]
    out = parse_statement('set(attributes["sorted"], Sort(Split(s, ","), "desc"))').apply(t)
    assert out.column("attr_sorted").to_pylist() == [["c", "b", "a"], ["z", "x"], [""]]


def test_to_key_value_string():
    t = tbl(text=["x"], attr_b=["2"], attr_a=["1"])
    out = parse_statement(
        'set(attributes["kv"], ToKeyValueString(attributes, "=", " ", true))').apply(t)
    assert out.column("attr_kv").to_pylist() == ["a=1 b=2 kv="] or \
        out.column("attr_kv").to_pylist() == ["a=1 b=2"]
    # null-valued keys are skipped
    t2 = tbl(text=["x", "y"], attr_a=["1", None], attr_b=[None, "2"])
    out = parse_statement(
        'set(attributes["kv"], ToKeyValueString(attributes, ":", ",", true))').apply(t2)
    assert out.column("attr_kv").to_pylist() == ["a:1", "b:2"]


def test_slice_to_map():
    t = tbl(s=['[{"name":"a","value":1},{"name":"b","value":2}]', "junk"])
    out = parse_statement(
        'set(attributes["m"], SliceToMap(ParseJSON(s), ["name"], ["value"]))'
    ).apply(t)
    vals = out.column("attr_m").to_pylist()
    assert dict(vals[0]) == {"a": "1", "b": "2"}
    assert vals[1] is None


def test_xml_edit_family():
    doc = "<a><b>1</b><c k=\"v\">2</c></a>"
    t = tbl(x=[doc, "not xml"])
    out = parse_statement('set(attributes["g"], GetXML(x, "//b"))').apply(t)
    assert out.column("attr_g").to_pylist() == ["<b>1</b>", None]
    out = parse_statement(
        'set(attributes["i"], InsertXML(x, "/a", "<d>3</d>"))').apply(t)
    assert "<d>3</d>" in out.column("attr_i").to_pylist()[0]
    out = parse_statement('set(attributes["r"], RemoveXML(x, "//b"))').apply(t)
    assert "<b>" not in out.column("attr_r").to_pylist()[0]
    out = parse_statement('set(attributes["r"], RemoveXML(x, "//c/@k"))').apply(t)
    assert 'k="v"' not in out.column("attr_r").to_pylist()[0]
    assert "<c>2</c>" in out.column("attr_r").to_pylist()[0]


def test_registry_function_count():
    # converter-tail completion: the registry now carries the documented
    # function surface (pkg/ottl/ottlfuncs/README.md lists ~80)
    assert len(registered_functions()) >= 75


def test_neq_null_semantics():
    # compare.go invalidComparison / LANGUAGE.md: nil != "v" is TRUE; the
    # columnar engine must not fill null comparison results with False
    # for '!=' (round-2 advice)
    t = tbl(attr_x=["a", None, "v"], attr_y=[None, None, "v"])
    m = parse_condition('attributes["x"] != "v"')(t)
    assert m.to_pylist() == [True, True, False]
    m = parse_condition('attributes["x"] == "v"')(t)
    assert m.to_pylist() == [False, False, True]
    # column-vs-column: null==null is true, null!=valid is true
    m = parse_condition('attributes["x"] == attributes["y"]')(t)
    assert m.to_pylist() == [False, True, True]
    m = parse_condition('attributes["x"] != attributes["y"]')(t)
    assert m.to_pylist() == [True, False, False]
    # orderings on null stay false
    m = parse_condition('attributes["x"] > "a"')(t)
    assert m.to_pylist() == [False, False, True]


def test_int_double_invalid_strings_null_per_row():
    # one bad value must not revert the statement for the whole batch
    # (round-2 advice: results were batch-boundary-dependent)
    t = tbl(s=["12", "abc", "3.9", None, "7"])
    out = parse_statement('set(attributes["i"], Int(s))').apply(t, "ignore")
    assert out.column("attr_i").to_pylist() == [12, None, 3, None, 7]
    out = parse_statement('set(attributes["d"], Double(s))').apply(t, "ignore")
    assert out.column("attr_d").to_pylist() == [12.0, None, 3.9, None, 7.0]


def test_error_mode_split_retry_per_record():
    from open_telemetry_opentelemetry_collector_contrib_ray.functions.registry import (
        register_row_converter,
    )

    def boomer(s):
        if s == "boom":
            raise ValueError("boom")
        return s.upper()

    register_row_converter("TestBoom", boomer)
    t = tbl(s=["a", "boom", "c", "d"])
    stmt = parse_statement('set(attributes["u"], TestBoom(s))')
    # propagate mode raises
    with pytest.raises(Exception):
        stmt.apply(t, "propagate")
    # ignore mode: only the failing record is left untouched
    out = stmt.apply(t, "ignore")
    assert out.column("attr_u").to_pylist() == ["A", None, "C", "D"]
    assert out.column("s").to_pylist() == ["a", "boom", "c", "d"]


UA_CASES = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/120.0.6099.109 Safari/537.36",
     "Chrome", "120.0.6099", "Windows 10.0"),
    ("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
     "Edge", "120.0.2210", "Windows 10.0"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/17.1 Safari/605.1.15",
     "Safari", "17.1", "Mac OS X 10.15.7"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) "
     "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 "
     "Safari/604.1", "Mobile Safari", "17.1", "iOS 17.1"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) "
     "AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/120.0.6099.119 "
     "Mobile/15E148 Safari/604.1", "Chrome Mobile iOS", "120.0.6099", "iOS 17.1"),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
     "Firefox", "115.0", "Linux"),
    ("Mozilla/5.0 (Windows NT 10.0; WOW64; Trident/7.0; rv:11.0) like Gecko",
     "IE", "11.0", "Windows 10.0"),
    ("curl/8.4.0", "curl", "8.4.0", None),
    ("Mozilla/5.0 (Linux; Android 13; SM-G991B) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36 "
     "OPR/76.2.4027.73374", "Opera", "76.2.4027", "Android 13"),
    ("Googlebot/2.1 (+http://www.google.com/bot.html)", "Googlebot", "2.1", None),
    ("weird thing", "Other", None, None),
]


def test_user_agent_rule_table():
    """ua-parser-ordered rule table: forks/embedded tokens before the
    engines they embed (func_useragent.go returns the semconv
    name/version/original triple; os is this engine's extension)."""
    t = tbl(ua=[c[0] for c in UA_CASES])
    out = parse_statement('set(attributes["p"], UserAgent(ua))').apply(t)
    oss = parse_statement('set(attributes["os"], UserAgentOS(ua))') \
        .apply(t).column("attr_os").to_pylist()
    rows = out.column("attr_p").to_pylist()
    for (ua, name, ver, os_), row, got_os in zip(UA_CASES, rows, oss):
        assert row["user_agent.name"] == name, (ua, row)
        assert row["user_agent.version"] == ver, (ua, row)
        assert got_os == os_, (ua, got_os)
        assert row["user_agent.original"] == ua


def test_final_converter_set():
    import os

    os.environ["GRAFT_FIXED_NOW"] = "1700000000000000"
    try:
        t = tbl(x=[1, 2])
        out = parse_statement('set(attributes["now"], Now())').apply(t)
        v = out.column("attr_now").to_pylist()
        assert v[0] == v[1] and v[0].year == 2023
    finally:
        del os.environ["GRAFT_FIXED_NOW"]
    t = tbl(sec=pa.array([1700000000, 0], pa.int64()),
            ns=pa.array([500_000_000, 0], pa.int64()))
    out = parse_statement('set(attributes["t"], Unix(sec, ns))').apply(t)
    v = out.column("attr_t").to_pylist()
    assert v[0].microsecond == 500000 and v[1].year == 1970
    # TraceID/SpanID byte-list constructors -> hex (func_trace_id.go)
    out = parse_statement(
        'set(attributes["tid"], TraceID([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,255]))'
    ).apply(tbl(x=[1]))
    assert out.column("attr_tid").to_pylist() == ["000102030405060708090a0b0c0d0eff"]
    out = parse_statement(
        'set(attributes["sid"], SpanID([1,2,3,4,5,6,7,8]))').apply(tbl(x=[1]))
    assert out.column("attr_sid").to_pylist() == ["0102030405060708"]
    # IsRootSpan: empty/null parent span id
    t = tbl(parent_span_id=["", None, "0102030405060708"])
    m = parse_condition("IsRootSpan()")(t)
    assert m.to_pylist() == [True, True, False]
    # XML conversions
    t = tbl(x=['<a foo="bar">hi<b>1</b>tail</a>'])
    out = parse_statement(
        'set(attributes["e"], ConvertAttributesToElementsXML(x))').apply(t)
    s = out.column("attr_e").to_pylist()[0]
    assert "<foo>bar</foo>" in s and 'foo="bar"' not in s
    out = parse_statement(
        'set(attributes["w"], ConvertTextToElementsXML(x))').apply(t)
    s = out.column("attr_w").to_pylist()[0]
    assert "<value>hi</value>" in s and "<value>tail</value>" in s


def test_error_mode_data_independent_error_probes_once():
    """An unknown function fails on ANY slice — ignore mode must return
    the batch untouched after one empty-slice probe, not recurse through
    O(2n) failing sub-applies (code-review finding)."""
    t = tbl(s=[str(i) for i in range(512)])
    stmt = parse_statement('set(attributes["x"], NoSuchFn(s))')
    calls = {"n": 0}
    orig = type(stmt)._apply_once

    def counting(self, table):
        calls["n"] += 1
        return orig(self, table)

    type(stmt)._apply_once = counting
    try:
        out = stmt.apply(t, "ignore")
    finally:
        type(stmt)._apply_once = orig
    assert out is t  # untouched
    assert calls["n"] <= 3  # whole batch + empty-slice probe
