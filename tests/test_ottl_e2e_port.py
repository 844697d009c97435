"""Conformance cases ported 1:1 from the reference's end-to-end OTTL
suite (/root/reference/pkg/ottl/e2e/e2e_test.go): each statement runs
through the columnar engine on a 1-row batch and must set
attributes["test"] to the reference's expected value.

Input record mirrors constructLogTransformContext where a case reads
from it (http.method = 'get', flags = 'A|B|C')."""

import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.functions.ast import (
    parse_statement,
)


def _input() -> pa.Table:
    return pa.table({
        "text": ["operationB"],
        "attr_http.method": ["get"],
        "attr_http.path": ["/health"],
        "attr_flags": ["A|B|C"],
        "attr_total.string": ["123456789"],
    })


# (statement, expected value of attributes["test"]) — expectations are
# the reference's `want` blocks (e2e_test.go:330-860), not re-derived.
CASES = [
    ('set(attributes["test"], Base64Decode("cGFzcw=="))', "pass"),
    ('set(attributes["test"], Decode("cGFzcw==", "base64"))', "pass"),
    ('set(attributes["test"], Concat(["A","B"], ":"))', "A:B"),
    ('set(attributes["test"], ConvertCase(attributes["http.method"], "upper"))',
     "GET"),
    ('set(attributes["test"], ConvertCase("PASS", "lower"))', "pass"),
    ('set(attributes["test"], ConvertCase("fooBar", "snake"))', "foo_bar"),
    ('set(attributes["test"], Double(1.0))', 1.0),
    ('set(attributes["test"], Double("1"))', 1.0),
    ('set(attributes["test"], Double(1))', 1.0),
    ('set(attributes["test"], FNV("pass"))', 266877920130663416),
    ('set(attributes["test"], Format("%03d-%s", [7, "test"]))', "007-test"),
    ('set(attributes["test"], Hours(Duration("90m")))', 1.5),
    ('set(attributes["test"], InsertXML("<a></a>", "/a", "<b></b>"))',
     "<a><b></b></a>"),
    ('set(attributes["test"], Int(1.0))', 1),
    ('set(attributes["test"], Int("1"))', 1),
    ('set(attributes["test"], Int(1))', 1),
    ('set(attributes["test"], GetXML("<a><b>1</b><c><b>2</b></c></a>", "/a//b"))',
     "<b>1</b><b>2</b>"),
    ('set(attributes["test"], Hex(1.0))', "3ff0000000000000"),
    ('set(attributes["test"], Hex(true))', "01"),
    ('set(attributes["test"], Hex(12))', "000000000000000c"),
    ('set(attributes["test"], Hex("12"))', "3132"),
    ('set(attributes["test"], "pass") where IsMatch("aa123bb", "\\\\d{3}")',
     "pass"),
    ('set(attributes["test"], Log(1))', 0.0),
    ('set(attributes["test"], MD5("pass"))',
     "1a1dc91c907325c69271ddf0c944bc72"),
    ('set(attributes["test"], Microseconds(Duration("1ms")))', 1000),
    ('set(attributes["test"], Milliseconds(Duration("1s")))', 1000),
    ('set(attributes["test"], Minutes(Duration("1h")))', 60.0),
    ('set(attributes["test"], Nanoseconds(Duration("1ms")))', 1000000),
    ('set(attributes["test"], RemoveXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>", "/Log/Message"))',
     '<Log id="1"></Log>'),
    ('set(attributes["test"], Seconds(Duration("1m")))', 60.0),
    ('set(attributes["test"], SHA1("pass"))',
     "9d4e1e23bd5b727046a9e3b4b7db57bd8d6ee684"),
    ('set(attributes["test"], SHA256("pass"))',
     "d74ff0ee8da3b9806b18c877dbf29bbde50b5bd8e4dad7a3a725000feb82e8f1"),
    ('set(attributes["test"], SHA512("pass"))',
     "5b722b307fce6c944905d132691d5e4a2214b7fe92b738920eb3fce3a90420a1"
     "9511c3010a0e7712b054daef5b57bad59ecbd93b3280f210578f547f4aed4d25"),
    ('set(attributes["test"], Substring("pass", 0, 2))', "pa"),
    ('set(attributes["test"], Sort([3, 6, 9], "desc"))', [9, 6, 3]),
    ('set(attributes["test"], Sort([true, false, false]))',
     [False, False, True]),
]


@pytest.mark.parametrize("statement,expected", CASES,
                         ids=[c[0][:60] for c in CASES])
def test_e2e_port(statement, expected):
    out = parse_statement(statement).apply(_input())
    got = out.column("attr_test").to_pylist()[0]
    if isinstance(expected, float):
        assert got == pytest.approx(expected)
    else:
        assert got == expected


def test_e2e_extract_patterns_map():
    # e2e_test.go:423-427: ExtractPatterns returns a map of named groups
    out = parse_statement(
        'set(attributes["test"], ExtractPatterns("aa123bb", "(?P<numbers>\\\\d+)"))'
    ).apply(_input())
    got = out.column("attr_test").to_pylist()[0]
    assert dict(got) == {"numbers": "123"}


def test_hex_encode_out_of_int64_wraps():
    # ADVICE regression: ints outside int64 mask to 64 bits instead of
    # raising struct.error (an unexpected exception type for OTTL)
    from open_telemetry_opentelemetry_collector_contrib_ray.functions.registry import (
        hex_encode,
    )

    assert hex_encode(2**64 + 12) == "000000000000000c"
    assert hex_encode(-1) == "ffffffffffffffff"
    assert hex_encode(12) == "000000000000000c"
    assert hex_encode(True) == "01"
    assert hex_encode(None) is None
