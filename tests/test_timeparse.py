"""Reference time-parsing tables, ported verbatim:
- ctimefmt_test.go TestParse / TestZulu / TestValidate
- stanza time parser_test.go gotime case table + epoch case table
- timeutils parser_test.go Test_setTimestampYear
All expectations converted to UTC instants (timestamp us)."""

import datetime as dt

import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.timeparse import (
    gotime_to_ctime, parse_time_column, set_timestamp_year, validate_ctime,
    validate_gotime)


def _us(y, mo, d, h, mi, s, us=0):
    return dt.datetime(y, mo, d, h, mi, s, us)


def _parse(layout_type, layout, values):
    arr = parse_time_column(pa.array(values), layout_type, layout)
    return arr.to_pylist()


def test_ctimefmt_parse():
    # ctimefmt_test.go TestParse: format1/value1, format2/value2
    assert _parse("strptime", "%Y-%m-%d %H:%M:%S.%f",
                  ["2019-01-02 15:04:05.666666"]) == \
        [_us(2019, 1, 2, 15, 4, 5, 666666)]
    assert _parse("strptime", "%Y-%m-%d %l:%M:%S.%L %P, %a",
                  ["2019-01-02 3:04:05.666 pm, Wed"]) == \
        [_us(2019, 1, 2, 15, 4, 5, 666000)]


def test_ctimefmt_zulu():
    # ctimefmt_test.go TestZulu: all three parse to the same instant
    got = _parse("strptime", "%Y-%m-%dT%H:%M:%S.%L%z",
                 ["2019-01-02T15:04:05.666666Z",
                  "2019-01-02T15:04:05.666666-0000",
                  "2019-01-02T15:04:05.666666+0000"])
    assert got == [_us(2019, 1, 2, 15, 4, 5, 666666)] * 3


def test_ctimefmt_validate():
    # ctimefmt_test.go TestValidate
    validate_ctime("%Y-%m-%d %H:%M:%S.%f")
    with pytest.raises(ValueError, match="fractional"):
        validate_ctime("%Y-%m-%d-%H-%M-%S:%L")
    with pytest.raises(ValueError, match="decimals"):
        validate_ctime("2006-%m-%d-%H-%M-%S:%L")
    with pytest.raises(ValueError, match="unsupported"):
        validate_ctime("%C-%m-%d-%H-%M-%S.%L")


def test_validate_gotime():
    # timeutils parser_test.go TestValidateGotime
    validate_gotime("2006-01-02 15:04:05.999999")
    validate_gotime("2006-01-02 15:04:05,999999")
    with pytest.raises(ValueError, match="fractional"):
        validate_gotime("2006-01-02 15:04:05:999999")


GOTIME_TABLE = [
    # (name, sample, gotime layout, expected UTC instant) — stanza
    # time/parser_test.go TestTimeParser, locations resolved to offsets
    ("unix", "Mon Jan 2 15:04:05 UTC 2006",
     "Mon Jan 2 15:04:05 MST 2006", _us(2006, 1, 2, 15, 4, 5)),
    ("unix-mst", "Mon Jan 2 15:04:05 MST 2006",
     "Mon Jan 2 15:04:05 MST 2006", _us(2006, 1, 2, 22, 4, 5)),
    ("unix-hst", "Mon Jan 2 15:04:05 HST 2006",
     "Mon Jan 2 15:04:05 MST 2006", _us(2006, 1, 3, 1, 4, 5)),
    ("almost-unix", "Mon Jan 02 15:04:05 MST 2006",
     "Mon Jan 02 15:04:05 MST 2006", _us(2006, 1, 2, 22, 4, 5)),
    ("kitchen-ish", "2020-06-09T15:39:58",
     "2006-01-02T15:04:05", _us(2020, 6, 9, 15, 39, 58)),
    ("countdown-ish", "2019-11-05 10:38:35.118 HST",
     "2006-01-02 15:04:05.999 MST", _us(2019, 11, 5, 20, 38, 35, 118000)),
    ("short-handed-values", "3/4/2018 11:52:29",
     "1/2/2006 15:04:05", _us(2018, 3, 4, 11, 52, 29)),
    ("tz-offset", "2019-11-27T09:34:32.901-1000",
     "2006-01-02T15:04:05.999-0700", _us(2019, 11, 27, 19, 34, 32, 901000)),
    ("tz-offset-colon", "2019-10-15T10:42:01.900436-10:00",
     "2006-01-02T15:04:05.999999-07:00",
     _us(2019, 10, 15, 20, 42, 1, 900436)),
    ("dashes", "22-JUL-2019 15:16:13",
     "02-Jan-2006 15:04:05", _us(2019, 7, 22, 15, 16, 13)),
    ("long-nanoseconds", "2019-03-08T18:41:12.152531115Z",
     "2006-01-02T15:04:05.999999999Z", _us(2019, 3, 8, 18, 41, 12, 152531)),
    ("apache-common", "05/Aug/2019:20:38:46 +0000",
     "02/Jan/2006:15:04:05 -0700", _us(2019, 8, 5, 20, 38, 46)),
    ("gotime-milli", "2020-12-16T21:43:28.391Z",
     "2006-01-02T15:04:05.999Z", _us(2020, 12, 16, 21, 43, 28, 391000)),
]


@pytest.mark.parametrize("name,sample,layout,expected", GOTIME_TABLE,
                         ids=[c[0] for c in GOTIME_TABLE])
def test_gotime_reference_table(name, sample, layout, expected):
    assert _parse("gotime", layout, [sample]) == [expected]


EPOCH_EXPECT = {
    "s": _us(2006, 1, 2, 15, 4, 5),
    "ms": _us(2006, 1, 2, 15, 4, 5, 123000),
    "us": _us(2006, 1, 2, 15, 4, 5, 123456),
    "ns": _us(2006, 1, 2, 15, 4, 5, 123456),  # truncated to us
}
EPOCH_TABLE = [
    # stanza time/parser_test.go TestTimeEpochs (string/int/float each)
    ("s", "1136214245"), ("s", 1136214245), ("s", 1136214245.0),
    ("ms", "1136214245123"), ("ms", 1136214245123),
    ("ms", 1136214245123.0),
    ("us", "1136214245123456"), ("us", 1136214245123456),
    ("us", 1136214245123456.0),
    ("ns", "1136214245123456789"), ("ns", 1136214245123456789),
]


@pytest.mark.parametrize("layout,sample", EPOCH_TABLE,
                         ids=[f"{l}-{type(s).__name__}"
                              for l, s in EPOCH_TABLE])
def test_epoch_reference_table(layout, sample):
    assert _parse("epoch", layout, [sample]) == [EPOCH_EXPECT[layout]]


def test_epoch_fractional_layouts():
    # s.ms / s.us / s.ns, string keeps exactness, int drops subseconds
    assert _parse("epoch", "s.ms", ["1136214245.123"]) == \
        [_us(2006, 1, 2, 15, 4, 5, 123000)]
    assert _parse("epoch", "s.us", ["1136214245.123456"]) == \
        [_us(2006, 1, 2, 15, 4, 5, 123456)]
    assert _parse("epoch", "s.ns", ["1136214245.123456789"]) == \
        [_us(2006, 1, 2, 15, 4, 5, 123456)]
    assert _parse("epoch", "s.ms", [1136214245]) == \
        [_us(2006, 1, 2, 15, 4, 5)]
    assert _parse("epoch", "s.ms", [1136214245.123]) == \
        [_us(2006, 1, 2, 15, 4, 5, 123000)]
    with pytest.raises(ValueError):
        _parse("epoch", "m", ["1"])


def test_set_timestamp_year_reference_cases():
    # timeutils parser_test.go Test_setTimestampYear
    def run(now, ts):
        now_us = int(now.timestamp() * 1e6)
        out = set_timestamp_year(
            pa.array([ts], pa.timestamp("us")), now_us)
        return out.to_pylist()[0]

    utc = dt.timezone.utc
    assert run(dt.datetime(2020, 6, 16, 3, 31, 34, tzinfo=utc),
               _us(1970, 6, 16, 3, 31, 34)) == _us(2020, 6, 16, 3, 31, 34)
    assert run(dt.datetime(2020, 1, 16, 3, 31, 34, tzinfo=utc),
               _us(1970, 1, 17, 3, 31, 34)) == _us(2020, 1, 17, 3, 31, 34)
    assert run(dt.datetime(2020, 1, 16, 3, 31, 34, tzinfo=utc),
               _us(1970, 1, 24, 3, 31, 34)) == _us(2019, 1, 24, 3, 31, 34)
    assert run(dt.datetime(2020, 1, 1, 3, 31, 34, tzinfo=utc),
               _us(1970, 12, 31, 3, 31, 34)) == _us(2019, 12, 31, 3, 31, 34)


def test_gotime_translation():
    assert gotime_to_ctime("2006-01-02T15:04:05Z") == "%Y-%m-%dT%H:%M:%SZ"
    assert gotime_to_ctime("02/Jan/2006:15:04:05 -0700") == \
        "%d/%b/%Y:%H:%M:%S %z"


def test_timeparser_stage_gotime_and_epoch_alias():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
        TimeParser)
    t = pa.table({"ts": ["05/Aug/2019:20:38:46 +0000"]})
    out = TimeParser("ts", layout_type="gotime",
                     layout="02/Jan/2006:15:04:05 -0700")(t)
    assert out.column("time").to_pylist() == [_us(2019, 8, 5, 20, 38, 46)]
    t2 = pa.table({"e": [1136214245]})
    out2 = TimeParser("e", layout_type="epoch_s")(t2)
    assert out2.column("time").to_pylist() == [_us(2006, 1, 2, 15, 4, 5)]


def test_parse_failure_yields_null():
    got = _parse("gotime", "2006-01-02T15:04:05",
                 ["not-a-time", "2020-06-09T15:39:58"])
    assert got == [None, _us(2020, 6, 9, 15, 39, 58)]


OTTL_TIME_TABLE = [
    # (input, ctime format, expected UTC instant) — verbatim from
    # pkg/ottl/ottlfuncs/func_time_test.go Test_Time (the cases without
    # location/locale arguments; time.Local == UTC here)
    ("2023-04-12", "%Y-%m-%d", _us(2023, 4, 12, 0, 0, 0)),
    ("11/11/11", "%d/%m/%y", _us(2011, 11, 11, 0, 0, 0)),
    ("02/04/2023", "%m/%d/%Y", _us(2023, 2, 4, 0, 0, 0)),
    ("July 31, 1993", "%B %d, %Y", _us(1993, 7, 31, 0, 0, 0)),
    ("Mar 14 2023 17:02:59", "%b %d %Y %H:%M:%S",
     _us(2023, 3, 14, 17, 2, 59)),
    ("Monday, May 01, 2023", "%A, %B %d, %Y", _us(2023, 5, 1, 0, 0, 0)),
    ("Sat, May 20, 2023", "%a, %b %d, %Y", _us(2023, 5, 20, 0, 0, 0)),
    ("Feb 15, 2023", "%b %d, %Y", _us(2023, 2, 15, 0, 0, 0)),
    ("2023-05-26 12:34:56 HST", "%Y-%m-%d %H:%M:%S %Z",
     _us(2023, 5, 26, 22, 34, 56)),
    ("2023-05-26T12:34:56 GMT", "%Y-%m-%dT%H:%M:%S %Z",
     _us(2023, 5, 26, 12, 34, 56)),
    # %z offset (+0000) wins over the %Z label (EST)
    ("2012-11-01T22:08:41+0000 EST", "%Y-%m-%dT%H:%M:%S%z %Z",
     _us(2012, 11, 1, 22, 8, 41)),
    ("1986-10-01T00:17:33 MST", "%Y-%m-%dT%H:%M:%S %Z",
     _us(1986, 10, 1, 7, 17, 33)),
    ("2022/01/01", "%Y/%m/%d", _us(2022, 1, 1, 0, 0, 0)),
]


@pytest.mark.parametrize("value,fmt,expected", OTTL_TIME_TABLE,
                         ids=[c[0] for c in OTTL_TIME_TABLE])
def test_ottl_time_reference_table(value, fmt, expected):
    from open_telemetry_opentelemetry_collector_contrib_ray.functions.ast import (
        parse_statement)
    t = pa.table({"text": [value]})
    fmt_lit = fmt.replace('"', '\\"')
    out = parse_statement(
        f'set(attributes["t"], Time(text, "{fmt_lit}"))').apply(t)
    assert out.column("attr_t").to_pylist() == [expected]


def test_ottl_time_mismatched_format_yields_null():
    from open_telemetry_opentelemetry_collector_contrib_ray.functions.ast import (
        parse_statement)
    t = pa.table({"text": ["11/11/11"]})
    out = parse_statement(
        'set(attributes["t"], Time(text, "%Y/%m/%d"))').apply(t)
    assert out.column("attr_t").to_pylist() == [None]
