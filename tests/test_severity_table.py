"""stanza severity table, ported verbatim from
pkg/stanza/operator/helper/severity_test.go TestSeverityParser
(entry.Error=17, Error2=18, Error3=19, Error4=20, Default=0/null)."""

import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
    SeverityParser)

ERROR, ERROR2, ERROR3, ERROR4 = 17, 18, 19, 20

SEVERITY_CASES = [
    # (name, sample, mapping, expected_number, expected_text_overwrite)
    ("unknown", "blah", None, None, None),
    ("error", "error", None, ERROR, "ERROR"),
    ("error2", "error2", None, ERROR2, "ERROR2"),
    ("error3", "error3", None, ERROR3, "ERROR3"),
    ("error4", "error4", None, ERROR4, "ERROR4"),
    ("error-capitalized", "Error", None, ERROR, "ERROR"),
    ("error-all-caps", "ERROR", None, ERROR, "ERROR"),
    ("custom-string", "NOOOOOOO", {"error": "NOOOOOOO"}, ERROR, "ERROR"),
    ("custom-string-caps-key", "NOOOOOOO", {"ErRoR": "NOOOOOOO"},
     ERROR, "ERROR"),
    ("custom-int", 1234, {"error": 1234}, ERROR, "ERROR"),
    ("mixed-list-string", "ThiS Is BaD",
     {"error": ["NOOOOOOO", "this is bad", 1234]}, ERROR, "ERROR"),
    ("custom-float64", 6.0, {"error": 6}, ERROR, "ERROR"),
    ("mixed-list-int", 1234,
     {"error": ["NOOOOOOO", "this is bad", 1234]}, ERROR, "ERROR"),
    ("numbered-level", "critical", {"error2": "critical"},
     ERROR2, "ERROR2"),
    ("override-standard", "error", {"error3": ["error"]},
     ERROR3, "ERROR3"),
    ("level-unfound", "not-in-the-list-but-thats-ok",
     {"error4": ["hey!", 1234]}, None, None),
    ("in-range", 123, {"error": {"min": 120, "max": 125}},
     ERROR, "ERROR"),
    ("in-range-min", 120, {"error": {"min": 120, "max": 125}},
     ERROR, "ERROR"),
    ("in-range-max", 125, {"error": {"min": 120, "max": 125}},
     ERROR, "ERROR"),
    ("out-of-range-min-minus", 119, {"error": {"min": 120, "max": 125}},
     None, None),
    ("out-of-range-max-plus", 126, {"error": {"min": 120, "max": 125}},
     None, None),
    ("range-out-of-order", 123, {"error": {"min": 125, "max": 120}},
     ERROR, "ERROR"),
    ("Http2xx-hit", 201, {"error": "2xx"}, ERROR, "ERROR"),
    ("Http2xx-miss", 301, {"error": "2xx"}, None, None),
    ("Http3xx-hit", 301, {"error": "3xx"}, ERROR, "ERROR"),
    ("Http4xx-hit", "404", {"error": "4xx"}, ERROR, "ERROR"),
    ("Http5xx-hit", 555, {"error": "5xx"}, ERROR, "ERROR"),
    ("Http-All", "301",
     {"debug": "2xx", "info": "3xx", "error": "4xx", "warn": "5xx"},
     9, "INFO"),
]


@pytest.mark.parametrize("name,sample,mapping,number,text",
                         SEVERITY_CASES,
                         ids=[c[0] for c in SEVERITY_CASES])
def test_severity_reference_table(name, sample, mapping, number, text):
    t = pa.table({"attr_level": [sample]})
    out = SeverityParser(mapping=mapping)(t)
    assert out.column("severity_number").to_pylist() == [number]
    assert out.column("severity_text").to_pylist() == [text]


@pytest.mark.parametrize(
    "name,sample,mapping,number",
    [(c[0], c[1], c[2], c[3]) for c in SEVERITY_CASES],
    ids=[c[0] for c in SEVERITY_CASES])
def test_severity_keep_raw_text(name, sample, mapping, number):
    # overwrite_text=False: the reference default — severity_text keeps
    # the raw input whether or not it matched (severity.go Parse)
    t = pa.table({"attr_level": [sample]})
    out = SeverityParser(mapping=mapping, overwrite_text=False)(t)
    assert out.column("severity_number").to_pylist() == [number]
    assert out.column("severity_text").to_pylist() == [str(sample)
                                                       if not isinstance(sample, float)
                                                       else "6"]
