"""RFC5424 syslog parser — case table ported verbatim from
pkg/stanza/operator/parser/syslog/data.go CreateCases (the RFC5424 /
RFC6587 entries) plus grammar edge cases from go-syslog semantics."""

import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.parse import (
    Rfc5424SyslogParser, _parse_sd)

SECURE_AUTH = (
    '<86>1 2015-08-05T21:58:59.693Z 192.168.2.132 SecureAuth0 23108 '
    'ID52020 [SecureAuth@27389 UserHostAddress="192.168.2.132" '
    'Realm="SecureAuth0" UserID="Tester2" PEN="27389"] '
    "Found the user for retrieving user's profile")
SECURE_AUTH_SD = {"SecureAuth@27389": {
    "PEN": "27389", "Realm": "SecureAuth0",
    "UserHostAddress": "192.168.2.132", "UserID": "Tester2"}}
SECURE_AUTH_MSG = "Found the user for retrieving user's profile"


def _sd_to_dict(v):
    if v is None:
        return None
    return {k: dict(inner) for k, inner in v}


def _row(out: pa.Table, i: int = 0) -> dict:
    return {c: out.column(c).to_pylist()[i] for c in out.column_names}


def test_rfc5424_secure_auth_case():
    # data.go "RFC5424" (data.go:199-238)
    out = Rfc5424SyslogParser()(pa.table({"text": [SECURE_AUTH]}))
    r = _row(out)
    assert r["attr_priority"] == 86
    assert r["attr_facility"] == 10
    assert r["attr_syslog_severity"] == 6
    assert r["attr_severity_text"] == "info"
    assert r["attr_version"] == 1
    assert r["attr_syslog_ts"] == "2015-08-05T21:58:59.693Z"
    assert r["attr_hostname"] == "192.168.2.132"
    assert r["attr_appname"] == "SecureAuth0"
    assert r["attr_proc_id"] == "23108"
    assert r["attr_msg_id"] == "ID52020"
    assert r["attr_message"] == SECURE_AUTH_MSG
    assert _sd_to_dict(r["attr_structured_data"]) == SECURE_AUTH_SD
    assert r["parse_failure"] is False


def test_rfc5424_skip_pri_absent():
    # data.go "RFC5424SkipPriAbsent": no <pri>, parses with the pri
    # fields dropped (parser.go shouldSkipPriorityValues)
    body = SECURE_AUTH[len("<86>"):]
    out = Rfc5424SyslogParser(allow_skip_pri_header=True)(
        pa.table({"text": [body]}))
    r = _row(out)
    assert r["attr_priority"] is None
    assert r["attr_facility"] is None
    assert r["attr_syslog_severity"] is None
    assert r["attr_severity_text"] is None
    assert r["attr_appname"] == "SecureAuth0"
    assert r["attr_message"] == SECURE_AUTH_MSG
    assert _sd_to_dict(r["attr_structured_data"]) == SECURE_AUTH_SD
    assert r["parse_failure"] is False


def test_rfc5424_skip_pri_present():
    # data.go "RFC5424SkipPriPresent": pri present -> kept
    body = "<123>" + SECURE_AUTH[len("<86>"):]
    out = Rfc5424SyslogParser(allow_skip_pri_header=True)(
        pa.table({"text": [body]}))
    r = _row(out)
    assert r["attr_priority"] == 123
    assert r["attr_facility"] == 15
    assert r["attr_severity_text"] == "err"


def test_rfc6587_octet_counting():
    # data.go "RFC6587 Octet Counting"
    body = "215 " + SECURE_AUTH
    assert len(SECURE_AUTH.encode()) == 215
    out = Rfc5424SyslogParser(enable_octet_counting=True)(
        pa.table({"text": [body]}))
    r = _row(out)
    assert r["attr_priority"] == 86
    assert r["attr_message"] == SECURE_AUTH_MSG
    assert _sd_to_dict(r["attr_structured_data"]) == SECURE_AUTH_SD


def test_rfc6587_octet_counting_preserves_space():
    # data.go RFC6587OctetCountingPreserveSpaceTest: message keeps the
    # leading and trailing spaces verbatim
    body = ("77 <86>1 2015-08-05T21:58:59.693Z 192.168.2.132 inactive "
            "- - -  partition is p2 ")
    out = Rfc5424SyslogParser(enable_octet_counting=True)(
        pa.table({"text": [body]}))
    r = _row(out)
    assert r["attr_appname"] == "inactive"
    assert r["attr_proc_id"] is None
    assert r["attr_msg_id"] is None
    assert r["attr_structured_data"] is None
    assert r["attr_message"] == " partition is p2 "
    assert r["attr_priority"] == 86 and r["attr_facility"] == 10


def test_rfc6587_non_transparent_framing_nul():
    # data.go "RFC6587 Non-Transparent-framing" (NUL trailer)
    body = SECURE_AUTH + "\x00"
    out = Rfc5424SyslogParser(non_transparent_framing_trailer="NUL")(
        pa.table({"text": [body]}))
    r = _row(out)
    assert r["attr_message"] == SECURE_AUTH_MSG
    assert _sd_to_dict(r["attr_structured_data"]) == SECURE_AUTH_SD


def test_rfc5424_nilvalues_and_no_message():
    out = Rfc5424SyslogParser()(pa.table({"text": [
        "<34>1 - - - - - -",                      # all nil, no msg
        "<34>1 2003-10-11T22:14:15.003Z host app - ID47 -",  # nil SD
    ]}))
    r0, r1 = _row(out, 0), _row(out, 1)
    assert r0["parse_failure"] is False
    assert r0["attr_syslog_ts"] is None and r0["attr_hostname"] is None
    assert r0["attr_message"] is None and r0["attr_structured_data"] is None
    assert r1["attr_msg_id"] == "ID47" and r1["attr_message"] is None


def test_rfc5424_sd_escapes():
    sd, msg = _parse_sd(
        '[ex@32473 quote="a \\"b\\"" brk="x\\]y" bs="c\\\\d"] tail msg')
    assert sd == {"ex@32473": {"quote": 'a "b"', "brk": "x]y",
                               "bs": "c\\d"}}
    assert msg == "tail msg"


def test_rfc5424_multiple_sd_elements():
    sd, msg = _parse_sd(
        '[a@1 k="v"][b@2 x="1" y="2"] m')
    assert sd == {"a@1": {"k": "v"}, "b@2": {"x": "1", "y": "2"}}
    assert msg == "m"


def test_rfc5424_error_rows_follow_on_error():
    t = pa.table({"text": [
        SECURE_AUTH,
        "no pri or header",
        "<34>0 - - - - - -",        # version 0 invalid
        "<192>1 - - - - - -",       # pri > 191
        "<34>1 - - - - - [unterminated",
    ]})
    out = Rfc5424SyslogParser()(t)
    assert out.column("parse_failure").to_pylist() == [
        False, True, True, True, True]
    dropped = Rfc5424SyslogParser(on_error="drop")(t)
    assert dropped.num_rows == 1


def test_rfc5424_builder_step():
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
        STEP_REGISTRY)
    stage = STEP_REGISTRY["syslog_parser"](
        {"type": "syslog_parser", "protocol": "rfc5424",
         "enable_octet_counting": True})
    out = stage(pa.table({"text": ["215 " + SECURE_AUTH]}))
    assert out.column("attr_appname").to_pylist() == ["SecureAuth0"]


def test_rfc5424_framing_conflict_rejected():
    with pytest.raises(ValueError):
        Rfc5424SyslogParser(enable_octet_counting=True,
                            non_transparent_framing_trailer="LF")
