"""Verbatim port of the value-parsing cases from
pkg/stanza/operator/parser/keyvalue/parser_test.go (TestParser table +
TestParserStringFailure/TestParserEmptyInput) against the engine's
parseutils pair splitter (functions/registry.py _parseutils_split +
_parseutils_kv_pairs — the shared backend of the stanza
key_value_parser and OTTL ParseKeyValue).  Entry-field routing cases
(parse-from/parse-to) exercise stanza's entry model, not the pair
grammar, and are covered by the column-oriented KeyValueParser tests
instead."""

import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.functions.registry import (
    _parseutils_kv_pairs,
    _parseutils_split,
)


def kv(s: str, delimiter: str = "=", pair_delimiter: str = " ") -> dict:
    return _parseutils_kv_pairs(_parseutils_split(s, pair_delimiter),
                                delimiter)


# (name, body, delimiter, pair_delimiter, expected | None for error) —
# parser_test.go TestParser, value cases only
CASES = [
    ("simple", "name=stanza age=2", "=", " ",
     {"name": "stanza", "age": "2"}),
    ("user-agent",
     'requestClientApplication="Mozilla/5.0 (Windows NT 6.1; WOW64; '
     'rv:40.0) Gecko/20100101 Firefox/40.0"', "=", " ",
     {"requestClientApplication":
      "Mozilla/5.0 (Windows NT 6.1; WOW64; rv:40.0) Gecko/20100101 "
      "Firefox/40.0"}),
    ("double-quotes-removed", 'name="stanza" age=2', "=", " ",
     {"name": "stanza", "age": "2"}),
    ("single-quotes-removed", "description='stanza deployment number 5' x=y",
     "=", " ", {"description": "stanza deployment number 5", "x": "y"}),
    ("double-quotes-spaces-removed", 'name=" stanza " age=2', "=", " ",
     {"name": "stanza", "age": "2"}),
    ("leading-and-trailing-space", '" name "=" stanza " age=2', "=", " ",
     {"name": "stanza", "age": "2"}),
    ("delimiter", 'name|" stanza " age|2     key|value', "|", " ",
     {"name": "stanza", "age": "2", "key": "value"}),
    ("double-delimiter", 'name==" stanza " age==2     key==value', "==", " ",
     {"name": "stanza", "age": "2", "key": "value"}),
    ("pair-delimiter", "name=stanza|age=2     | key=value", "=", "|",
     {"name": "stanza", "age": "2", "key": "value"}),
    ("pair-delimiter-multiline", "name=stanza^\nage=2^\nkey=value",
     "=", "^\n", {"name": "stanza", "age": "2", "key": "value"}),
    ("large",
     'name=stanza age=1 job="software engineering" location="grand '
     'rapids michigan" src="10.3.3.76" dst=172.217.0.10 protocol=udp '
     "sport=57112 dport=443 translated_src_ip=96.63.176.3 "
     "translated_port=57112", "=", " ",
     {"age": "1", "dport": "443", "dst": "172.217.0.10",
      "job": "software engineering",
      "location": "grand rapids michigan", "name": "stanza",
      "protocol": "udp", "sport": "57112", "src": "10.3.3.76",
      "translated_port": "57112", "translated_src_ip": "96.63.176.3"}),
    ("dell-sonic-wall",
     'id=LVM_Sonicwall sn=22255555 time="2021-09-22 16:30:31" '
     "fw=14.165.177.10 pri=6 c=1024 gcat=2 m=97 "
     'msg="Web site hit" srcMac=6c:0b:84:3f:fa:63 '
     "src=192.168.50.2:52006:X0 srcZone=LAN "
     "natSrc=14.165.177.10:58457 dstMac=08:b2:58:46:30:54 "
     "dst=15.159.150.83:443:X1 dstZone=WAN natDst=15.159.150.83:443 "
     'proto=tcp/https sent=1422 rcvd=5993 rule="6 (LAN->WAN)" '
     "app=48 dstname=example.space.dev.com arg=/ code=27 "
     'Category="Information Technology/Computers" '
     'note="Policy: a0, Info: 888 " n=3412158', "=", " ",
     {"id": "LVM_Sonicwall", "sn": "22255555",
      "time": "2021-09-22 16:30:31", "fw": "14.165.177.10", "pri": "6",
      "c": "1024", "gcat": "2", "m": "97", "msg": "Web site hit",
      "srcMac": "6c:0b:84:3f:fa:63", "src": "192.168.50.2:52006:X0",
      "srcZone": "LAN", "natSrc": "14.165.177.10:58457",
      "dstMac": "08:b2:58:46:30:54", "dst": "15.159.150.83:443:X1",
      "dstZone": "WAN", "natDst": "15.159.150.83:443",
      "proto": "tcp/https", "sent": "1422", "rcvd": "5993",
      "rule": "6 (LAN->WAN)", "app": "48",
      "dstname": "example.space.dev.com", "arg": "/", "code": "27",
      "Category": "Information Technology/Computers",
      "note": "Policy: a0, Info: 888", "n": "3412158"}),
    ("missing-delimiter", "test text", "=", " ", None),
    ("value-contains-delimiter", "test=text=abc", "=", " ",
     {"test": "text=abc"}),
    ("quoted-value-contains-whitespace-delimiter",
     'msg="Message successfully sent at 2023-12-04 06:47:31.204222276 '
     '+0000 UTC m=+5115.932279346"', "=", " ",
     {"msg": "Message successfully sent at 2023-12-04 "
             "06:47:31.204222276 +0000 UTC m=+5115.932279346"}),
    ("multiple-values-contain-delimiter", 'one=1=i two="2=ii" three=3=iii',
     "=", " ", {"one": "1=i", "two": "2=ii", "three": "3=iii"}),
    ("custom pair delimiter in quoted value", 'a=b_c="d_e"', "=", "_",
     {"a": "b", "c": "d_e"}),
    ("embedded double quotes in single quoted value",
     "a=b c='this is a \"co ol\" value'", "=", " ",
     {"a": "b", "c": 'this is a "co ol" value'}),
    ("embedded double quotes end single quoted value",
     "a=b c='this is a \"co ol\"'", "=", " ",
     {"a": "b", "c": 'this is a "co ol"'}),
    ("leading and trailing pair delimiter w/o quotes",
     "   k1=v1   k2==v2       k3=v3= ", "=", " ",
     {"k1": "v1", "k2": "=v2", "k3": "v3="}),
    ("complicated delimiters", "k1@*v1_!_k2@**v2_!__k3@@*v3__",
     "@*", "_!_", {"k1": "v1", "k2": "*v2", "_k3@": "v3__"}),
    ("unclosed quotes", "k1='v1' k2='v2", "=", " ", None),
    ("containerd output",
     'time="2024-11-01T12:38:17.992190505Z" level=warning '
     'msg="cleanup warnings time=\'2024-11-01T12:38:17Z\' level=debug '
     'msg=\\"starting signal loop\\" namespace=moby-10000.10000 '
     'pid=1608080 runtime=io.containerd.runc.v2" '
     "namespace=moby-10000.10000", "=", " ",
     {"time": "2024-11-01T12:38:17.992190505Z", "level": "warning",
      "msg": "cleanup warnings time='2024-11-01T12:38:17Z' level=debug "
             'msg=\\"starting signal loop\\" namespace=moby-10000.10000 '
             "pid=1608080 runtime=io.containerd.runc.v2",
      "namespace": "moby-10000.10000"}),
]


@pytest.mark.parametrize("name,body,delim,pair_delim,expect",
                         CASES, ids=[c[0] for c in CASES])
def test_keyvalue_parser_table(name, body, delim, pair_delim, expect):
    if expect is None:
        with pytest.raises(ValueError):
            kv(body, delim, pair_delim)
    else:
        assert kv(body, delim, pair_delim) == expect


def test_parser_string_failure_message():
    # TestParserStringFailure: the error names the unsplittable pair
    with pytest.raises(ValueError, match="cannot split 'invalid' into 2"):
        kv("invalid")


def test_ottl_parse_key_value_statement_end_to_end():
    # the same grammar through the OTTL surface (func_parse_key_value.go)
    import pyarrow as pa

    from open_telemetry_opentelemetry_collector_contrib_ray.functions.ast import (
        parse_statement,
    )

    t = pa.table({"text": ['name="stanza" age=2']})
    out = parse_statement(
        'merge_maps(attributes, ParseKeyValue(text), "upsert")').apply(t)
    assert out.column("attr_name").to_pylist() == ["stanza"]
    assert out.column("attr_age").to_pylist() == ["2"]

    # config-validation parity: empty/equal delimiters reject
    for stmt in ('ParseKeyValue(text, "")',
                 'ParseKeyValue(text, "=", "")',
                 'ParseKeyValue(text, "!", "!")'):
        with pytest.raises(ValueError):
            parse_statement(f'set(attributes["kv"], {stmt})').apply(t)
