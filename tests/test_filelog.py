"""fileconsumer-parity reader: split.go/trim.go port semantics, the
FileSplitter stage (encoding, gzip, nop, attrs, header sub-pipeline,
record numbers), and matcher ordering criteria.

Split expectations mirror /root/reference/pkg/stanza/split/split.go and
its split_test.go behavior table.
"""

import gzip
import os
import re

import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.sources.textlog import (
    FileSplitter,
    _line_end_split,
    _line_start_split,
    _newline_split,
    _trim_token,
    order_files,
    read_log_files,
)


# ------------------------------------------------------------- split ports

def test_newline_split_matches_scanlines():
    # NewlineSplitFunc: \n split, one trailing \r stripped, trailing
    # partial only on flush
    assert _newline_split("a\nb\r\nc\n", True) == ["a", "b", "c"]
    assert _newline_split("a\nb\nrest", False) == ["a", "b"]
    assert _newline_split("a\nb\nrest", True) == ["a", "b", "rest"]
    assert _newline_split("\na", True) == ["", "a"]
    assert _newline_split("", True) == []


def test_line_start_split_semantics():
    rx = re.compile(r"(?m)LOGSTART \d+ ")
    s = "LOGSTART 123 log1!\nLOGSTART 234 log2!\nLOGSTART 345 foo"
    # tokens run from one start match to the next; last flushes at EOF
    assert _line_start_split(s, rx, False, True) == [
        "LOGSTART 123 log1!\n", "LOGSTART 234 log2!\n", "LOGSTART 345 foo"]
    # without flush the tail is held (dropped in batch mode)
    assert _line_start_split(s, rx, False, False) == [
        "LOGSTART 123 log1!\n", "LOGSTART 234 log2!\n"]
    # preamble before the first match is its own token (never lost)
    s2 = "part that doesn't match\nLOGSTART 123 part that matches\n"
    assert _line_start_split(s2, rx, False, True) == [
        "part that doesn't match\n", "LOGSTART 123 part that matches\n"]
    # omit_pattern drops the matched start pattern from each token
    assert _line_start_split(s, rx, True, True) == [
        "log1!\n", "log2!\n", "foo"]
    # no match at all: flush emits everything
    assert _line_start_split("no starts here", rx, False, True) == [
        "no starts here"]
    assert _line_start_split("no starts here", rx, False, False) == []


def test_line_end_split_semantics():
    rx = re.compile(r"(?m)END")
    s = "log1 END log2 END tail"
    assert _line_end_split(s, rx, False, True) == [
        "log1 END", " log2 END", " tail"]
    assert _line_end_split(s, rx, False, False) == ["log1 END", " log2 END"]
    # omit_pattern: token is the content before the match
    assert _line_end_split(s, rx, True, True) == ["log1 ", " log2 ", " tail"]


def test_trim_modes():
    tok = " \t content\r\n"
    assert _trim_token(tok, False, False) == "content"
    assert _trim_token(tok, True, False) == " \t content"
    assert _trim_token(tok, False, True) == "content\r\n"
    assert _trim_token(tok, True, True) == tok


# ------------------------------------------------------- matcher ordering

def test_order_files_numeric_and_top_n(tmp_path):
    paths = []
    for n in (2, 10, 1):
        p = tmp_path / f"app-{n}.log"
        p.write_text("x\n")
        paths.append(str(p))
    crit = {"regex": r"app-(?P<n>\d+)\.log",
            "sort_by": [{"sort_type": "numeric", "regex_key": "n",
                         "ascending": False}],
            "top_n": 2}
    got = [os.path.basename(p) for p in order_files(sorted(paths), crit)]
    assert got == ["app-10.log", "app-2.log"]


# --------------------------------------------------------- FileSplitter

def _run_splitter(tmp_path, contents: dict[str, bytes], **kw) -> pa.Table:
    for name, body in contents.items():
        with open(tmp_path / name, "wb") as f:
            f.write(body)
    paths = sorted(str(tmp_path / n) for n in contents)
    batch = pa.table({"path": pa.array(paths, pa.string()),
                      "bytes": pa.array([open(p, "rb").read()
                                         for p in paths], pa.binary())})
    return FileSplitter(**kw)(batch)


def test_splitter_utf16_and_attrs(tmp_path):
    body = "alpha\nbeta\n".encode("utf-16-le")
    out = _run_splitter(tmp_path, {"a.log": body}, encoding="utf-16-le",
                        include_file_path=True,
                        include_file_record_number=True)
    assert out.column("text").to_pylist() == ["alpha", "beta"]
    assert out.column("attr_log.file.name").to_pylist() == ["a.log"] * 2
    assert out.column("attr_log.file.path").to_pylist()[0].endswith("a.log")
    assert out.column("attr_log.file.record_number").to_pylist() == [1, 2]


def test_splitter_gzip_auto(tmp_path):
    out = _run_splitter(tmp_path, {"a.log.gz": gzip.compress(b"x\ny\n")})
    assert out.column("text").to_pylist() == ["x", "y"]


def test_splitter_nop_encoding_chunks(tmp_path):
    out = _run_splitter(tmp_path, {"blob.bin": b"0123456789"},
                        encoding="nop", max_log_size=4)
    assert out.column("body").to_pylist() == [b"0123", b"4567", b"89"]


def test_splitter_max_log_size_truncates(tmp_path):
    out = _run_splitter(tmp_path, {"a.log": b"abcdefgh\nij\n"},
                        max_log_size=5)
    assert out.column("text").to_pylist() == ["abcde", "ij"]


def test_splitter_multiline_with_trim(tmp_path):
    body = (b"2024-01-01T00:00:00Z ERROR boom\n"
            b"    at f1 (line 1)\n"
            b"2024-01-01T00:00:01Z INFO fine\n")
    out = _run_splitter(tmp_path, {"a.log": body},
                        line_start_pattern=r"^\d{4}-\d{2}-\d{2}T")
    toks = out.column("text").to_pylist()
    assert toks == ["2024-01-01T00:00:00Z ERROR boom\n    at f1 (line 1)",
                    "2024-01-01T00:00:01Z INFO fine"]


def test_splitter_header_pipeline(tmp_path):
    body = (b"#env=prod\n"
            b"#region=us-east\n"
            b"line one\n"
            b"line two\n")
    out = _run_splitter(
        tmp_path, {"a.log": body},
        header={"pattern": r"^#",
                "metadata_operators": [
                    {"type": "regex_parser",
                     "pattern": r"^#(?P<hkey>\w+)=(?P<hval>\S+)$"}]})
    # header lines consumed; their parsed attributes attach to all rows
    assert out.column("text").to_pylist() == ["line one", "line two"]
    assert out.column("attr_hkey").to_pylist() == ["region", "region"]
    assert out.column("attr_hval").to_pylist() == ["us-east", "us-east"]


def test_read_log_files_end_to_end(ray_session, tmp_path):
    (tmp_path / "a.log").write_text("one\ntwo\n")
    (tmp_path / "b.log").write_text("three\n")
    (tmp_path / "skip.txt").write_text("nope\n")
    ds = read_log_files(str(tmp_path / "*.log"),
                        exclude=str(tmp_path / "b*"),
                        include_file_record_number=True)
    rows = sorted(r["text"] for r in ds.take_all())
    assert rows == ["one", "two"]


def test_splitter_rejects_both_patterns():
    with pytest.raises(ValueError):
        FileSplitter(line_start_pattern="a", line_end_pattern="b")
    with pytest.raises(ValueError):
        FileSplitter(encoding="nop", line_start_pattern="a")


# --------- split_test.go case-table port (reference parity, verbatim
# inputs/expectations from pkg/stanza/split/split_test.go; flush=False
# models the streaming "wait for more data" state at end-of-buffer)

LINE_START_CASES = [
    ("OneLogSimple", r"LOGSTART \d+ ", False, False,
     "LOGSTART 123 log1LOGSTART 123 a", ["LOGSTART 123 log1"]),
    ("OneLogSimpleOmitPattern", r"LOGSTART \d+ ", True, False,
     "LOGSTART 123 log1LOGSTART 123 a", ["log1"]),
    ("TwoLogsSimple", r"LOGSTART \d+ ", False, False,
     "LOGSTART 123 log1 LOGSTART 234 log2 LOGSTART 345 foo",
     ["LOGSTART 123 log1 ", "LOGSTART 234 log2 "]),
    ("TwoLogsSimpleOmitPattern", r"LOGSTART \d+ ", True, False,
     "LOGSTART 123 log1 LOGSTART 234 log2 LOGSTART 345 foo",
     ["log1 ", "log2 "]),
    ("TwoLogsLineStart", r"^LOGSTART \d+ ", False, False,
     "LOGSTART 123 LOGSTART 345 log1\nLOGSTART 234 log2\nLOGSTART 345 foo",
     ["LOGSTART 123 LOGSTART 345 log1\n", "LOGSTART 234 log2\n"]),
    ("TwoLogsLineStartOmitPattern", r"^LOGSTART \d+ ", True, False,
     "LOGSTART 123 LOGSTART 345 log1\nLOGSTART 234 log2\nLOGSTART 345 foo",
     ["LOGSTART 345 log1\n", "log2\n"]),
    ("NoMatches", r"LOGSTART \d+ ", False, False,
     "file that has no matches in it", []),
    ("PrecedingNonMatches", r"LOGSTART \d+ ", False, False,
     "part that doesn't match LOGSTART 123 part that matchesLOGSTART 123 foo",
     ["part that doesn't match ", "LOGSTART 123 part that matches"]),
    ("MultipleMultilineLogs", r"^LOGSTART \d+ ", False, False,
     "LOGSTART 12 log1\t  \nLOGPART log1\nLOGPART log1\t   \n"
     "LOGSTART 17 log2\nLOGPART log2\nanother line\nLOGSTART 43 log5",
     ["LOGSTART 12 log1\t  \nLOGPART log1\nLOGPART log1\t   \n",
      "LOGSTART 17 log2\nLOGPART log2\nanother line\n"]),
    ("FlushAtEOFNoMatch", r"^LOGSTART \d+ ", False, True,
     "LOGPART log1\nLOGPART log1\t   \n",
     ["LOGPART log1\nLOGPART log1\t   \n"]),
    ("FlushAtEOFMatchThenNoMatch", r"^LOGSTART \d+ ", False, True,
     "LOGSTART 12 log1\t  \nLOGPART log1\nLOGPART log1\t   \n"
     "LOGSTART 17 log2\nLOGPART log2\nanother line",
     ["LOGSTART 12 log1\t  \nLOGPART log1\nLOGPART log1\t   \n",
      "LOGSTART 17 log2\nLOGPART log2\nanother line"]),
    ("FlushAtEOFMatchThenNoMatchOmitPattern", r"^LOGSTART \d+ ", True, True,
     "LOGSTART 12 log1\t  \nLOGPART log1\nLOGPART log1\t   \n"
     "LOGSTART 17 log2\nLOGPART log2\nanother line",
     ["log1\t  \nLOGPART log1\nLOGPART log1\t   \n",
      "log2\nLOGPART log2\nanother line"]),
]


@pytest.mark.parametrize("name,pat,omit,flush,inp,want", LINE_START_CASES,
                         ids=[c[0] for c in LINE_START_CASES])
def test_line_start_split_reference_table(name, pat, omit, flush, inp, want):
    rx = re.compile("(?m)" + pat)
    assert _line_start_split(inp, rx, omit, flush) == want


LINE_END_CASES = [
    ("OneLogSimple", r"LOGEND \d+ ", False, False,
     "my log LOGEND 123 ", ["my log LOGEND 123 "]),
    ("OneLogSimpleOmitPattern", r"LOGEND \d+ ", True, False,
     "my log LOGEND 123 ", ["my log "]),
    ("TwoLogsSimple", r"LOGEND \d+ ", False, False,
     "log1 LOGEND 123 log2 LOGEND 234 ",
     ["log1 LOGEND 123 ", "log2 LOGEND 234 "]),
    ("TwoLogsLineEndSimple", r"LOGEND$", False, False,
     "log1 LOGEND LOGEND\nlog2 LOGEND\n",
     ["log1 LOGEND LOGEND", "\nlog2 LOGEND"]),
    ("TwoLogsLineEndSimpleOmitPattern", r"LOGEND$", True, False,
     "log1 LOGEND LOGEND\nlog2 LOGEND\n",
     ["log1 LOGEND ", "\nlog2 "]),
    ("NoMatches", r"LOGEND \d+ ", False, False,
     "file that has no matches in it", []),
    ("NonMatchesAfter", r"LOGEND \d+ ", False, False,
     "part that matches LOGEND 123 part that doesn't match",
     ["part that matches LOGEND 123 "]),
    ("MultiplesplitLogs", r"^LOGEND.*\n", False, False,
     "LOGSTART 12 log1\t  \nLOGPART log1\nLOGEND log1\t   \n"
     "LOGSTART 17 log2\nLOGPART log2\nLOGEND log2\nLOGSTART 43 log5",
     ["LOGSTART 12 log1\t  \nLOGPART log1\nLOGEND log1\t   \n",
      "LOGSTART 17 log2\nLOGPART log2\nLOGEND log2\n"]),
    ("MultipleMultilineLogsOmitPattern", r"^LOGEND.*\n", True, False,
     "LOGSTART 12 log1\t  \nLOGPART log1\nLOGEND log1\t   \n"
     "LOGSTART 17 log2\nLOGPART log2\nLOGEND log2\nLOGSTART 43 log5",
     ["LOGSTART 12 log1\t  \nLOGPART log1\n",
      "LOGSTART 17 log2\nLOGPART log2\n"]),
    ("FlushAtEOFNoMatch", r"^LOGSTART \d+", False, True,
     "LOGPART log1\nLOGPART log1\t   \n",
     ["LOGPART log1\nLOGPART log1\t   \n"]),
]


@pytest.mark.parametrize("name,pat,omit,flush,inp,want", LINE_END_CASES,
                         ids=[c[0] for c in LINE_END_CASES])
def test_line_end_split_reference_table(name, pat, omit, flush, inp, want):
    rx = re.compile("(?m)" + pat)
    assert _line_end_split(inp, rx, omit, flush) == want


NEWLINE_CASES = [
    ("EmptyFile", "", False, []),
    ("OneLogSimple", "my log\n", False, ["my log"]),
    ("OneLogCarriageReturn", "my log\r\n", False, ["my log"]),
    ("TwoLogsSimple", "log1\nlog2\n", False, ["log1", "log2"]),
    ("TwoLogsCarriageReturn", "log1\r\nlog2\r\n", False, ["log1", "log2"]),
    ("NoTailingNewline", "foo", False, []),
    ("EmptyLine", "LOGEND 333\n\nAnother one", False, ["LOGEND 333", ""]),
    ("EmptyLineFirst", "\nLOGEND 333\nAnother one", False,
     ["", "LOGEND 333"]),
    ("FlushAtEOF", "log1\nlog2", True, ["log1", "log2"]),
]


@pytest.mark.parametrize("name,inp,flush,want", NEWLINE_CASES,
                         ids=[c[0] for c in NEWLINE_CASES])
def test_newline_split_reference_table(name, inp, flush, want):
    assert _newline_split(inp, flush) == want


def test_splitter_utf16be_newline(tmp_path):
    # split_test.go SimpleUTF16: "testlog\n" as UTF-16-BE, no BOM
    body = bytes([0, 116, 0, 101, 0, 115, 0, 116, 0, 108, 0, 111,
                  0, 103, 0, 10])
    out = _run_splitter(tmp_path, {"a.log": body}, encoding="utf-16-be")
    assert out.column("text").to_pylist() == ["testlog"]


def test_order_files_timestamp_and_mtime(tmp_path):
    import os as _os
    import time as _time

    names = ["svc-20240103.log", "svc-20240101.log", "svc-20240102.log"]
    paths = []
    for i, n in enumerate(names):
        p = tmp_path / n
        p.write_text("x\n")
        # mtimes deliberately OPPOSITE the name timestamps
        _os.utime(p, (1_700_000_000 - i, 1_700_000_000 - i))
        paths.append(str(p))
    ts = order_files(sorted(paths), {
        "regex": r"svc-(?P<d>\d{8})\.log",
        "sort_by": [{"sort_type": "timestamp", "regex_key": "d",
                     "layout": "%Y%m%d", "ascending": True}]})
    assert [os.path.basename(p) for p in ts] == [
        "svc-20240101.log", "svc-20240102.log", "svc-20240103.log"]
    mt = order_files(sorted(paths), {
        "regex": r"svc-(?P<d>\d{8})\.log",
        "sort_by": [{"sort_type": "mtime", "ascending": False}]})
    assert [os.path.basename(p) for p in mt] == names[:1] + names[1:]
    # alphabetical on the captured group, descending
    al = order_files(sorted(paths), {
        "regex": r"svc-(?P<d>\d{8})\.log",
        "sort_by": [{"sort_type": "alphabetical", "regex_key": "d",
                     "ascending": False}]})
    assert [os.path.basename(p) for p in al] == [
        "svc-20240103.log", "svc-20240102.log", "svc-20240101.log"]
