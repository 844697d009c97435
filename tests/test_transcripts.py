import re

import numpy as np
import pandas as pd

from open_telemetry_opentelemetry_collector_contrib_ray.sources import (
    ensure_transcripts,
    synth_transcripts,
)

TOOL_LINE = re.compile(
    r"^(\S+) ([A-Z]+) tool=(\w+) status=(\w+) latency_ms=(\d+) msg=(.*)$"
)


def test_schema_and_determinism(transcripts_tbl):
    t = transcripts_tbl
    assert [f.name for f in t.schema] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t.equals(synth_transcripts(2_000))


def test_fixture_invariants(transcripts_tbl):
    df = transcripts_tbl.to_pandas()
    # dense unique turn_idx per conv, ts monotone within conv
    g = df.groupby("conv_id")
    assert (g.turn_idx.apply(lambda s: (s.values == np.arange(len(s))).all())).all()
    assert g.ts.apply(lambda s: s.is_monotonic_increasing).all()
    # hot conversation ~10%
    assert df.conv_id.value_counts().iloc[0] / len(df) > 0.08
    # tool rows mostly parseable, some malformed
    tool_rows = df[df.role == "tool"]
    ok = tool_rows.text.str.match(TOOL_LINE)
    assert 0.9 < ok.mean() < 1.0
    # duplicate consecutive tool lines exist (logdedup fixture)
    dup = (
        (df.role == "tool")
        & (df.text == df.text.shift())
        & (df.conv_id == df.conv_id.shift())
    )
    assert dup.sum() > 0
    # empty and multi-KB texts exist
    assert (df.text.str.len() == 0).any()
    assert (df.text.str.len() > 3000).any()


def test_ensure_transcripts_cached(tmp_path, monkeypatch):
    import open_telemetry_opentelemetry_collector_contrib_ray.sources.transcripts as m

    monkeypatch.setattr(m, "CACHE_ROOT", str(tmp_path))
    p1 = ensure_transcripts("/root/testdata/sf0.001")
    p2 = ensure_transcripts("/root/testdata/sf0.001")
    assert p1 == p2
    import pyarrow.parquet as pq

    n = sum(
        pq.ParquetFile(f"{p1}/{f}").metadata.num_rows
        for f in __import__("os").listdir(p1)
        if f.endswith(".parquet")
    )
    assert n == 2_000
