"""Property-based tests for the round-5 operators: kernels vs naive
row-wise / reference-port interpretations on randomized inputs (no Ray
session needed — these exercise the pure kernels)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from open_telemetry_opentelemetry_collector_contrib_ray.sources.push import (
    _split_octet_frames,
    _split_stream,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(
    blacklist_characters="\n\r"), max_size=12), max_size=10),
    st.integers(min_value=1, max_value=7))
def test_stream_split_chunking_invariant(lines, chunk):
    # feeding a newline stream in arbitrary chunk sizes must recover
    # exactly the lines (plus the unterminated tail if any)
    data = "".join(ln + "\n" for ln in lines)
    got, partial = [], ""
    for i in range(0, len(data), chunk):
        toks, partial = _split_stream(partial + data[i:i + chunk])
        got.extend(toks)
    if partial:
        got.append(partial)
    assert got == lines


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=1, max_size=20), max_size=8),
       st.integers(min_value=1, max_value=9))
def test_octet_framing_chunking_invariant(msgs, chunk):
    # zero-length frames are invalid octet counting (the reference
    # frame regex is ^[1-9]\d*\s), hence min_size=1
    data = b"".join(b"%d " % len(m) + m for m in msgs)
    got, buf = [], b""
    for i in range(0, len(data), chunk):
        buf += data[i:i + chunk]
        toks, buf = _split_octet_frames(buf)
        got.extend(toks)
    toks, buf = _split_octet_frames(buf)
    got.extend(toks)
    assert got == msgs and buf == b""


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1000), min_size=2,
                max_size=40))
def test_counter_delta_kernel_vs_rowwise(vals):
    # the reset rule replayed row-wise
    pv = np.asarray([np.nan] + [float(v) for v in vals[:-1]])
    vv = np.asarray([float(v) for v in vals])
    kernel = np.where(np.isnan(pv), 0.0,
                      np.where(vv >= pv, vv - pv, vv))
    naive = [0.0]
    for a, b in zip(vals, vals[1:]):
        naive.append(float(b - a) if b >= a else float(b))
    assert kernel.tolist() == naive


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=6),
       st.floats(min_value=0.01, max_value=0.99))
def test_histogram_quantile_vs_promql_port(counts, q):
    # dense buckets with bounds 10,20,...,inf: engine formula vs a
    # direct port of promql bucketQuantile
    if sum(counts) == 0:
        counts[0] = 1
    ubs = [10.0 * (i + 1) for i in range(len(counts))] + [np.inf]
    counts = counts + [0]
    cum = np.cumsum(counts).astype(float)
    total = cum[-1]
    rank = q * total
    b = int(np.argmax(cum >= rank))
    if b == len(ubs) - 1:
        expected = ubs[-2]
    else:
        start = ubs[b - 1] if b > 0 else 0.0
        cprev = cum[b - 1] if b > 0 else 0.0
        cnt = cum[b] - cprev
        expected = start + (ubs[b] - start) * ((rank - cprev) / cnt)
    # engine selection rule (first bucket with cum >= rank and cnt > 0)
    pos = np.arange(len(ubs))
    cum_prev = np.where(pos > 0, np.roll(cum, 1), 0.0)
    cnt_arr = np.asarray(counts, dtype=float)
    sel = (cum >= rank) & ((cum_prev < rank) | (pos == 0)) & (cnt_arr > 0)
    i = int(np.argmax(sel))
    start = ubs[i - 1] if i > 0 else 0.0
    if np.isinf(ubs[i]):
        got = ubs[-2]
    else:
        got = start + (ubs[i] - start) * ((rank - cum_prev[i]) / cnt_arr[i])
    # promql's search can land on a zero-count bucket only when
    # rank == cum there; the engine then picks the next non-empty
    # bucket whose interpolation degenerates to the same BOUNDARY value
    assert got == expected or (abs(got - expected) < 1e-9) or \
        (counts[b] == 0 and abs(rank - cum[b]) < 1e-9)
