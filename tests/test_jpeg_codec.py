"""Baseline JPEG codec tests (stages/jpegcodec.py): hand-computable
DC-only exactness, roundtrip error bounds per mode, decode_image
dispatch, and a stored-golden regression pin."""

import numpy as np
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.zeros((h, w, 3))
    for c in range(3):
        px[:, :, c] = 127.5 * (1 + np.sin(
            2 * np.pi * ((c + 1) * 0.6 * yy / h + 1.1 * xx / w) + seed))
    return np.clip(px, 0, 255).astype(np.uint8)


def test_dc_only_blocks_bit_exact():
    # flat 8x8 blocks: DCT is DC-only, DC = 8*(v-128).  With q_dc = 5
    # (quality 85) any v where 8*(v-128) rounds and dequantizes back
    # within +-0.5 of a multiple of 8 reconstructs EXACTLY.
    ql, _ = quality_tables(85)
    assert ql[0, 0] == 5
    v = np.array([[128, 160], [96, 224]], np.uint8)
    img = np.kron(v, np.ones((8, 8), np.uint8))
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert out.shape == (16, 16, 3)
    assert (out[:, :, 0] == img).all()
    assert (out[:, :, 0] == out[:, :, 1]).all()  # gray replicates


def test_flat_gray_exact_any_quality():
    img = np.full((24, 17), 128, np.uint8)  # non-multiple-of-8 width
    for q in (30, 60, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert (out == 128).all(), q


@pytest.mark.parametrize("sub,ri", [("444", 0), ("444", 3),
                                    ("420", 0), ("420", 2)])
def test_roundtrip_error_bounds(sub, ri):
    px = _smooth(45, 53)
    dec = decode_jpeg(encode_jpeg(px, quality=90, subsampling=sub,
                                  restart_interval=ri))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.mean() < (3 if sub == "444" else 8)
    assert err.max() < (20 if sub == "444" else 60)


def test_restart_markers_do_not_change_pixels():
    px = _smooth(40, 40, seed=2)
    a = decode_jpeg(encode_jpeg(px, quality=88, restart_interval=0))
    b = decode_jpeg(encode_jpeg(px, quality=88, restart_interval=1))
    assert (a == b).all()


def test_decode_image_dispatches_jpeg():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        decode_image,
    )

    px = _smooth(24, 32)
    out = decode_image(encode_jpeg(px, quality=92))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 3


def test_progressive_raises_not_implemented():
    # splice SOF2 into an otherwise valid stream header
    px = _smooth(16, 16)
    buf = bytearray(encode_jpeg(px))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))


def test_truncated_scan_raises():
    px = _smooth(32, 32)
    buf = encode_jpeg(px, quality=95)
    with pytest.raises(ValueError):
        decode_jpeg(buf[:len(buf) // 2])


GOLDEN_SHA = None  # filled below on first run; see test body


def test_golden_fixture_regression():
    # pin the exact decode of a fixed fixture so any codec change that
    # perturbs pixel output is caught (stored digest, not circularity:
    # the VALUES are already proven by the exactness + bound tests)
    import hashlib

    px = _smooth(33, 47, seed=1)
    dec = decode_jpeg(encode_jpeg(px, quality=85, subsampling="420",
                                  restart_interval=2))
    digest = hashlib.sha256(dec.tobytes()).hexdigest()
    golden = "tests/golden/jpeg_fixture.sha256"
    import os

    if not os.path.exists(golden):
        with open(golden, "w") as f:
            f.write(digest + "\n")
    assert digest == open(golden).read().strip()
