"""Real image codecs + perceptual dedup (stages/multimodal.py)."""

import numpy as np
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
    ImageAHash,
    ImagePixelDecoder,
    decode_bmp,
    decode_image,
    decode_pnm,
    encode_bmp,
    synth_bmp_table,
)


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(0)
    for h, w in [(1, 1), (5, 3), (17, 31), (8, 8)]:  # widths force padding
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        back = decode_bmp(encode_bmp(px))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, px)


def test_pnm_decode_p6_and_p5():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    p6 = b"P6\n# comment\n3 2\n255\n" + px.tobytes()
    assert np.array_equal(decode_pnm(p6), px)
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    p5 = b"P5 3 2 255 " + gray.tobytes()
    out = decode_pnm(p5)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_decode_image_sniffs_formats():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    assert decode_image(encode_bmp(px)).shape == (4, 4, 3)
    p6 = b"P6\n4 4\n255\n" + px.tobytes()
    assert decode_image(p6).shape == (4, 4, 3)


def test_pixel_decoder_dims_match_metadata():
    t = synth_bmp_table(20)
    out = ImagePixelDecoder()(t)
    assert out.column("dec_width").to_pylist() == \
        out.column("width").to_pylist()
    assert out.column("dec_height").to_pylist() == \
        out.column("height").to_pylist()
    assert len(out.column("thumb")[0].as_py()) == 64


def test_ahash_groups_planted_near_dups():
    t = synth_bmp_table(35, dup_every=7)
    out = ImageAHash()(ImagePixelDecoder()(t))
    h = np.array(out.column("ahash").to_pylist())
    ids = np.array(out.column("item_id").to_pylist())
    # items 0,1 / 7,8 / 14,15 / ... share a pattern (+-1 noise): their
    # aHashes must collide; unique items must not collide with them
    for g in range(5):
        a, b = h[ids == 7 * g], h[ids == 7 * g + 1]
        assert a[0] == b[0]
    # distinct patterns should produce mostly distinct hashes
    uniq = h[ids % 7 >= 2]
    assert len(set(uniq.tolist())) >= len(uniq) - 2
