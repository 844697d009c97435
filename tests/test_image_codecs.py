"""Real image codecs + perceptual dedup (stages/multimodal.py)."""

import numpy as np
import pyarrow as pa
import pytest

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


def test_image_decoder_real_branch_decodes_bmp_without_pil():
    # strict real mode must decode native formats with no PIL present
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import ImageDecoder

    t = synth_bmp_table(6)
    out = ImageDecoder(use_fake=False)(t)
    px_means = [float(decode_image(p).mean())
                for p in t.column("payload").to_pylist()]
    assert out.column("mean_pixel").to_pylist() == px_means
    # auto mode picks the real path for decodable payloads
    out_auto = ImageDecoder()(t)
    assert out_auto.column("mean_pixel").to_pylist() == px_means


def test_image_decoder_auto_falls_back_on_opaque_payloads():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        ImageDecoder,
        synth_image_table,
    )

    t = synth_image_table(5)          # random bytes, not decodable
    out = ImageDecoder()(t)           # auto: pseudo-decode, never raises
    means = [float(np.frombuffer(p, np.uint8).mean())
             for p in t.column("payload").to_pylist()]
    assert out.column("mean_pixel").to_pylist() == means
    import pytest

    with pytest.raises((ValueError, NotImplementedError)):
        ImageDecoder(use_fake=False)(t)   # strict real mode raises


def test_image_decoder_jpeg_via_pil():
    # runs only where PIL is installed (absent in this container):
    # proves the real branch reaches PIL for non-native formats
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import ImageDecoder

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, :4] = 255
    buf = io.BytesIO()
    PIL_Image.fromarray(px).save(buf, format="JPEG")
    t = pa.table({"item_id": pa.array([0], pa.int64()),
                  "payload": pa.array([buf.getvalue()], pa.large_binary())})
    out = ImageDecoder(use_fake=False)(t)
    assert 100.0 < out.column("mean_pixel").to_pylist()[0] < 155.0


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


def test_png_roundtrip_and_bmp_cross_decode():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        decode_image, decode_png, encode_bmp, encode_png,
    )

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
    buf = encode_png(px)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(decode_png(buf), px)
    assert np.array_equal(decode_image(buf), px)      # sniffing works
    # same pixels through the BMP codec decode identically
    assert np.array_equal(decode_image(encode_bmp(px)), px)


def test_png_all_filters_and_color_types():
    import struct
    import zlib

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        decode_png,
    )

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    def forward_filter(pixels, ftype_of_row, nch):
        h, w, _ = pixels.shape
        flat = pixels.reshape(h, w * nch).astype(np.int64)
        out = bytearray()
        prev = np.zeros(w * nch, dtype=np.int64)
        for y in range(h):
            cur, f = flat[y], ftype_of_row(y)
            raw = np.zeros(w * nch, dtype=np.int64)
            for x in range(w * nch):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else \
                        (b if pb <= pc_ else c)
                raw[x] = (cur[x] - pred) & 0xFF
            out.append(f)
            out.extend(raw.astype(np.uint8).tobytes())
            prev = cur
        return bytes(out)

    rng = np.random.default_rng(7)
    for ctype_, nch in ((2, 3), (6, 4), (0, 1)):
        h, w = 9, 11
        px = rng.integers(0, 256, (h, w, nch)).astype(np.uint8)
        raw = forward_filter(px, lambda y: y % 5, nch)  # cycle all filters
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_, 0, 0, 0)
        buf = (sig + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
        got = decode_png(buf)
        if ctype_ == 2:
            exp = px
        elif ctype_ == 6:
            exp = px[:, :, :3]
        else:
            exp = np.repeat(px, 3, axis=2)
        assert np.array_equal(got, exp), (ctype_, "filter reconstruction")


def test_avi_roundtrip_bit_exact():
    # uncompressed DIB container: encode -> decode is lossless
    import numpy as np

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (13, 21, 3), dtype=np.uint8)
              for _ in range(5)]
    dec, w, h = decode_avi(encode_avi(frames, fps=8))
    assert (w, h) == (21, 13) and len(dec) == 5
    for a, b in zip(frames, dec):
        assert (a == b).all()


def test_avi_compressed_handler_raises():
    import numpy as np
    import pytest

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        decode_avi,
        encode_avi,
    )

    buf = bytearray(encode_avi(
        [np.zeros((8, 8, 3), np.uint8)]))
    i = buf.find(b"vidsDIB ")
    buf[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(buf))
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00AVI ")  # no strf/frames


def test_frame_sampler_avi_equals_raw():
    # the same pixels through the AVI container and the raw buffer must
    # sample identical frames
    import numpy as np
    import pyarrow as pa

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        FrameSampler,
        encode_avi,
    )

    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
              for _ in range(10)]
    t = pa.table({
        "item_id": pa.array([0, 1], pa.int64()),
        "mime": pa.array(["video/raw", "video/x-msvideo"]),
        "width": pa.array([16, 16], pa.int32()),
        "height": pa.array([12, 12], pa.int32()),
        "payload": pa.array([b"".join(f.tobytes() for f in frames),
                             encode_avi(frames)], pa.large_binary()),
    })
    out = FrameSampler(frames_per_item=4)(t).to_pandas()
    raw = out[out.item_id == 0].reset_index(drop=True)
    avi = out[out.item_id == 1].reset_index(drop=True)
    assert list(raw.frame_idx) == list(avi.frame_idx)
    for a, b in zip(raw.frame_payload, avi.frame_payload):
        assert a == b
    assert (raw.mean_pixel == avi.mean_pixel).all()


def test_wav_container_roundtrip_and_chunk_parity():
    import numpy as np
    import pyarrow as pa
    import pytest

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        AudioChunker,
        decode_wav,
        encode_wav,
    )

    pcm = (np.sin(np.arange(16000) / 20.0) * 20000).astype("<i2").tobytes()
    back, rate, ch = decode_wav(encode_wav(pcm, 16000))
    assert back == pcm and rate == 16000 and ch == 1
    t = pa.table({
        "item_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([pcm, encode_wav(pcm, 16000)], pa.large_binary()),
        "sample_rate": pa.array([16000, 0], pa.int32()),
        "mime": pa.array(["audio/pcm16", "audio/wav"]),
    })
    out = AudioChunker(chunk_ms=250)(t).to_pandas()
    a = out[out.item_id == 0].reset_index(drop=True)
    b = out[out.item_id == 1].reset_index(drop=True)
    assert len(a) == len(b) == 4
    assert all(x == y for x, y in zip(a.payload, b.payload))
    assert (b.sample_rate == 16000).all()
    # compressed WAV raises honestly
    buf = bytearray(encode_wav(pcm, 16000))
    i = buf.find(b"fmt ")
    buf[i + 8] = 85                            # wFormatTag = MPEG layer 3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(buf))


def test_wav_float_and_wide_pcm_decode():
    """IEEE-float and 8/24/32-bit PCM WAVs decode natively to PCM16."""
    import struct

    import numpy as np

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        decode_wav,
    )

    def wav(fmt_tag, bits, payload, rate=8000, ch=1):
        fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) % 2 else b""))
        return b"RIFF" + struct.pack("<I", len(body)) + body

    ref = (np.sin(np.arange(512) / 9.0) * 0.75).astype(np.float64)
    want = (ref * 32767.0).round().astype("<i2")
    for dt, bits in (("<f4", 32), ("<f8", 64)):
        got, rate, ch = decode_wav(wav(3, bits, ref.astype(dt).tobytes()))
        g = np.frombuffer(got, "<i2")
        assert rate == 8000 and ch == 1
        assert np.abs(g.astype(int) - want.astype(int)).max() <= 1

    # float samples clip to [-1, 1]
    loud = np.array([2.0, -3.0, 0.5], "<f4")
    g = np.frombuffer(decode_wav(wav(3, 32, loud.tobytes()))[0], "<i2")
    assert list(g) == [32767, -32767, 16384]

    # 8-bit unsigned: 128 -> 0, 255 -> 32512, 0 -> -32768
    g = np.frombuffer(decode_wav(wav(1, 8, bytes([128, 255, 0, 0])))[0],
                      "<i2")
    assert list(g) == [0, 32512, -32768, -32768]

    # 24-bit: top 16 bits survive, sign extends
    x24 = b"\x00\x00\x40" + b"\x00\x00\xc0"   # +2^22, -2^22
    g = np.frombuffer(decode_wav(wav(1, 24, x24))[0], "<i2")
    assert list(g) == [0x4000, -0x4000]

    # 32-bit int: arithmetic shift
    x32 = np.array([1 << 30, -(1 << 30)], "<i4").tobytes()
    g = np.frombuffer(decode_wav(wav(1, 32, x32))[0], "<i2")
    assert list(g) == [0x4000, -0x4000]

    # float with non-float width is malformed, not "unsupported"
    with pytest.raises(ValueError):
        decode_wav(wav(3, 16, b"\x00" * 32))


# ---------------------------------------------------- session-review fixes

def test_decode_avi_short_strf_raises_valueerror():
    """Malformed strf (shorter than the 16-byte prefix) must honor the
    documented ValueError contract, not leak struct.error."""
    import struct

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        decode_avi,
    )

    body = b"AVI " + b"strf" + struct.pack("<I", 4) + b"\x00" * 4
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        decode_avi(buf)


def test_frame_sampler_corrupt_avi_falls_back():
    """A corrupt AVI payload must fall back to the byte-range stub, not
    kill the batch."""
    import struct

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        FrameSampler,
    )

    body = b"AVI " + b"strf" + struct.pack("<I", 4) + b"\x00" * 4
    buf = b"RIFF" + struct.pack("<I", len(body)) + body + b"x" * 64
    t = pa.table({"item_id": pa.array([1], pa.int64()),
                  "payload": pa.array([buf], pa.large_binary()),
                  "mime": pa.array(["video/avi"], pa.string()),
                  "width": pa.array([4], pa.int32()),
                  "height": pa.array([4], pa.int32())})
    out = FrameSampler(frames_per_item=2)(t)
    assert out.num_rows >= 1  # stub frames, no crash


def test_audio_chunker_stereo_downmix():
    """Stereo WAV: chunk count reflects FRAMES (not interleaved samples)
    and the payload is the mono mean of both channels."""
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        AudioChunker,
        encode_wav,
    )

    rate = 1000
    n_frames = 1000  # exactly 1 s
    left = np.full(n_frames, 100, dtype="<i2")
    right = np.full(n_frames, 300, dtype="<i2")
    inter = np.empty(n_frames * 2, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    wav = encode_wav(inter.tobytes(), rate, channels=2)
    t = pa.table({"item_id": pa.array([1], pa.int64()),
                  "payload": pa.array([wav], pa.large_binary()),
                  "sample_rate": pa.array([0], pa.int32()),
                  "mime": pa.array(["audio/wav"], pa.string())})
    out = AudioChunker(chunk_ms=250)(t)
    # 1 s of audio at 250 ms chunks -> exactly 4 chunks (stereo bug gave 8)
    assert out.num_rows == 4
    first = np.frombuffer(out.column("payload").to_pylist()[0], dtype="<i2")
    assert (first == 200).all()  # mono mean of 100/300


def test_avi_mjpeg_roundtrip_and_sampling():
    """MJPG-in-AVI decodes natively via the pure-numpy JPEG codec:
    flat-color frames roundtrip exactly, smooth ramps stay close, and
    FrameSampler samples the same indices as the DIB container."""
    import numpy as np

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
        FrameSampler,
        decode_avi,
        encode_avi,
    )

    flat = [np.full((16, 16, 3), v, np.uint8) for v in (40, 90, 200)]
    back, w, h = decode_avi(encode_avi(flat, codec="MJPG", quality=95))
    assert (w, h) == (16, 16) and len(back) == 3
    for a, b in zip(flat, back):
        assert np.array_equal(a, b)          # DC-only blocks: exact

    grad = [np.tile(np.arange(16, dtype=np.uint8) * 8,
                    (12, 1))[:, :, None].repeat(3, axis=2) + j
            for j in range(6)]
    gb, _, _ = decode_avi(encode_avi(grad, codec="MJPG", quality=95))
    assert max(np.abs(a.astype(int) - b.astype(int)).max()
               for a, b in zip(grad, gb)) <= 12

    dib = encode_avi(grad)
    mjpg = encode_avi(grad, codec="MJPG", quality=95)
    t = pa.table({"item_id": pa.array([0, 1], pa.int64()),
                  "mime": pa.array(["video/x-msvideo"] * 2),
                  "width": pa.array([16, 16], pa.int32()),
                  "height": pa.array([12, 12], pa.int32()),
                  "payload": pa.array([dib, mjpg], pa.large_binary())})
    out = FrameSampler(frames_per_item=3)(t).to_pandas()
    a = out[out.item_id == 0].reset_index(drop=True)
    b = out[out.item_id == 1].reset_index(drop=True)
    assert list(a.frame_idx) == list(b.frame_idx)
    assert np.abs(a.mean_pixel.to_numpy()
                  - b.mean_pixel.to_numpy()).max() < 2.0

    # unknown codec still raises honestly
    bad = bytearray(encode_avi(grad, codec="MJPG"))
    i = bad.find(b"MJPG")                     # strh handler fourcc
    bad[i:i + 4] = b"H264"
    j = bad.find(b"MJPG", i + 4)              # strf biCompression
    bad[j:j + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(bad))


def test_y4m_roundtrip_c444_and_mono():
    import numpy as np

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (  # noqa: E501
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
              for _ in range(3)]
    out, w, h = decode_y4m(encode_y4m(frames, colorspace="C444"))
    assert (w, h, len(out)) == (16, 12, 3)
    # C444 fixed-point YCbCr round trip is within ±2 per channel
    for a, b in zip(out, frames):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 2
    # grayscale through Cmono is bit-exact
    g = np.repeat(rng.randint(0, 256, (8, 8, 1), dtype=np.uint8), 3, axis=2)
    mono, _, _ = decode_y4m(encode_y4m([g], colorspace="Cmono"))
    assert (mono[0] == g).all()


def test_y4m_c420_and_errors():
    import numpy as np
    import pytest

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (  # noqa: E501
        decode_y4m,
        encode_y4m,
    )

    # flat-color frame survives 4:2:0 chroma subsampling within ±2
    px = np.full((8, 8, 3), (200, 40, 90), dtype=np.uint8)
    out, _, _ = decode_y4m(encode_y4m([px], colorspace="C420jpeg"))
    assert np.abs(out[0].astype(int) - px.astype(int)).max() <= 2
    with pytest.raises(ValueError):
        decode_y4m(b"not a y4m stream")
    with pytest.raises(ValueError):
        # truncated frame payload
        full = encode_y4m([px], colorspace="C444")
        decode_y4m(full[:-10])
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C411\nFRAME\n" + b"\x00" * 6)
    with pytest.raises(ValueError):
        encode_y4m([px[:7, :7]], colorspace="C420jpeg")  # odd dims


def test_frame_sampler_y4m_path():
    import numpy as np

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (  # noqa: E501
        FrameSampler,
        encode_y4m,
    )
    import pyarrow as pa

    frames = [np.full((6, 8, 3), 10 * (j + 1), dtype=np.uint8)
              for j in range(6)]
    t = pa.table({
        "item_id": pa.array([0], pa.int64()),
        "mime": pa.array(["video/x-yuv4mpeg"]),
        "payload": pa.array([encode_y4m(frames, colorspace="C444")],
                            pa.large_binary()),
    })
    out = FrameSampler(frames_per_item=3)(t).to_pandas()
    # real temporal indices from the container, not byte-range stubs
    assert sorted(out["frame_idx"]) == [0, 2, 4]
    # gray flat frames decode to their exact value -> exact means
    assert list(out.sort_values("frame_idx")["mean_pixel"]) == \
        [10.0, 30.0, 50.0]
