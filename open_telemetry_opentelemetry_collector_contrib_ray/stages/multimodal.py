"""Multimodal column stages: image/audio/video as opaque binary columns.

Image decode is REAL in pure numpy+stdlib for BMP / binary PNM / PNG /
baseline JPEG (jpegcodec.py); audio PCM16 kernels are real; video is
real for raw RGB24 frame buffers, uncompressed-DIB AVI containers AND
Motion-JPEG AVI (encode_avi/decode_avi, frames through jpegcodec).
Codecs beyond that (WebP, progressive JPEG,
mp3/ogg, h264/vp9 video) need PIL/ffmpeg — NOT in this container —
and sit behind import guards that raise honestly, while
the Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is identical either way and tested end-to-end.

Design rules for binary payloads at scale:
- batch_size SMALL (payload bytes x batch x concurrency must fit the
  worker heap; e.g. 4 MB images -> batch_size 32);
- actor pools (decoder init is expensive: codecs, model weights);
- outputs are new columns (features) or new tables (frames), never
  mutations of the binary payload.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def synth_image_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake 'image' payloads for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(rng.randint(64, 4096)) for _ in range(n)]
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["image/png"] * n),
        "width": pa.array(rng.randint(16, 512, n).astype(np.int32)),
        "height": pa.array(rng.randint(16, 512, n).astype(np.int32)),
    })


class ImageDecoder:
    """Actor-pool decode stage over opaque binary payloads.

    Real decode runs through :func:`decode_image` — BMP / binary PNM /
    PNG / baseline JPEG in pure numpy+stdlib, anything else (WebP,
    progressive JPEG, ...) through PIL when it is importable.  Modes:

    - ``use_fake=None`` (default, "auto"): payloads that sniff as a
      decodable format decode for real; undecodable payloads fall back
      to the deterministic pseudo-decode (mean byte value) so synthetic
      plumbing corpora still flow.  Never raises.
    - ``use_fake=False``: strict real decode; undecodable payloads
      raise (ValueError / NotImplementedError-without-PIL).
    - ``use_fake=True``: always the pseudo-decode.

    Output schema is identical in every mode: mean_pixel float64,
    n_bytes int64 appended to the input columns."""

    def __init__(self, use_fake: bool | None = None):
        self.mode = ("auto" if use_fake is None
                     else "fake" if use_fake else "real")
        try:
            import PIL.Image  # noqa: F401

            self.have_pil = True
        except ImportError:
            self.have_pil = False
        # kept for back-compat introspection (True only when forced fake)
        self.use_fake = use_fake is True

    def _decodable(self, p: bytes) -> bool:
        if p[:2] in (b"BM", b"P5", b"P6", b"\xff\xd8") or p[:8] == _PNG_SIG:
            return True
        return self.have_pil

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        means = np.empty(len(payloads), dtype=np.float64)
        for i, p in enumerate(payloads):
            p = p or b""
            if self.mode == "real" or (self.mode == "auto" and p
                                       and self._decodable(p)):
                try:
                    means[i] = float(decode_image(p).mean())
                    continue
                except (ValueError, NotImplementedError, OSError):
                    if self.mode == "real":
                        raise
                    # auto: sniffed wrong / PIL couldn't parse -> fake
            means[i] = float(np.frombuffer(p, np.uint8).mean()) if p else 0.0
        n_bytes = pa.array([len(p or b"") for p in payloads], pa.int64())
        return (batch.append_column("mean_pixel", pa.array(means))
                     .append_column("n_bytes", n_bytes))


class ImageFeatureExtractor:
    """Feature-vector stage (a CNN/CLIP embedding in a GPU deployment).

    Decodable payloads (BMP/PNM/PNG natively, anything PIL can read)
    get REAL retrieval features in pure numpy: 3 channel means plus a
    ``grid``x``grid`` luminance-block-mean thumbnail — the classic
    pre-deep-learning global descriptor (dim = 3 + grid²).
    Undecodable payloads fall back to a deterministic sha256-derived
    vector of the SAME dim so every block shares one schema (the same
    auto policy as ImageDecoder)."""

    def __init__(self, grid: int = 4):
        self.grid = grid
        self.dim = 3 + grid * grid

    def _real(self, p: bytes) -> np.ndarray | None:
        try:
            px = decode_image(p)
        except (ValueError, NotImplementedError, OSError):
            return None
        px = px.astype(np.float32) / 255.0
        if px.ndim == 2:
            px = px[:, :, None].repeat(3, axis=2)
        ch = px.reshape(-1, 3).mean(axis=0)
        lum = px @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        g = self.grid
        h, w = lum.shape
        # integral-image block means handle non-divisible dims exactly
        ys = (np.arange(g + 1) * h) // g
        xs = (np.arange(g + 1) * w) // g
        ii = np.zeros((h + 1, w + 1), dtype=np.float64)
        ii[1:, 1:] = lum.cumsum(0).cumsum(1)
        blocks = np.empty((g, g), dtype=np.float32)
        for a in range(g):
            for b in range(g):
                y0, y1, x0, x1 = ys[a], ys[a + 1], xs[b], xs[b + 1]
                area = max(1, (y1 - y0) * (x1 - x0))
                blocks[a, b] = (ii[y1, x1] - ii[y0, x1]
                                - ii[y1, x0] + ii[y0, x0]) / area
        return np.concatenate([ch, blocks.reshape(-1)])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            real = self._real(p) if p else None
            if real is not None:
                feats[i] = real
            else:
                digest = hashlib.sha256(p or b"").digest()
                raw = np.frombuffer((digest * ((self.dim // 32) + 1))[:self.dim],
                                    np.uint8)
                feats[i] = raw / 255.0
        flat = pa.array(feats.reshape(-1), pa.float32())
        return batch.append_column(
            "features", pa.FixedSizeListArray.from_arrays(flat, self.dim))


class FrameSampler:
    """Video frame sampling: one input row -> k frame rows (flat_map
    shape).

    REAL decode paths: uncompressed-DIB and Motion-JPEG AVI containers
    (RIFF sniffed from the payload itself, dims from the strf header —
    decode_avi), YUV4MPEG2 streams (magic-sniffed, C444/C420*/Cmono —
    decode_y4m) and raw RGB24 buffers (``width``/``height`` metadata
    columns, ffmpeg ``rawvideo`` pix_fmt rgb24 frame-major layout).
    All sample k frames uniformly across the clip and emit the true
    temporal frame index, RGB24 frame bytes and decoded mean pixel.
    Other codecs inside a container raise in decode_avi and fall through to
    the byte-range stub (frame_idx 0..k-1, mean_pixel over raw bytes)
    so opaque-container plumbing still flows."""

    def __init__(self, frames_per_item: int = 4,
                 width_col: str = "width", height_col: str = "height"):
        self.k = frames_per_item
        self.width_col = width_col
        self.height_col = height_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        has_dims = (self.width_col in batch.column_names
                    and self.height_col in batch.column_names)
        widths = (batch.column(self.width_col).to_pylist()
                  if has_dims else [None] * len(payloads))
        heights = (batch.column(self.height_col).to_pylist()
                   if has_dims else [None] * len(payloads))
        if "mime" in batch.column_names:
            # a still image with dims is NOT a clip — gate on mime
            is_video = [bool(m) and m.startswith("video/")
                        for m in batch.column("mime").to_pylist()]
        else:
            is_video = [True] * len(payloads)
        item_ids = batch.column("item_id").to_pylist()
        ids, fidx, frames, means = [], [], [], []
        for item, p, w, h, vid in zip(item_ids, payloads, widths, heights,
                                      is_video):
            data = p or b""
            is_avi = data[:4] == b"RIFF" and data[8:12] == b"AVI "
            if is_avi or data[:10] == b"YUV4MPEG2 ":
                try:
                    avi_frames, _, _ = (decode_avi(data) if is_avi
                                        else decode_y4m(data))
                except (ValueError, NotImplementedError, struct.error):
                    # struct.error defensively: the decode contract is
                    # ValueError, but a corrupt container must never
                    # kill the whole batch
                    avi_frames = None
                if avi_frames:
                    n_frames = len(avi_frames)
                    picks = np.unique((np.arange(self.k) * n_frames)
                                      // max(1, self.k)).astype(np.int64)
                    picks = picks[picks < n_frames]
                    for j in picks:
                        px = avi_frames[int(j)]
                        ids.append(item)
                        fidx.append(int(j))
                        frames.append(px.tobytes())
                        means.append(float(px.mean()))
                    continue
            if (vid and w and h and len(data) >= w * h * 3
                    and len(data) % (w * h * 3) == 0):
                fsz = w * h * 3
                n_frames = len(data) // fsz
                # uniform temporal sampling across the clip
                picks = np.unique((np.arange(self.k) * n_frames)
                                  // max(1, self.k)).astype(np.int64)
                picks = picks[picks < n_frames]
                for j in picks:
                    fb = data[j * fsz:(j + 1) * fsz]
                    px = np.frombuffer(fb, np.uint8)
                    ids.append(item)
                    fidx.append(int(j))
                    frames.append(fb)
                    means.append(float(px.mean()))
            else:
                step = max(1, len(data) // self.k)
                for j in range(self.k):
                    fb = data[j * step:(j + 1) * step]
                    ids.append(item)
                    fidx.append(j)
                    frames.append(fb)
                    means.append(float(np.frombuffer(fb, np.uint8).mean())
                                 if fb else 0.0)
        return pa.table({"item_id": pa.array(ids),
                         "frame_idx": pa.array(fidx, pa.int32()),
                         "frame_payload": pa.array(frames, pa.large_binary()),
                         "mean_pixel": pa.array(means, pa.float64())})


def synth_video_table(n: int, width: int = 16, height: int = 12,
                      n_frames: int = 24, seed: int = 7) -> pa.Table:
    """Deterministic clips (brightness ramps over time) for the real
    FrameSampler paths: even items ship frame-major raw RGB24 buffers,
    items i%4==1 the SAME frames packaged in a real uncompressed-DIB
    AVI container (identical pixels), and items i%4==3 a real
    Motion-JPEG AVI (lossy but structurally identical sampling)."""
    rng = np.random.RandomState(seed)
    payloads, mimes = [], []
    for i in range(n):
        base = rng.randint(0, 128, size=(height, width, 3), dtype=np.uint8)
        frames = [np.clip(base.astype(np.int32) + 4 * j, 0, 255).astype(np.uint8)
                  for j in range(n_frames)]
        if i % 4 == 3:
            payloads.append(encode_avi(frames, codec="MJPG"))
            mimes.append("video/x-msvideo")
        elif i % 2:
            payloads.append(encode_avi(frames))
            mimes.append("video/x-msvideo")
        else:
            payloads.append(b"".join(f.tobytes() for f in frames))
            mimes.append("video/raw")
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "mime": pa.array(mimes),
        "width": pa.array([width] * n, pa.int32()),
        "height": pa.array([height] * n, pa.int32()),
        "payload": pa.array(payloads, pa.large_binary()),
    })


# ------------------------------------------------------------------ real
# image codecs: BMP (24-bit BI_RGB) and netpbm (binary P5/P6) decode in
# pure numpy — no PIL needed.  JPEG/PNG remain PIL-gated (not in this
# container).  This makes the image path REAL end-to-end for
# uncompressed formats: decode -> thumbnail -> perceptual aHash dedup.

import struct


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_len = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_len), dtype=np.uint8)
    # BMP stores bottom-up BGR
    rows[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", buf, 10)[0]
    hsize = struct.unpack_from("<I", buf, 14)[0]
    if hsize < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    comp = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    data = np.frombuffer(buf, np.uint8, count=row_len * h, offset=offset)
    rows = data.reshape(h, row_len)[:, :w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def decode_pnm(buf: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 RGB, maxval<=255) -> (H, W, 3) uint8."""
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    # header = magic, width, height, maxval as whitespace-separated
    # ASCII tokens ('#' comments allowed), then a single whitespace byte
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(buf) and buf[i:i + 1].isspace():
            i += 1
        if buf[i:i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j:j + 1].isspace():
            j += 1
        toks.append(int(buf[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    if buf[:2] == b"P6":
        px = np.frombuffer(buf, np.uint8, count=w * h * 3, offset=i) \
            .reshape(h, w, 3)
        return np.ascontiguousarray(px)
    gray = np.frombuffer(buf, np.uint8, count=w * h, offset=i).reshape(h, w)
    return np.ascontiguousarray(np.repeat(gray[:, :, None], 3, axis=2))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes (8-bit truecolor, filter 0 rows,
    zlib-compressed).  Pure stdlib; readable by any standard decoder."""
    import zlib

    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)  # filter byte 0 per row
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB — pure stdlib+numpy: 8-bit
    grayscale(+alpha) / RGB / RGBA, non-interlaced, all five scanline
    filters (none/sub/up/average/paeth).  None/up rows are fully
    vectorized, sub reduces to a per-channel cumsum; average/paeth have
    a sequential left-dependency, so they loop per PIXEL with the
    channels vectorized — real photographic PNGs (libpng's adaptive
    filtering favors average/paeth) decode at Python-loop speed, fine
    for thumbnails/fixtures, not for bulk photo corpora (gate those
    behind PIL)."""
    import zlib

    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, idat, meta = 8, [], None
    while i + 8 <= len(buf):
        ln = struct.unpack_from(">I", buf, i)[0]
        ctype = buf[i + 4:i + 8]
        data = buf[i + 8:i + 8 + ln]
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + ln
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_, comp, filt, interlace = meta
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} not supported")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype_)
    if nch is None:
        raise NotImplementedError(f"PNG color type {ctype_}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * nch
    rows = raw[:h * stride].reshape(h, stride)
    ftypes, data = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros_like(data)
    prev = np.zeros(w * nch, dtype=np.int64)
    for y in range(h):
        r, f = data[y], int(ftypes[y])
        if f == 0:
            cur = r
        elif f == 1:   # sub: recon = raw + left -> per-channel cumsum
            cur = r.reshape(w, nch).cumsum(0).reshape(-1) & 0xFF
        elif f == 2:   # up
            cur = (r + prev) & 0xFF
        elif f == 3:   # average (left-sequential; channels vectorized)
            cur = r.reshape(w, nch).copy()
            up = prev.reshape(w, nch)
            left = np.zeros(nch, dtype=np.int64)
            for x in range(w):
                cur[x] = (cur[x] + (left + up[x]) // 2) & 0xFF
                left = cur[x]
            cur = cur.reshape(-1)
        elif f == 4:   # paeth (left-sequential; channels vectorized)
            cur = r.reshape(w, nch).copy()
            up = prev.reshape(w, nch)
            a = np.zeros(nch, dtype=np.int64)
            c = np.zeros(nch, dtype=np.int64)
            for x in range(w):
                b = up[x]
                p = a + b - c
                pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pr = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                              np.where(pb <= pc_, b, c))
                cur[x] = (cur[x] + pr) & 0xFF
                a, c = cur[x], b
            cur = cur.reshape(-1)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = cur
    px = out.astype(np.uint8).reshape(h, w, nch)
    if ctype_ == 0:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if ctype_ == 2:
        return np.ascontiguousarray(px)
    if ctype_ == 4:   # gray+alpha -> drop alpha
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    return np.ascontiguousarray(px[:, :, :3])  # RGBA -> RGB


def decode_image(buf: bytes) -> np.ndarray:
    """Sniff-and-decode: BMP / binary PNM / PNG / baseline JPEG in pure
    numpy+stdlib (jpegcodec.py closes the formerly PIL-gated path);
    anything else (WebP, progressive JPEG, ...) needs PIL (raises
    NotImplementedError without it)."""
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:2] in (b"P5", b"P6"):
        return decode_pnm(buf)
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        try:
            return decode_jpeg(buf)
        except (NotImplementedError, ValueError):
            # progressive/12-bit (NotImplementedError) or anything the
            # baseline parser is stricter about than the spec (e.g.
            # 0xFF fill bytes before markers raise ValueError): PIL may
            # still decode it — only give up if PIL is absent too
            pass
    try:
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(buf)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            "decoding this format needs PIL; BMP/PNM/PNG/baseline-JPEG "
            "decode natively")


def synth_bmp_table(n: int, seed: int = 5, dup_every: int = 7) -> pa.Table:
    """REAL decodable BMP payloads: deterministic low-frequency sinusoid
    patterns (distinct per item) with planted exact duplicates — items
    0 and 1 of every `dup_every` block carry bit-identical pixels (the
    re-crawled-image case aHash dedup targets)."""
    payloads, widths, heights, mimes = [], [], [], []
    for i in range(n):
        g = i // dup_every if i % dup_every < 2 else i  # items 0,1 of
        # each block share a pattern (planted dup pair); rest unique
        r = np.random.RandomState(1000 + g)
        w = int(r.randint(12, 40))
        h = int(r.randint(12, 40))
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.zeros((h, w, 3))
        for c in range(3):
            fy, fx = r.uniform(0.5, 3, 2)
            phase = r.uniform(0, 2 * np.pi)
            px[:, :, c] = 127.5 * (1 + np.sin(
                2 * np.pi * (fy * yy / h + fx * xx / w) + phase))
        px = np.clip(px, 0, 255).astype(np.uint8)
        # mixed wire formats keyed by the PATTERN id g (not the item
        # index) so both members of a planted pair ship the same bytes:
        # lossless formats would match pixels either way, but a lossy
        # JPEG pair must share one encode for aHash equality — exactly
        # the byte-identical re-crawl case the dedup targets
        fmt = g % 3
        if fmt == 2:
            from .jpegcodec import encode_jpeg

            payloads.append(encode_jpeg(px, quality=90))
            mimes.append("image/jpeg")
        elif fmt == 1:
            payloads.append(encode_png(px))
            mimes.append("image/png")
        else:
            payloads.append(encode_bmp(px))
            mimes.append("image/bmp")
        widths.append(w)
        heights.append(h)
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(mimes),
        "width": pa.array(np.array(widths, dtype=np.int32)),
        "height": pa.array(np.array(heights, dtype=np.int32)),
    })


def _thumb_gray(px: np.ndarray, k: int = 8) -> np.ndarray:
    """(H, W, 3) -> (k, k) float64 grayscale by nearest-neighbor center
    sampling (deterministic, size-invariant)."""
    h, w, _ = px.shape
    ri = ((np.arange(k) + 0.5) * h / k).astype(np.int64).clip(0, h - 1)
    ci = ((np.arange(k) + 0.5) * w / k).astype(np.int64).clip(0, w - 1)
    g = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    return g[np.ix_(ri, ci)]


class ImagePixelDecoder:
    """REAL decode stage (BMP/PNM native, PIL-gated otherwise): appends
    decoded dims, per-channel means (x1000 int64 — deterministic), and
    a 64-dim grayscale thumbnail vector for downstream similarity."""

    def __init__(self, thumb_k: int = 8):
        self.k = thumb_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dims = np.zeros((n, 2), dtype=np.int32)
        means = np.zeros((n, 3), dtype=np.int64)
        thumbs = np.zeros((n, self.k * self.k), dtype=np.float32)
        for i, p in enumerate(batch.column("payload").to_pylist()):
            px = decode_image(p)
            dims[i] = (px.shape[0], px.shape[1])
            means[i] = (px.reshape(-1, 3).mean(axis=0) * 1000).astype(np.int64)
            thumbs[i] = _thumb_gray(px, self.k).reshape(-1)
        out = (batch.append_column("dec_height", pa.array(dims[:, 0]))
               .append_column("dec_width", pa.array(dims[:, 1]))
               .append_column("mean_r", pa.array(means[:, 0]))
               .append_column("mean_g", pa.array(means[:, 1]))
               .append_column("mean_b", pa.array(means[:, 2])))
        flat = pa.array(thumbs.reshape(-1), pa.float32())
        return out.append_column(
            "thumb", pa.FixedSizeListArray.from_arrays(flat, self.k * self.k))


class ImageAHash:
    """Average-hash perceptual fingerprint over the thumbnail column:
    bit i = thumb[i] > mean(thumb).  64-bit int64 column `ahash` —
    exact-match grouping on it is the standard image near-dup recipe
    (same shape as text exact dedup: hash shuffles, pixels don't)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("thumb")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        k2 = col.type.list_size
        m = np.asarray(col.values, dtype=np.float64).reshape(-1, k2)
        bits = m > m.mean(axis=1, keepdims=True)
        weights = (np.uint64(1) << np.arange(k2, dtype=np.uint64))
        h = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return batch.append_column(
            "ahash", pa.array(h.view(np.int64), pa.int64()))


AUDIO_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("payload", pa.large_binary()),   # PCM16LE mono
    ("sample_rate", pa.int32()),
    ("mime", pa.string()),
])


def synth_audio_table(n: int, seed: int = 4, sample_rate: int = 16000,
                      seconds: float = 1.0) -> pa.Table:
    """Deterministic PCM16 mono clips (sine + noise) — unlike the image
    payloads these are REAL audio buffers, so the audio stages below run
    genuine kernels, not fakes."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(sample_rate * seconds)) / sample_rate
    payloads, mimes = [], []
    for i in range(n):
        freq = 100.0 + 50.0 * (i % 20)
        wave = 0.5 * np.sin(2 * np.pi * freq * t) \
            + 0.05 * rng.standard_normal(len(t))
        pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
        # odd items ship the SAME samples inside a real RIFF WAVE
        # container (rate read from the fmt chunk, not the column)
        if i % 2:
            payloads.append(encode_wav(pcm, sample_rate))
            mimes.append("audio/wav")
        else:
            payloads.append(pcm)
            mimes.append("audio/pcm16")
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.large_binary()),
        "sample_rate": pa.array(np.full(n, sample_rate, dtype=np.int32)),
        "mime": pa.array(mimes),
    })


def encode_wav(pcm: bytes, sample_rate: int, channels: int = 1) -> bytes:
    """PCM16 bytes -> RIFF WAVE (format 1, 16-bit) — a real wire format
    for audio fixtures, pure stdlib."""
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) % 2 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes):
    """RIFF WAVE bytes -> (pcm16 bytes, sample_rate, channels).
    Uncompressed PCM 8/16/24/32-bit (wFormatTag 1) and IEEE-float
    32/64-bit (wFormatTag 3) decode natively, normalized to PCM16;
    compressed formats (a/mu-law, ADPCM, mp3-in-wav) raise
    NotImplementedError."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE header missing)")
    pos, rate, channels, bits, fmt_tag, data = 12, None, None, None, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln % 2)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_tag == 1 and bits == 16:
        return data, rate, channels
    # real sample-format conversions (pure numpy) -> canonical PCM16
    if fmt_tag == 1 and bits == 8:           # unsigned 8-bit PCM
        x = np.frombuffer(data, np.uint8).astype(np.int16)
        return (((x - 128) << 8).astype("<i2").tobytes(), rate, channels)
    if fmt_tag == 1 and bits == 24:          # packed little-endian 24-bit
        b = np.frombuffer(data[:len(data) // 3 * 3], np.uint8) \
            .reshape(-1, 3)
        x = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = np.where(x >= 1 << 23, x - (1 << 24), x)
        return ((x >> 8).astype("<i2").tobytes(), rate, channels)
    if fmt_tag == 1 and bits == 32:          # signed 32-bit PCM
        x = np.frombuffer(data[:len(data) // 4 * 4], "<i4")
        return ((x >> 16).astype("<i2").tobytes(), rate, channels)
    if fmt_tag == 3 and bits in (32, 64):    # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        step = bits // 8
        x = np.frombuffer(data[:len(data) // step * step], dt)
        x = np.clip(x, -1.0, 1.0)
        return ((x * 32767.0).round().astype("<i2").tobytes(),
                rate, channels)
    if fmt_tag == 3:
        raise ValueError(f"malformed float WAV: {bits}-bit samples")
    raise NotImplementedError(
        f"WAV format {fmt_tag}/{bits}-bit needs ffmpeg; PCM 8/16/24/32 "
        "and IEEE-float 32/64 decode natively")


class AudioChunker:
    """One clip row -> fixed-duration chunk rows (flat_map shape).  REAL
    inputs: bare PCM16 buffers (mime audio/pcm16, rate from the column)
    and RIFF WAVE containers (sniffed from the payload; rate from the
    fmt chunk).  PCM16 slicing is real byte arithmetic; compressed
    codecs (mp3/ogg) would need ffmpeg and raise NotImplementedError."""

    def __init__(self, chunk_ms: int = 250):
        self.chunk_ms = chunk_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, chunks, rates = [], [], [], []
        rates_in = batch.column("sample_rate").to_pylist()
        for item_id, payload, rate, mime in zip(
                batch.column("item_id").to_pylist(),
                batch.column("payload").to_pylist(),
                rates_in, batch.column("mime").to_pylist()):
            data = payload or b""
            if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                data, rate, channels = decode_wav(data)
                if channels > 1:
                    # downmix interleaved PCM16 to mono (mean of
                    # channels): chunk duration and the downstream
                    # RMS/ZCR features are defined over ONE stream,
                    # not channel-interleaved samples
                    n_fr = len(data) // (2 * channels)
                    sm = np.frombuffer(data[:n_fr * 2 * channels],
                                       dtype="<i2")
                    mono = sm.reshape(n_fr, channels) \
                        .mean(axis=1).round().astype("<i2")
                    data = mono.tobytes()
            elif mime != "audio/pcm16":
                raise NotImplementedError(
                    f"decoding {mime} needs ffmpeg; not in this container")
            step = int(rate * self.chunk_ms / 1000) * 2  # bytes per chunk
            for j in range(0, max(len(data), 1), max(step, 2)):
                ids_out.append(item_id)
                idx_out.append(j // max(step, 2))
                chunks.append(data[j:j + step])
                rates.append(rate)
        return pa.table({"item_id": pa.array(ids_out, pa.int64()),
                         "chunk_idx": pa.array(idx_out, pa.int32()),
                         "payload": pa.array(chunks, pa.large_binary()),
                         "sample_rate": pa.array(rates, pa.int32())})


class AudioFeatureExtractor:
    """Per-chunk features over PCM16: RMS energy, zero-crossing rate,
    peak amplitude — real numpy kernels (no external codec needed for
    raw PCM)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rms = np.zeros(n)
        zcr = np.zeros(n)
        peak = np.zeros(n)
        for i, payload in enumerate(batch.column("payload").to_pylist()):
            if not payload or len(payload) < 4:
                continue
            x = np.frombuffer(payload[:len(payload) // 2 * 2], dtype="<i2") \
                  .astype(np.float64) / 32768.0
            rms[i] = float(np.sqrt(np.mean(x * x)))
            zcr[i] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            peak[i] = float(np.abs(x).max())
        return (batch.drop_columns(["payload"])
                .append_column("rms", pa.array(rms))
                .append_column("zcr", pa.array(zcr))
                .append_column("peak", pa.array(peak)))


class AudioSpectralExtractor:
    """STFT spectral features over audio payloads — the real DSP leg
    of the audio family (AudioFeatureExtractor covers time-domain
    RMS/ZCR/peak).  Hann-windowed frames (n_fft, hop) -> rfft -> mean
    magnitude spectrum per item, emitting:

    - dominant_freq_hz: argmax bin (DC excluded) * sr / n_fft — for a
      planted pure tone this lands within one bin width of the true
      frequency (Hann main lobe spans < 1 bin either side);
    - spectral_centroid_hz: magnitude-weighted mean frequency;
    - parseval_rel_err: max relative |sum(x_w^2) - (1/N) sum|X|^2|
      over frames — a built-in correctness check of the FFT path
      (identically ~1e-12 when the transform is right).

    Actor-pool stage: the window is built once in __init__; payloads
    decode PCM16 (raw or via the WAV container) per row, the FFT over
    all frames of an item is one vectorized rfft call.
    """

    def __init__(self, n_fft: int = 1024, hop: int = 512):
        self.n_fft, self.hop = n_fft, hop
        self.win = np.hanning(n_fft)

    def _pcm(self, payload: bytes, mime: str, sr: int):
        if mime == "audio/wav" or payload[:4] == b"RIFF":
            data, rate, _ch = decode_wav(payload)
            return np.frombuffer(data, "<i2").astype(np.float64) / 32768.0, \
                rate
        x = np.frombuffer(payload[:len(payload) // 2 * 2], "<i2")
        return x.astype(np.float64) / 32768.0, sr

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dom = np.full(n, np.nan)
        cen = np.full(n, np.nan)
        perr = np.full(n, np.nan)
        rates = (batch.column("sample_rate").to_numpy(zero_copy_only=False)
                 if "sample_rate" in batch.column_names
                 else np.full(n, 16000))
        mimes = (batch.column("mime").to_pylist()
                 if "mime" in batch.column_names else [""] * n)
        for i, payload in enumerate(batch.column("payload").to_pylist()):
            if not payload or len(payload) < 2 * self.n_fft:
                continue
            x, sr = self._pcm(payload, mimes[i], int(rates[i]))
            nf = (len(x) - self.n_fft) // self.hop + 1
            if nf < 1:
                continue
            idx = (np.arange(nf)[:, None] * self.hop
                   + np.arange(self.n_fft)[None, :])
            frames = x[idx] * self.win[None, :]
            spec = np.fft.rfft(frames, axis=1)
            p = np.abs(spec) ** 2
            # Parseval per frame: sum x^2 == (1/N)(|X0|^2 + 2*mid + |Xn|^2)
            tot = p[:, 0] + 2.0 * p[:, 1:-1].sum(axis=1) + p[:, -1]
            te = (frames * frames).sum(axis=1)
            perr[i] = float(np.max(np.abs(te - tot / self.n_fft)
                                   / np.maximum(te, 1e-30)))
            mag = np.sqrt(p).mean(axis=0)
            k = 1 + int(np.argmax(mag[1:]))
            dom[i] = k * sr / self.n_fft
            cen[i] = float((np.arange(len(mag)) * mag).sum()
                           / max(mag.sum(), 1e-30) * sr / self.n_fft)
        return (batch.drop_columns(["payload"])
                .append_column("dominant_freq_hz", pa.array(dom))
                .append_column("spectral_centroid_hz", pa.array(cen))
                .append_column("parseval_rel_err", pa.array(perr)))


# ------------------------------------------------------------------ real
# video container: AVI (RIFF) in pure stdlib — uncompressed 'DIB '
# frames (what `ffmpeg -c:v rawvideo out.avi` writes) AND Motion-JPEG
# ('MJPG' handler, one baseline JPEG per '00dc' chunk, decoded by
# stages/jpegcodec.py — what `ffmpeg -c:v mjpeg out.avi` writes).
# Other codecs (h264/vp9/...) still need ffmpeg and stay honestly
# NotImplementedError.

_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def encode_avi(frames: list, fps: int = 10, codec: str = "DIB",
               quality: int = 90) -> bytes:
    """list of (H, W, 3) uint8 RGB frames -> AVI bytes (RIFF 'AVI ':
    hdrl{avih, strl{strh 'vids', strf}}, movi, idx1).  codec='DIB'
    writes bottom-up BGR '00db' frames (BI_RGB); codec='MJPG' writes
    one baseline JPEG per '00dc' chunk (biCompression='MJPG')."""
    assert frames, "need at least one frame"
    h, w, c = frames[0].shape
    assert c == 3
    if codec == "DIB":
        row_len = (w * 3 + 3) & ~3
        fsz = row_len * h

        def enc(px: np.ndarray) -> bytes:
            rows = np.zeros((h, row_len), dtype=np.uint8)
            rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
            return rows.tobytes()

        handler, comp, tag = b"DIB ", 0, b"00db"
        payloads = [enc(f) for f in frames]
    elif codec == "MJPG":
        from .jpegcodec import encode_jpeg

        handler, comp, tag = b"MJPG", _MJPG_FOURCC, b"00dc"
        payloads = [encode_jpeg(f, quality=quality) for f in frames]
        fsz = max(len(p) for p in payloads)
    else:
        raise NotImplementedError(f"encode_avi codec {codec!r}")

    def chunk(ctag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return ctag + struct.pack("<I", len(data)) + data + pad

    def lst(ltag: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltag + data)

    avih = struct.pack("<10I", 1_000_000 // fps, fsz * fps, 0, 0x10,
                       len(frames), 0, 1, fsz, w, h) + b"\x00" * 16
    strh = (b"vids" + handler + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames), fsz,
                                            0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp, fsz,
                       2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_frames = b"".join(chunk(tag, p) for p in payloads)
    movi = lst(b"movi", movi_frames)
    # idx1: offsets relative to the start of the movi LIST data
    idx = bytearray()
    off = 4                                  # past the 'movi' fourcc
    for p in payloads:
        idx += tag + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(buf: bytes):
    """AVI bytes -> (frames, width, height) where frames is a list of
    (H, W, 3) uint8 RGB arrays.  Decodes uncompressed 24-bit DIB
    streams and Motion-JPEG ('MJPG' handler or biCompression fourcc,
    via the pure-numpy baseline JPEG decoder).  Other codecs raise
    NotImplementedError; malformed RIFF raises ValueError."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/AVI  header missing)")
    w = h = None
    bpp = None
    comp = 0
    handler = None
    frame_chunks = []

    def walk(data: bytes):
        nonlocal w, h, bpp, comp, handler
        pos = 0
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            (ln,) = struct.unpack_from("<I", data, pos + 4)
            body = data[pos + 8:pos + 8 + ln]
            if len(body) < ln:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                walk(body[4:])               # skip the list-type fourcc
            elif tag == b"strh":
                if body[:4] == b"vids":
                    handler = body[4:8]
            elif tag == b"strf" and w is None:
                if len(body) < 16:
                    raise ValueError("truncated AVI strf header")
                _, w_, h_, _, bpp_ = struct.unpack_from("<IiiHH", body, 0)
                w, h, bpp = w_, abs(h_), bpp_
                if len(body) >= 20:
                    (comp,) = struct.unpack_from("<I", body, 16)
            elif tag in (b"00db", b"00dc"):
                frame_chunks.append(body)
            pos += 8 + ln + (ln % 2)         # chunks pad to even

    walk(buf[12:])
    if w is None or not frame_chunks:
        raise ValueError("AVI missing strf header or frames")
    if handler == b"MJPG" or comp == _MJPG_FOURCC:
        from .jpegcodec import decode_jpeg

        frames = []
        for fb in frame_chunks:
            px = decode_jpeg(bytes(fb))
            if px.ndim == 2:                 # grayscale MJPEG stream
                px = np.repeat(px[:, :, None], 3, axis=2)
            frames.append(px)
        return frames, w, h
    if handler not in (b"DIB ", b"\x00\x00\x00\x00", b"RGB ") or bpp != 24:
        raise NotImplementedError(
            f"AVI codec {handler!r}/{bpp}bpp needs ffmpeg; only "
            "uncompressed 24-bit DIB and MJPG decode natively")
    row_len = (w * 3 + 3) & ~3
    frames = []
    for fb in frame_chunks:
        if len(fb) < row_len * h:
            raise ValueError("truncated AVI frame")
        rows = np.frombuffer(fb[:row_len * h], np.uint8).reshape(h, row_len)
        frames.append(rows[:, :w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy())
    return frames, w, h


# ------------------------------------------------------------------ Y4M
# YUV4MPEG2 — the standard uncompressed video interchange container
# (ffmpeg/mjpegtools): one ASCII header line, then "FRAME\n" + planar
# YUV per frame.  Pure-numpy decode, no ffmpeg.  Color conversion is
# FIXED-POINT integer (the libjpeg constants scaled by 2^16) so decoded
# pixels are deterministic across platforms — documented approximation
# of the float JPEG full-range matrix, exact for grayscale (Cmono).

_Y4M_MAGIC = b"YUV4MPEG2 "


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-range JPEG YCbCr -> RGB, fixed-point (>>16 arithmetic)."""
    yy = y.astype(np.int32)
    cu = u.astype(np.int32) - 128
    cv = v.astype(np.int32) - 128
    r = yy + ((91881 * cv) >> 16)
    g = yy - ((22554 * cu + 46802 * cv) >> 16)
    b = yy + ((116130 * cu) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _rgb_to_yuv(px: np.ndarray):
    """Full-range JPEG RGB -> YCbCr, fixed-point with round-half-up."""
    r = px[..., 0].astype(np.int32)
    g = px[..., 1].astype(np.int32)
    b = px[..., 2].astype(np.int32)
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    u = ((-11058 * r - 21710 * g + 32768 * b + 32768) >> 16) + 128
    v = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
    clip = lambda a: np.clip(a, 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(u), clip(v)


def encode_y4m(frames: list, fps: int = 10,
               colorspace: str = "C444") -> bytes:
    """RGB frames -> YUV4MPEG2 bytes.  colorspace: C444 (no chroma
    subsampling), C420jpeg (2x2 box-averaged chroma) or Cmono
    (luma only — exact round trip for gray inputs)."""
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    h, w = frames[0].shape[:2]
    if colorspace == "C420jpeg" and (w % 2 or h % 2):
        raise ValueError("C420jpeg needs even dimensions")
    out = [b"%sW%d H%d F%d:1 Ip A1:1 %s\n"
           % (_Y4M_MAGIC, w, h, fps, colorspace.encode())]
    for px in frames:
        y, u, v = _rgb_to_yuv(px)
        out.append(b"FRAME\n")
        out.append(y.tobytes())
        if colorspace == "C444":
            out.append(u.tobytes())
            out.append(v.tobytes())
        elif colorspace == "C420jpeg":
            for c in (u, v):
                c4 = c.astype(np.uint16).reshape(h // 2, 2, w // 2, 2)
                out.append(((c4.sum(axis=(1, 3)) + 2) >> 2)
                           .astype(np.uint8).tobytes())
        elif colorspace != "Cmono":
            raise NotImplementedError(f"colorspace {colorspace}")
    return b"".join(out)


def decode_y4m(buf: bytes):
    """YUV4MPEG2 bytes -> (frames, width, height); frames are (H, W, 3)
    uint8 RGB.  Handles C444, C420/C420jpeg/C420mpeg2/C420paldv
    (nearest-neighbor chroma upsample) and Cmono.  Other colorspaces
    raise NotImplementedError; malformed streams raise ValueError."""
    if not buf.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = buf.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M header")
    w = h = None
    cs = "C420jpeg"                      # the spec default is 4:2:0
    for tok in buf[len(_Y4M_MAGIC):nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            cs = tok.decode()
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs.startswith("C420"):
        fsz, sub = w * h + 2 * ((w // 2) * (h // 2)), 2
        if w % 2 or h % 2:
            raise ValueError("C420 needs even dimensions")
    elif cs == "C444":
        fsz, sub = 3 * w * h, 1
    elif cs == "Cmono":
        fsz, sub = w * h, 0
    else:
        raise NotImplementedError(f"Y4M colorspace {cs} needs ffmpeg")
    frames, pos = [], nl + 1
    while pos < len(buf):
        fnl = buf.find(b"\n", pos)
        if fnl < 0 or buf[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M FRAME marker")
        pos = fnl + 1
        if pos + fsz > len(buf):
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(buf[pos:pos + w * h], np.uint8).reshape(h, w)
        if sub == 0:
            frames.append(np.repeat(y[:, :, None], 3, axis=2))
        else:
            cw, ch = w // sub, h // sub
            csz = cw * ch
            u = np.frombuffer(buf[pos + w * h:pos + w * h + csz],
                              np.uint8).reshape(ch, cw)
            v = np.frombuffer(buf[pos + w * h + csz:pos + fsz],
                              np.uint8).reshape(ch, cw)
            if sub == 2:
                u = u.repeat(2, 0).repeat(2, 1)
                v = v.repeat(2, 0).repeat(2, 1)
            frames.append(_yuv_to_rgb(y, u, v))
        pos += fsz
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return frames, w, h
