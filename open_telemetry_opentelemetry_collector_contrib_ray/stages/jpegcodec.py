"""Pure-numpy baseline JPEG (ITU-T T.81) codec — no PIL, no libjpeg.

Closes the one formerly PIL-gated image path: `decode_jpeg` handles
baseline sequential DCT JFIF files (SOF0, 8-bit, grayscale or YCbCr
with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers), which is what
web crawls overwhelmingly contain.  `encode_jpeg` produces 4:4:4
baseline files with the Annex K tables so fixtures are self-contained.

This is a CORRECTNESS baseline, not a throughput kernel: the Huffman
entropy loop is per-symbol Python (the IDCT/color math is vectorized
numpy).  In a production deployment the decode actor imports PIL /
nvJPEG; the Ray-side contract (ImageDecoder / ImageAHash in
multimodal.py) is identical either way.

Spec references: ITU-T T.81 Annex F (baseline), Annex K (example
tables); JFIF 1.02 for the YCbCr <-> RGB matrix.  Progressive
(SOF2), arithmetic coding and 12-bit precision raise
NotImplementedError honestly.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# T.81 Annex K.1 example quantization tables
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# T.81 Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8x8 DCT-II matrix: T @ block @ T.T == T.81 FDCT exactly
_T = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    _T[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)


def _canonical_codes(bits, values):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 C.2."""
    out, code = {}, 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """(BITS, HUFFVAL) -> {(length, code): symbol}."""
    enc = _canonical_codes(bits, values)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def quality_tables(quality: int = 85):
    """IJG quality scaling of the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((QUANT_LUM * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROM * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:              # byte stuffing (F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s


def _magnitude(v: int):
    """value -> (size, code bits) per F.1.2.1/F.1.2.2."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(bw, q_block, dc_pred, dc_tbl, ac_tbl):
    zz = q_block.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - dc_pred
    s, bits = _magnitude(diff)
    code, ln = dc_tbl[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]          # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if last < 63:
        code, ln = ac_tbl[0x00]              # EOB
        bw.write(code, ln)
    return int(zz[0])


def _dqt_segment(tid: int, q: np.ndarray) -> bytes:
    return (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(x) for x in q.reshape(-1)[ZIGZAG]))


def _dht_segment(cls: int, tid: int, bits, values) -> bytes:
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) uint8 gray -> baseline JFIF bytes
    (Annex K Huffman tables, IJG quality scaling).  subsampling: "444"
    or "420" (2x2 box-averaged chroma); restart_interval > 0 emits DRI
    + RSTn markers every that many MCUs — both exist mainly so the
    decoder's interleave/restart paths are testable without libjpeg."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    ql, qc = quality_tables(quality)
    sub = subsampling == "420" and not gray
    if gray:
        comps = [{"plane": pixels.astype(np.float64) - 128.0, "q": ql,
                  "h": 1, "v": 1, "tsel": 0, "tq": 0}]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        if sub:
            # pad to even dims, 2x2 box average
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def half(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cb, cr = half(cb), half(cr)
            comps = [
                {"plane": y - 128.0, "q": ql, "h": 2, "v": 2, "tsel": 0,
                 "tq": 0},
                {"plane": cb - 128.0, "q": qc, "h": 1, "v": 1, "tsel": 1,
                 "tq": 1},
                {"plane": cr - 128.0, "q": qc, "h": 1, "v": 1, "tsel": 1,
                 "tq": 1}]
        else:
            comps = [
                {"plane": y - 128.0, "q": ql, "h": 1, "v": 1, "tsel": 0,
                 "tq": 0},
                {"plane": cb - 128.0, "q": qc, "h": 1, "v": 1, "tsel": 1,
                 "tq": 1},
                {"plane": cr - 128.0, "q": qc, "h": 1, "v": 1, "tsel": 1,
                 "tq": 1}]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    dc_enc = [_canonical_codes(*DC_LUM), _canonical_codes(*DC_CHROM)]
    ac_enc = [_canonical_codes(*AC_LUM), _canonical_codes(*AC_CHROM)]

    # pad planes to the MCU grid by edge replication, quantize vectorized
    for c in comps:
        p = c["plane"]
        tb_h, tb_w = mcuy * c["v"] * 8, mcux * c["h"] * 8
        pad = np.pad(p, ((0, tb_h - p.shape[0]), (0, tb_w - p.shape[1])),
                     mode="edge")
        blocks = pad.reshape(tb_h // 8, 8, tb_w // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,abjk,lk->abil", _T, blocks, _T)
        c["qblocks"] = np.round(coef / c["q"]).astype(np.int64)

    writer = _BitWriter()
    preds = [0] * len(comps)
    mcu_idx = 0
    rst = 0
    entropy = bytearray()
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                writer.flush()
                entropy += writer.buf
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        preds[ci] = _encode_block(
                            writer,
                            c["qblocks"][my * c["v"] + vy,
                                         mx * c["h"] + vx],
                            preds[ci], dc_enc[c["tsel"]], ac_enc[c["tsel"]])
            mcu_idx += 1
    writer.flush()
    entropy += writer.buf

    out = bytearray(b"\xff\xd8")                       # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x02" + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += _dqt_segment(0, ql)
    ncomp = len(comps)
    if not gray:
        out += _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, *DC_LUM) + _dht_segment(1, 0, *AC_LUM)
    if not gray:
        out += _dht_segment(0, 1, *DC_CHROM) + _dht_segment(1, 1, *AC_CHROM)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci, c in enumerate(comps):
        sos += bytes([ci + 1, (c["tsel"] << 4) | c["tsel"]])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader over de-stuffed scan bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy segment")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        self.nbits = 0


def _extend(v: int, s: int) -> int:
    """F.2.2.1 EXTEND: size-s code bits -> signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _read_huffman(reader: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | reader.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB (grayscale replicates
    into 3 channels, matching decode_image's contract)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant = {}
    huff_dc, huff_ac = {}, {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan = None
    scan_comps = None

    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2:pos + seglen]
        if pos + seglen > len(buf):
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = vals.astype(np.int64)
                quant[tq] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC1):             # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) supported")
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                values = list(seg[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(
                    bits, values)
                i += 17 + n
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                     # SOS
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tables = seg[1 + si * 2], seg[2 + si * 2]
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            scan_start = pos + seglen
            # find scan end: next marker that is not RSTn/stuffed-FF
            end = scan_start
            while end < len(buf) - 1:
                if buf[end] == 0xFF and buf[end + 1] not in (0x00,) \
                        and not (0xD0 <= buf[end + 1] <= 0xD7):
                    break
                end += 1
            scan = buf[scan_start:end]
            pos = end
            continue
        pos += seglen

    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component quantized coefficient planes (block granularity)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"], c["bw"], 8, 8), dtype=np.int64)
    by_id = {c["id"]: c for c in comps}
    order = [(by_id[cs], dct, act) for cs, dct, act in scan_comps]

    # de-stuff + split on restart markers
    segments = []
    cur = bytearray()
    i = 0
    while i < len(scan):
        b = scan[i]
        if b == 0xFF:
            nxt = scan[i + 1] if i + 1 < len(scan) else 0
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    mcu_total = mcux * mcuy
    per_seg = restart_interval if restart_interval else mcu_total
    mcu_idx = 0
    for seg_bytes in segments:
        reader = _BitReader(seg_bytes)
        preds = {c["id"]: 0 for c in comps}
        seg_mcus = min(per_seg, mcu_total - mcu_idx)
        for _ in range(seg_mcus):
            my, mx = divmod(mcu_idx, mcux)
            for comp, dct, act in order:
                dtab, atab = huff_dc[dct], huff_ac[act]
                for vy in range(comp["v"]):
                    for vx in range(comp["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = _read_huffman(reader, dtab)
                        diff = _extend(reader.bits(s), s) if s else 0
                        preds[comp["id"]] += diff
                        blk[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_huffman(reader, atab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break                      # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(reader.bits(s), s)
                            k += 1
                        row = my * comp["v"] + vy
                        col = mx * comp["h"] + vx
                        comp["coef"][row, col] = blk[UNZIGZAG].reshape(8, 8)
            mcu_idx += 1

    # dequantize + IDCT, vectorized over all blocks per component
    planes = []
    for c in comps:
        q = quant[c["tq"]]
        deq = c["coef"].astype(np.float64) * q
        sp = np.einsum("ji,abjk,kl->abil", _T, deq, _T)   # T.T @ F @ T
        plane = sp.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        plane += 128.0
        # upsample to full MCU-grid resolution then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
