"""Multimodal column stages: image/audio/video as opaque binary columns.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are STUBBED — clearly marked, behind import guards —
while the Ray-side plumbing (schema, batch sizing, actor signature,
output layout) is real and tested with the deterministic fake decoder.

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
    """Actor-pool decode stage.  Real decode requires PIL — stubbed here.

    With use_fake=True (default in this container) it produces a
    deterministic pseudo-decode (mean 'pixel' from payload bytes) so the
    pipeline shape is executable end-to-end."""

    def __init__(self, use_fake: bool | None = None):
        if use_fake is None:
            try:
                import PIL.Image  # noqa: F401

                use_fake = False
            except ImportError:
                use_fake = True
        self.use_fake = use_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.use_fake:
            raise NotImplementedError(
                "real image decode needs PIL; not available in this container")
        payloads = batch.column("payload").to_pylist()
        mean_px = pa.array([float(np.frombuffer(p, np.uint8).mean()) if p else 0.0
                            for p in payloads], pa.float64())
        n_bytes = pa.array([len(p or b"") for p in payloads], pa.int64())
        return (batch.append_column("mean_pixel", mean_px)
                     .append_column("n_bytes", n_bytes))


class ImageFeatureExtractor:
    """Feature-vector stage (CNN/CLIP in real life — stubbed with a
    deterministic hash-derived vector; the actor/batch contract is real)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            digest = hashlib.sha256(p or b"").digest()
            feats[i] = np.frombuffer(digest[:self.dim * 2], np.uint8)[:self.dim] / 255.0
        flat = pa.array(feats.reshape(-1), pa.float32())
        return batch.append_column(
            "features", pa.FixedSizeListArray.from_arrays(flat, self.dim))


class FrameSampler:
    """Video frame-sampling contract: one input row -> k frame rows
    (flat_map shape).  Decode stubbed; the row-expansion plumbing is real."""

    def __init__(self, frames_per_item: int = 4):
        self.k = frames_per_item

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.repeat(np.asarray(batch.column("item_id")), self.k)
        frame_idx = np.tile(np.arange(self.k, dtype=np.int32), n)
        payloads = batch.column("payload").to_pylist()
        frames = []
        for p in payloads:
            data = p or b""
            step = max(1, len(data) // self.k)
            for j in range(self.k):
                frames.append(data[j * step:(j + 1) * step])
        return pa.table({"item_id": pa.array(ids),
                         "frame_idx": pa.array(frame_idx),
                         "frame_payload": pa.array(frames, pa.large_binary())})


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
    payloads = []
    for i in range(n):
        freq = 100.0 + 50.0 * (i % 20)
        wave = 0.5 * np.sin(2 * np.pi * freq * t) \
            + 0.05 * rng.standard_normal(len(t))
        payloads.append((np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes())
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.large_binary()),
        "sample_rate": pa.array(np.full(n, sample_rate, dtype=np.int32)),
        "mime": pa.array(["audio/pcm16"] * n),
    })


class AudioChunker:
    """One clip row -> fixed-duration chunk rows (flat_map shape).  PCM16
    slicing is real byte arithmetic; compressed codecs (mp3/ogg) would
    need ffmpeg and raise NotImplementedError."""

    def __init__(self, chunk_ms: int = 250):
        self.chunk_ms = chunk_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, chunks, rates = [], [], [], []
        rates_in = batch.column("sample_rate").to_pylist()
        for item_id, payload, rate, mime in zip(
                batch.column("item_id").to_pylist(),
                batch.column("payload").to_pylist(),
                rates_in, batch.column("mime").to_pylist()):
            if mime != "audio/pcm16":
                raise NotImplementedError(
                    f"decoding {mime} needs ffmpeg; not in this container")
            step = int(rate * self.chunk_ms / 1000) * 2  # bytes per chunk
            data = payload or b""
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
