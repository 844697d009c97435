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
