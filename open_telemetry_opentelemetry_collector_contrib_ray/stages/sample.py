"""Deterministic hash samplers.

Reference: probabilisticsamplerprocessor for logs
(/root/reference/processor/probabilisticsamplerprocessor/
logsprocessor.go:122-141,211-260): hash of trace-id or a configured
attribute + seed, compared against sampling_percentage.  Deterministic:
the same record always gets the same verdict — embarrassingly parallel.

This engine hashes with md5 (lower 64 bits, little-endian — bit-exact
with DuckDB's ``md5_number_lower`` so the correctness oracle can
reproduce the verdicts in SQL), scaled to a 0..9999 bucket like the
reference's percent*100 threshold space.

Stanza's probabilistic drop_ratio filter
(pkg/stanza/operator/transformer/filter/config.go:44-67) is the same
mechanism with drop semantics inverted.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _md5_lower64(values: list) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    md5 = hashlib.md5
    for i, s in enumerate(values):
        if s is None:
            out[i] = 0
        else:
            out[i] = int.from_bytes(md5(str(s).encode()).digest()[8:16], "little")
    return out


class ProbabilisticSampler:
    """Keep rows where md5_lower64(attr) % 10000 < percentage*100."""

    def __init__(self, percentage: float, attribute_source: str = "conv_id",
                 invert: bool = False):
        self.threshold = int(percentage * 100)  # 0..10000 space
        self.attribute_source = attribute_source
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        vals = batch.column(self.attribute_source).to_pylist()
        buckets = _md5_lower64(vals) % np.uint64(10000)
        keep = buckets < self.threshold
        if self.invert:
            keep = ~keep
        return batch.filter(pa.array(keep))


class HashBucketStage:
    """Adds a stable hash-bucket column (loadbalancingexporter ring analog,
    exporter/loadbalancingexporter/consistent_hashing.go:11-50): the
    routing key for partitioned writes / co-located shuffles."""

    def __init__(self, source: str = "conv_id", num_buckets: int = 64,
                 out: str = "bucket"):
        self.source = source
        self.num_buckets = num_buckets
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch.column(self.source).to_pylist()
        b = (_md5_lower64(vals) % np.uint64(self.num_buckets)).astype(np.int32)
        return batch.append_column(self.out, pa.array(b))
