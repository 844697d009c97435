"""Per-partition lineage records + telemetry metrics.

The north rule requires every partition to emit lineage (rows in/out,
parse failures, route counts) enabling checkpoint-resumable execution.
Reference analogs: the collector's telemetry counters (filterprocessor
"records dropped", logs_test.go MockBackend receive counts) and the
stanza checkpoint offsets (pkg/stanza/fileconsumer/file.go:57-89).

Design: a `LineageRecorder` wraps the final per-batch stage; as each
Arrow batch flows through, it appends ONE tiny JSON file (uuid-named,
so concurrent tasks never collide) with the batch's counters.  Sink
aggregate counts then come from summing the lineage sidecars — the
countconnector's counter map re-expressed as a metrics sidecar, costing
one in-memory group_by per batch instead of a second pipeline pass.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


class LineageRecorder:
    """Wraps a per-batch callable; records counters per processed batch."""

    def __init__(self, inner: Callable[[pa.Table], pa.Table], lineage_dir: str,
                 count_keys: tuple[str, ...] = ("route_id", "role"),
                 naming: str = "content"):
        """naming="content" (default): sidecar names derive from batch
        content so task retries overwrite instead of double-counting —
        the tradeoff is that two GENUINELY IDENTICAL batches (possible
        in duplicate-heavy corpora when batches align exactly) collide
        and undercount; naming="random" keeps one sidecar per attempt
        (retries double-count, distinct batches never collide)."""
        self.inner = inner
        self.lineage_dir = lineage_dir
        self.count_keys = list(count_keys)
        self.naming = naming
        os.makedirs(lineage_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.inner(batch) if self.inner is not None else batch
        rec: dict = {"rows_in": batch.num_rows, "rows_out": out.num_rows}
        if "parse_failure" in out.column_names:
            rec["parse_failures"] = int(
                pc.sum(pc.fill_null(out.column("parse_failure"), False)).as_py() or 0)
        keys = [k for k in self.count_keys if k in out.column_names]
        if keys and out.num_rows:
            gb = out.group_by(keys).aggregate([([], "count_all")])
            rec["counts"] = {
                "keys": keys,
                "rows": [
                    [gb.column(k)[i].as_py() for k in keys] + [gb.column("count_all")[i].as_py()]
                    for i in range(gb.num_rows)
                ],
            }
        os.makedirs(self.lineage_dir, exist_ok=True)  # worker-side (shared fs on a cluster)
        # sidecar name derives from the INPUT batch's content, so a Ray
        # task retry / speculative re-execution of the same batch
        # OVERWRITES its sidecar instead of double-counting rows in the
        # lineage totals (uuid names accumulated one file per attempt)
        if self.naming == "random":
            name = f"batch-{uuid.uuid4().hex}"
            path = os.path.join(self.lineage_dir, f"{name}.json")
            tmp = f"{path}.{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.rename(tmp, path)
            return out
        try:
            from ..stages.sample import hash64

            # identity from the cheap stable id columns when present —
            # hashing full text per batch would tax the hot path
            id_cols = [c for c in ("conv_id", "turn_idx", "event_id",
                                   "doc_id", "vec_id", "ts")
                       if c in batch.column_names] or batch.column_names
            digest = int(hash64(batch, id_cols).sum()) \
                if batch.num_rows else 0
            name = f"batch-{batch.num_rows}-{digest & 0xFFFFFFFFFFFFFFFF:016x}"
        except Exception:  # unhashable column types: fall back to random
            name = f"batch-{uuid.uuid4().hex}"
        path = os.path.join(self.lineage_dir, f"{name}.json")
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"  # unique tmp: concurrent retries
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.rename(tmp, path)
        return out


def summarize_lineage(lineage_dir: str) -> dict:
    """Totals across all batch sidecars."""
    total = {"rows_in": 0, "rows_out": 0, "parse_failures": 0, "batches": 0}
    for name in os.listdir(lineage_dir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(lineage_dir, name)) as f:
            rec = json.load(f)
        total["rows_in"] += rec.get("rows_in", 0)
        total["rows_out"] += rec.get("rows_out", 0)
        total["parse_failures"] += rec.get("parse_failures", 0)
        total["batches"] += 1
    return total


def counts_from_lineage(lineage_dir: str) -> pa.Table:
    """Per-sink aggregate counts from the lineage sidecars (tiny driver merge)."""
    agg: dict[tuple, int] = {}
    keys: list[str] | None = None
    for name in os.listdir(lineage_dir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(lineage_dir, name)) as f:
            rec = json.load(f)
        c = rec.get("counts")
        if not c:
            continue
        keys = c["keys"]
        for row in c["rows"]:
            k = tuple(row[:-1])
            agg[k] = agg.get(k, 0) + row[-1]
    if keys is None:
        return pa.table({"n": pa.array([], pa.int64())})
    cols: dict[str, list] = {k: [] for k in keys}
    ns = []
    for k, n in sorted(agg.items()):
        for i, kk in enumerate(keys):
            cols[kk].append(k[i])
        ns.append(n)
    return pa.table({**{k: pa.array(v) for k, v in cols.items()},
                     "n": pa.array(ns, pa.int64())})
