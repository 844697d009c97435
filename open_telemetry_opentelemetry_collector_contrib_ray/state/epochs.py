"""Incremental epoch processing: streaming arrivals as batch epochs.

The reference's wall-clock windows (logdedup `interval`,
intervalprocessor flush timers — SURVEY.md §2.10) become ARRIVAL
EPOCHS in a batch engine: each run processes the newly-arrived files,
writes a MERGEABLE aggregate for the epoch, and the current view is the
group-merge of all epoch aggregates.  Late data simply lands in a later
epoch and merges by key — the deltatocumulative "late deltas merged by
stream identity" behavior.

State layout: <state_dir>/epoch=<NNNN>/agg.parquet (+ _EPOCHS.json
manifest).  Epoch aggregates are tiny relative to inputs, so the merge
reads kilobytes-to-megabytes regardless of corpus size.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_EPOCHS.json")


def list_epochs(state_dir: str) -> list[int]:
    if not os.path.exists(_manifest_path(state_dir)):
        return []
    with open(_manifest_path(state_dir)) as f:
        return json.load(f)["epochs"]


def dedup_epoch(state_dir: str, new_files: Sequence[str],
                key_cols: Sequence[str], ts_col: str = "ts",
                order_col: str = "turn_idx") -> int:
    """Process one arrival epoch: dedup-aggregate the new files and append
    the epoch's mergeable aggregate to the state dir.  Returns epoch id."""
    import ray.data as rd

    from ..stages.aggregate import dedup_exact

    epochs = list_epochs(state_dir)
    epoch_id = (max(epochs) + 1) if epochs else 0
    ds = rd.read_parquet(list(new_files))
    agg = dedup_exact(ds, key_cols, ts_col=ts_col, order_col=order_col)
    edir = os.path.join(state_dir, f"epoch={epoch_id:04d}")
    os.makedirs(edir + ".tmp", exist_ok=True)
    # materialize first: dedup_exact contains a shuffle, and to_arrow_refs'
    # limit-1 schema probe would otherwise run the whole dedup twice
    tables = agg.materialize().to_arrow_refs()
    import ray

    merged = pa.concat_tables([t for t in ray.get(tables) if t.num_rows],
                              promote_options="permissive")
    pq.write_table(merged, os.path.join(edir + ".tmp", "agg.parquet"))
    os.rename(edir + ".tmp", edir)
    with open(_manifest_path(state_dir), "w") as f:
        json.dump({"epochs": epochs + [epoch_id]}, f)
    return epoch_id


def dedup_state_view(state_dir: str, key_cols: Sequence[str]) -> pa.Table:
    """Current dedup view: group-merge all epoch aggregates (counts sum,
    first min, last max, representative min)."""
    parts = []
    for e in list_epochs(state_dir):
        parts.append(pq.read_table(
            os.path.join(state_dir, f"epoch={e:04d}", "agg.parquet")))
    if not parts:
        raise FileNotFoundError(f"no epochs in {state_dir}")
    merged = pa.concat_tables(parts, promote_options="permissive")
    rep_col = [c for c in merged.column_names if c.startswith("representative_")][0]
    gb = merged.group_by(list(key_cols)).aggregate([
        ("log_count", "sum"), ("first_observed", "min"),
        ("last_observed", "max"), (rep_col, "min"),
    ])
    return pa.table({
        **{k: gb.column(k) for k in key_cols},
        "log_count": gb.column("log_count_sum"),
        "first_observed": gb.column("first_observed_min"),
        "last_observed": gb.column("last_observed_max"),
        rep_col: gb.column(f"{rep_col}_min"),
    })
