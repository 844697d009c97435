"""Checkpoint-resumable sharded execution.

Reference analog: stanza fileconsumer offset checkpoints
(/root/reference/pkg/stanza/fileconsumer/file.go:57-66 load, :86-89
save; storage extensions under extension/storage/).  Batch
re-expression: the unit of checkpointing is an INPUT SHARD (a group of
input files / a key range).  Each shard's output goes to its own
directory, written atomically (tmp dir + rename) with a _MANIFEST.json
recording input files and row counts; a rerun skips shards whose
manifest is complete.  Failed/killed runs leave no partial shard dirs.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Sequence


def shard_inputs(files: Sequence[str], n_shards: int) -> list[list[str]]:
    files = sorted(files)
    n_shards = max(1, min(n_shards, len(files)))
    per = (len(files) + n_shards - 1) // n_shards
    return [list(files[i * per:(i + 1) * per]) for i in range(n_shards)
            if files[i * per:(i + 1) * per]]


def _manifest_path(shard_dir: str) -> str:
    return os.path.join(shard_dir, "_MANIFEST.json")


def shard_complete(out_root: str, shard_id: int) -> bool:
    return os.path.exists(_manifest_path(os.path.join(out_root, f"shard={shard_id:05d}")))


def run_resumable(
    files: Sequence[str],
    out_root: str,
    run_shard: Callable[[list[str], str], dict],
    n_shards: int = 16,
    store=None,
) -> dict:
    """Process shards, skipping completed ones.

    run_shard(input_files, tmp_out_dir) -> stats dict; it must write its
    output under tmp_out_dir.  On return the shard dir is atomically
    renamed into place and the manifest written.  Returns run summary.

    ``store``: optional ``state.dbstorage.DbStorage`` — the dbstorage-
    extension analog.  When given, shard manifests are ALSO recorded
    under key ``shard=<id>`` in the sqlite file and completion is
    decided from the store (a missing/mismatching store entry reruns
    the shard even if a directory manifest exists — single source of
    truth, like swapping the collector's file_storage for dbstorage).
    The store entry is written AFTER the atomic rename, so a crash
    between the two reruns the shard idempotently."""
    os.makedirs(out_root, exist_ok=True)
    shards = shard_inputs(files, n_shards)
    summary = {"shards_total": len(shards), "shards_skipped": 0, "shards_run": 0,
               "stats": []}
    for sid, shard_files in enumerate(shards):
        final_dir = os.path.join(out_root, f"shard={sid:05d}")
        if store is not None:
            prev = store.get_json(f"shard={sid:05d}") or {}
        else:
            prev = {}
            if os.path.exists(_manifest_path(final_dir)):
                try:
                    with open(_manifest_path(final_dir)) as f:
                        prev = json.load(f)
                except (OSError, ValueError):
                    prev = {}
        if prev:
            # a manifest proves SOME run completed this shard id — only
            # skip if it covered the SAME input files (file list or
            # n_shards changes remap shard ids; stale outputs must rerun)
            if prev.get("input_files") == list(shard_files) \
                    and os.path.exists(_manifest_path(final_dir)):
                summary["shards_skipped"] += 1
                continue
            import warnings

            warnings.warn(
                f"shard {sid}: manifest input_files mismatch or missing "
                f"output (inputs or n_shards changed) — rerunning",
                stacklevel=2)
        shutil.rmtree(final_dir, ignore_errors=True)  # partial leftovers
        tmp_dir = os.path.join(out_root, f".tmp-shard={sid:05d}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        t0 = time.time()
        stats = run_shard(list(shard_files), tmp_dir) or {}
        manifest = {
            "shard_id": sid,
            "input_files": list(shard_files),
            "elapsed_sec": round(time.time() - t0, 3),
            "stats": stats,
        }
        with open(os.path.join(tmp_dir, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)
        os.rename(tmp_dir, final_dir)
        if store is not None:
            store.set_json(f"shard={sid:05d}", manifest)
        summary["shards_run"] += 1
        summary["stats"].append(manifest)
    return summary
