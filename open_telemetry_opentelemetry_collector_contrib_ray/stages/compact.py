"""Parquet small-file compaction — the lakehouse OPTIMIZE primitive.

Streaming pipelines (including this engine's partitioned sinks and the
reference's file exporter with rotation) produce many small parquet
files; scans then pay per-file open/footer costs and schedulers pay
per-file task overhead.  Compaction bin-packs small files into
~target-size outputs WITHOUT a data shuffle: the plan is pure driver
metadata (file listing + sizes), and each bin is one independent task
that streams its input files row-group-by-row-group into one output
file — memory bounded by a single row group, no table-level concat.

Ray-Data shape: the bin list becomes a tiny Dataset
(``from_items``, one row per bin) mapped with an actor-free batch fn —
metadata-parallel, data-local, and RESUMABLE: with ``skip_existing``
a re-run skips bins whose output file already exists, so a failed
100 TB compaction continues where it stopped.

Bins are formed by a deterministic greedy sweep in sorted-path order
(preserving any key-range locality the writer left in file order),
closing a bin when adding the next file would exceed ``target_bytes``
— every bin except possibly the last is > target/2 unless a single
file exceeds the target on its own.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def plan_bins(files: list[tuple[str, int]],
              target_bytes: int) -> list[list[str]]:
    """Greedy sequential bin-packing over (path, bytes) pairs in
    sorted-path order; a file larger than target_bytes gets its own
    bin (it is copied, not split)."""
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for path, size in sorted(files):
        if cur and cur_bytes + size > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(path)
        cur_bytes += size
    if cur:
        bins.append(cur)
    return bins


def compact_parquet(in_paths: list[str] | str, out_dir: str,
                    target_bytes: int = 256 << 20,
                    compression: str = "zstd",
                    skip_existing: bool = True,
                    concurrency: int | None = None):
    """Compact parquet files under ``in_paths`` (a directory or an
    explicit file list) into ``out_dir`` (one ``part-<bin>.parquet``
    per bin).  Returns a Dataset with one stats row per bin:
    ``bin_id, n_files_in, rows, bytes_out, skipped``.  All input files
    must share a schema (the usual single-table layout)."""
    import ray.data as rd

    if isinstance(in_paths, str):
        files = [(os.path.join(in_paths, f),
                  os.path.getsize(os.path.join(in_paths, f)))
                 for f in os.listdir(in_paths) if f.endswith(".parquet")]
    else:
        files = [(p, os.path.getsize(p)) for p in in_paths]
    bins = plan_bins(files, target_bytes)
    os.makedirs(out_dir, exist_ok=True)
    items = [{"bin_id": i, "paths": json.dumps(b)}
             for i, b in enumerate(bins)]

    def compact(batch: pa.Table) -> pa.Table:
        out_rows = []
        for bin_id, paths_js in zip(
                batch.column("bin_id").to_pylist(),
                batch.column("paths").to_pylist()):
            paths = json.loads(paths_js)
            out_path = os.path.join(out_dir, f"part-{bin_id:05d}.parquet")
            if skip_existing and os.path.exists(out_path):
                out_rows.append((bin_id, len(paths), 0, 0, 1))
                continue
            writer = None
            rows = 0
            tmp = out_path + ".inprogress"
            try:
                for p in paths:
                    f = pq.ParquetFile(p)
                    for rg in range(f.num_row_groups):
                        t = f.read_row_group(rg)
                        if writer is None:
                            writer = pq.ParquetWriter(
                                tmp, t.schema, compression=compression)
                        writer.write_table(t)
                        rows += t.num_rows
                    if writer is None:  # zero-row-group file
                        writer = pq.ParquetWriter(
                            tmp, f.schema_arrow, compression=compression)
            finally:
                if writer is not None:
                    writer.close()
            os.replace(tmp, out_path)  # atomic: resumability boundary
            out_rows.append((bin_id, len(paths), rows,
                             os.path.getsize(out_path), 0))
        cols = list(zip(*out_rows)) or [[]] * 5
        return pa.table({
            "bin_id": pa.array(cols[0], pa.int64()),
            "n_files_in": pa.array(cols[1], pa.int64()),
            "rows": pa.array(cols[2], pa.int64()),
            "bytes_out": pa.array(cols[3], pa.int64()),
            "skipped": pa.array(cols[4], pa.int64())})

    ds = rd.from_items(items)
    if concurrency:
        return ds.map_batches(compact, batch_format="pyarrow",
                              batch_size=1, concurrency=concurrency)
    return ds.map_batches(compact, batch_format="pyarrow", batch_size=1)
