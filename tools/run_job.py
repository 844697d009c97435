"""Cluster job entry point: the shape you `ray job submit` on a real cluster.

    ray job submit --working-dir . -- python tools/run_job.py \
        --sf-dir /data/transcripts --out /shared/out --shards 256

On a multi-node cluster the job connects to the running cluster
(RAY_ADDRESS set by the job runner); in this sandbox it runs local-mode.
Resumable: rerunning after a failure skips completed shards via their
manifests, so a preempted job continues where it stopped.  Output layout:
one directory per shard (`shard=NNNNN/data/route_id=*/...parquet` +
`_MANIFEST.json` + `_lineage/`).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/flagship_job_out")
    ap.add_argument("--shards", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local" if not ray.__dict__.get("_is_job") else "auto",
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.flagship import (
        run_flagship_resumable,
    )

    summary = run_flagship_resumable(args.sf_dir, args.out, n_shards=args.shards)
    print(json.dumps({
        "shards_total": summary["shards_total"],
        "shards_run": summary["shards_run"],
        "shards_skipped": summary["shards_skipped"],
        "rows_out": sum(m["stats"].get("rows_out", 0) for m in summary["stats"]),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
