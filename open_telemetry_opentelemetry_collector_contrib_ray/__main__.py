"""CLI entry point — the collector-binary analog.

    python -m open_telemetry_opentelemetry_collector_contrib_ray \
        --config pipeline.yaml --data-dir /root/testdata/sf0.001

Loads a collector-style YAML service config (receivers -> processors ->
exporters; see pipelines/config.py), executes its pipelines under a
local Ray session, and prints one JSON summary line per run:
{"pipeline": ..., "exporter": ..., "rows": N | "path": ...}.

This script OWNS its Ray session (guarded init + shutdown), matching
the repo convention that only CLIs, bench.py and the test fixture call
ray.init — library code and __ray_entry__ never do.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="open_telemetry_opentelemetry_collector_contrib_ray",
        description="Run a collector-style YAML pipeline config on Ray Data")
    ap.add_argument("--config", required=True,
                    help="YAML config path (receivers/processors/exporters/service)")
    ap.add_argument("--data-dir", default="/root/testdata/sf0.001",
                    help="directory holding the input parquet tables")
    ap.add_argument("--pipeline", default=None,
                    help="run only this named service pipeline")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local Ray session size (default: all cores)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False,
                  logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from .pipelines.config import run_config

    results = run_config(args.config, data_dir=args.data_dir,
                         pipeline=args.pipeline)
    for pname, exporters in results.items():
        for eid, res in exporters.items():
            if isinstance(res, str):  # file exporter: the written path
                print(json.dumps({"pipeline": pname, "exporter": eid,
                                  "path": res}))
            else:  # collect exporter: a lazy Dataset
                print(json.dumps({"pipeline": pname, "exporter": eid,
                                  "rows": res.count()}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
