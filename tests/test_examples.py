"""Every YAML config in examples/ must run end-to-end against the
synthetic corpus (the 'a reference user could switch' demo surface)."""

import glob
import os
import shutil

import pyarrow.parquet as pq

from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.config import (
    run_config,
)

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _rows(path: str) -> int:
    return sum(pq.read_metadata(f).num_rows
               for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True))


def test_filelog_route_example():
    shutil.rmtree("/tmp/graft_examples/routed", ignore_errors=True)
    out = run_config(os.path.join(EXAMPLES, "filelog_route.yaml"))
    path = out["logs"]["parquet/routed"]
    parts = [d for d in os.listdir(path) if d.startswith("route_id=")]
    assert parts and _rows(path) == 2000


def test_otlp_relay_example():
    shutil.rmtree("/tmp/graft_examples/otlp_json", ignore_errors=True)
    shutil.rmtree("/tmp/graft_examples/otlp_proto", ignore_errors=True)
    run_config(os.path.join(EXAMPLES, "otlp_relay.yaml"))
    from open_telemetry_opentelemetry_collector_contrib_ray.sources.otlpproto import (
        read_otlp_proto,
    )

    back = read_otlp_proto("/tmp/graft_examples/otlp_proto").to_pandas()
    assert len(back) == 1000
    assert (back["attr_text_len"] >= 0).all()


def test_dedup_sample_example():
    shutil.rmtree("/tmp/graft_examples/dedup_sample", ignore_errors=True)
    out = run_config(os.path.join(EXAMPLES, "dedup_sample.yaml"))
    n = _rows(out["logs"]["parquet/out"])
    assert 0 < n < 5000  # dedup + 25% sample both bit


def test_tail_sampling_example():
    shutil.rmtree("/tmp/graft_examples/tail_sampled", ignore_errors=True)
    out = run_config(os.path.join(EXAMPLES, "tail_sampling.yaml"))
    import pandas as pd
    import pyarrow.parquet as pq_

    files = glob.glob(os.path.join(out["traces"]["parquet/kept"],
                                   "**", "*.parquet"), recursive=True)
    df = pd.concat([pq_.read_table(f).to_pandas() for f in files])
    assert 0 < len(df) < 5000
    # decisions are per-conversation: every kept conv keeps a full,
    # multi-turn slice (no single orphan turns from a kept conv)
    per_conv = df.groupby("conv_id").size()
    assert len(per_conv) > 0 and per_conv.min() >= 2


def test_llm_data_prep_example():
    shutil.rmtree("/tmp/graft_examples/llm_data", ignore_errors=True)
    out = run_config(os.path.join(EXAMPLES, "llm_data_prep.yaml"),
                     data_dir="/root/testdata/sf0.01")
    path = out["docs"]["parquet/kept"]
    parts = [d for d in os.listdir(path) if d.startswith("source=")]
    n = _rows(path)
    assert parts and 0 < n < 500  # classifier + budgets both bit
