import pyarrow as pa


def test_redaction_stage():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.enrich import (
        RedactionStage,
    )

    t = pa.table({
        "attr_card": ["4111111111111111", "visa"],
        "attr_note": ["hello", "4222222222222"],
        "attr_secret": ["x", "y"],
    })
    out = RedactionStage(allowed_keys=["card", "note"],
                         blocked_value_patterns=[r"^\d{13,16}$"])(t)
    assert "attr_secret" not in out.column_names
    assert out.column("attr_card").to_pylist() == ["****", "visa"]
    assert out.column("attr_note").to_pylist() == ["hello", "****"]
    assert out.column("redaction_masked_count").to_pylist() == [1, 1]
    assert out.column("redaction_deleted_keys").to_pylist() == ["secret", "secret"]


def test_stanza_transformer_steps():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
        build_pipeline,
    )

    ds = rd.from_arrow(pa.table({"attr_a": ["1", "2"], "attr_b": ["x", "y"]}))
    steps = [
        {"type": "add", "field": 'attributes["c"]', "value": "cv"},
        {"type": "copy", "from": 'attributes["a"]', "to": 'attributes["a2"]'},
        {"type": "move", "from": 'attributes["b"]', "to": 'attributes["b2"]'},
        {"type": "retain", "fields": ["a", "a2", "b2", "c"]},
    ]
    out = build_pipeline(ds, steps).to_pandas()
    assert out.attr_c.tolist() == ["cv", "cv"]
    assert out.attr_a2.tolist() == ["1", "2"]
    assert out.attr_b2.tolist() == ["x", "y"]
    assert "attr_b" not in out.columns


def test_run_flagship_resumable(tmp_path):
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.flagship import (
        run_flagship_resumable,
    )

    out_root = str(tmp_path / "resumable")
    s1 = run_flagship_resumable("/root/testdata/sf0.001", out_root, n_shards=2)
    assert s1["shards_run"] >= 1 and s1["shards_skipped"] == 0
    total_rows = sum(m["stats"]["rows_out"] for m in s1["stats"])
    assert total_rows == 2000
    # rerun: everything skipped
    s2 = run_flagship_resumable("/root/testdata/sf0.001", out_root, n_shards=2)
    assert s2["shards_run"] == 0
    assert s2["shards_skipped"] == s1["shards_run"]
    # output readable as one hive dataset per shard
    import glob

    files = glob.glob(f"{out_root}/shard=*/data/**/*.parquet", recursive=True)
    assert files


def test_incremental_epoch_dedup_equals_full_batch(tmp_path):
    """Two arrival epochs merged == one full-batch dedup (the streaming
    window -> batch epoch equivalence, SURVEY §2.10)."""
    import os

    import pandas as pd
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.sources import (
        ensure_transcripts,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        dedup_exact,
    )
    from open_telemetry_opentelemetry_collector_contrib_ray.state.epochs import (
        dedup_epoch,
        dedup_state_view,
    )

    import pyarrow.parquet as pq

    path = ensure_transcripts("/root/testdata/sf0.01")
    src = sorted(os.path.join(path, f) for f in os.listdir(path)
                 if f.endswith(".parquet"))
    tbl = pq.read_table(src[0]) if len(src) == 1 else None
    if tbl is not None:  # split one file into two arrival epochs
        half = tbl.num_rows // 2
        f0, f1 = str(tmp_path / "e0.parquet"), str(tmp_path / "e1.parquet")
        pq.write_table(tbl.slice(0, half), f0)
        pq.write_table(tbl.slice(half), f1)
        files, ep0, ep1 = [f0, f1], [f0], [f1]
    else:
        files = src
        ep0, ep1 = src[: len(src) // 2], src[len(src) // 2:]
    state = str(tmp_path / "dedup_state")
    keys = ["conv_id", "role", "text"]
    assert dedup_epoch(state, ep0, keys) == 0
    assert dedup_epoch(state, ep1, keys) == 1

    merged = dedup_state_view(state, keys).to_pandas() \
        .sort_values(keys).reset_index(drop=True)
    full = dedup_exact(rd.read_parquet(files), keys).to_pandas()[merged.columns] \
        .sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, full, check_dtype=False)


def test_run_job_script_resumes(tmp_path):
    """tools/run_job.py (the ray-job-submit entry) completes and resumes."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "job")
    cmd = [sys.executable, "/root/repo/tools/run_job.py",
           "--sf-dir", "/root/testdata/sf0.001", "--out", out, "--shards", "2"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    assert r1.returncode == 0, r1.stderr[-1500:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["rows_out"] == 2000 and s1["shards_run"] >= 1
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["shards_run"] == 0 and s2["shards_skipped"] == s1["shards_run"]


def test_resume_reruns_on_input_file_mismatch(tmp_path):
    """A manifest only skips a shard when it covered the SAME input files
    (round-2 advice: changed file lists / n_shards remap shard ids)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_telemetry_opentelemetry_collector_contrib_ray.state.checkpoint import (
        run_resumable,
    )

    files = []
    for i in range(4):
        p = tmp_path / f"in-{i}.parquet"
        pq.write_table(pa.table({"x": [i]}), p)
        files.append(str(p))

    calls = []

    def run_shard(shard_files, out_dir):
        calls.append(list(shard_files))
        return {"rows": len(shard_files)}

    out = str(tmp_path / "out")
    s1 = run_resumable(files, out, run_shard, n_shards=2)
    assert s1["shards_run"] == 2
    # same inputs -> all skipped
    s2 = run_resumable(files, out, run_shard, n_shards=2)
    assert s2["shards_skipped"] == 2 and s2["shards_run"] == 0
    # reordered input list -> same sorted shards -> still skipped
    s2b = run_resumable(files[::-1], out, run_shard, n_shards=2)
    assert s2b["shards_skipped"] == 2 and s2b["shards_run"] == 0
    # different shard mapping (n_shards changed) -> stale manifests must
    # NOT be trusted: shard 0 now covers all four files
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s3 = run_resumable(files, out, run_shard, n_shards=1)
    assert s3["shards_run"] == 1


def test_lineage_sidecars_idempotent_on_retry(tmp_path):
    """Re-processing the same batch (task retry) overwrites its sidecar
    instead of double-counting (round-2 advice)."""
    import pyarrow as pa

    from open_telemetry_opentelemetry_collector_contrib_ray.state.lineage import (
        LineageRecorder,
        summarize_lineage,
    )

    d = str(tmp_path / "lineage")
    rec = LineageRecorder(None, d)
    batch = pa.table({"conv_id": ["a", "b"], "turn_idx": [0, 1]})
    rec(batch)
    rec(batch)  # simulated retry of the SAME batch
    other = pa.table({"conv_id": ["c", "d"], "turn_idx": [0, 1]})
    rec(other)
    total = summarize_lineage(d)
    assert total["batches"] == 2
    assert total["rows_in"] == 4
