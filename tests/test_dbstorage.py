import json
import os

from open_telemetry_opentelemetry_collector_contrib_ray.state import (
    DbStorage,
    run_resumable,
)


def test_kv_get_set_delete_persist(tmp_path):
    p = str(tmp_path / "st.sqlite")
    with DbStorage(p) as st:
        assert st.get("k") is None
        st.set("k", b"v1")
        st.set("k", b"v2")  # upsert
        assert st.get("k") == b"v2"
        st.delete("k")
        assert st.get("k") is None
        st.set("a", b"x")
    # survives reopen (the dbstorage restart contract)
    with DbStorage(p) as st:
        assert st.get("a") == b"x"
        assert st.keys() == ["a"]


def test_batch_ops_transactional(tmp_path):
    with DbStorage(str(tmp_path / "st.sqlite")) as st:
        res = st.batch([("set", "x", b"1"), ("get", "x", None),
                        ("delete", "x", None), ("get", "x", None)])
        assert res == [None, b"1", None, None]
        import pytest

        with pytest.raises(ValueError, match="unknown op"):
            st.batch([("frob", "x", None)])


def test_table_name_validated(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="table"):
        DbStorage(str(tmp_path / "st.sqlite"), table="bad; drop")


def _mk_inputs(tmp_path, n=4):
    files = []
    for i in range(n):
        f = str(tmp_path / f"in-{i}.txt")
        with open(f, "w") as fh:
            fh.write(f"data-{i}\n")
        files.append(f)
    return files


def test_resumable_with_sqlite_store(tmp_path):
    files = _mk_inputs(tmp_path)
    out = str(tmp_path / "out")
    calls = []

    def run_shard(shard_files, tmp_dir):
        calls.append(list(shard_files))
        with open(os.path.join(tmp_dir, "part.json"), "w") as f:
            json.dump(shard_files, f)
        return {"rows": len(shard_files)}

    with DbStorage(str(tmp_path / "ck.sqlite")) as st:
        s1 = run_resumable(files, out, run_shard, n_shards=2, store=st)
        assert s1["shards_run"] == 2 and s1["shards_skipped"] == 0
        # second run: everything skipped, zero run_shard calls
        n_calls = len(calls)
        s2 = run_resumable(files, out, run_shard, n_shards=2, store=st)
        assert s2["shards_skipped"] == 2 and len(calls) == n_calls
        assert st.get_json("shard=00000")["stats"]["rows"] == 2


def test_store_is_source_of_truth(tmp_path):
    # a directory manifest WITHOUT a store entry reruns (dbstorage is
    # authoritative when configured); and a store entry whose output
    # dir was wiped also reruns
    files = _mk_inputs(tmp_path, 2)
    out = str(tmp_path / "out")

    def run_shard(shard_files, tmp_dir):
        open(os.path.join(tmp_dir, "x"), "w").close()
        return {}

    import shutil
    import warnings

    # first run with file manifests only
    run_resumable(files, out, run_shard, n_shards=1)
    with DbStorage(str(tmp_path / "ck.sqlite")) as st:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            s = run_resumable(files, out, run_shard, n_shards=1, store=st)
        assert s["shards_run"] == 1  # store empty -> rerun
        # wipe the output dir: store says done but output is gone
        shutil.rmtree(out)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            s = run_resumable(files, out, run_shard, n_shards=1, store=st)
        assert s["shards_run"] == 1
        s = run_resumable(files, out, run_shard, n_shards=1, store=st)
        assert s["shards_skipped"] == 1
