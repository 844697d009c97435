import pyarrow as pa
import pytest
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.logmine import (
    MASK_PATTERNS, mask_line, mask_sql_expr, mine_templates)


def _mine(rows, **kw):
    ds = rd.from_arrow(pa.table(rows))
    out = mine_templates(ds, "line", **kw).to_pandas()
    return out.sort_values("template").reset_index(drop=True)


def test_digit_tokens_mask_and_collapse():
    out = _mine({
        "line": ["user 17 logged in from 10.0.0.3",
                 "user 99231 logged in from 192.168.4.77",
                 "cache flush complete"],
        "id": [3, 1, 2]}, id_col="id")
    assert list(out["template"]) == [
        "cache flush complete", "user <*> logged in from <*>"]
    assert list(out["n"]) == [1, 2]
    assert list(out["example_id"]) == [2, 1]


def test_uuid_and_hex_mask_to_single_token():
    out = _mine({"line": [
        "req 123e4567-e89b-12d3-a456-426614174000 failed at 0xDEADBEEF"]})
    assert list(out["template"]) == ["req <*> failed at <*>"]


def test_whitespace_runs_and_edges_normalize():
    out = _mine({"line": ["  job 4 done \t now ", "job 7 done now"]})
    assert list(out["template"]) == ["job <*> done now"]
    assert list(out["n"]) == [2]


def test_min_count_prunes_rare_templates():
    out = _mine({"line": ["a 1 b", "a 2 b", "only once"]}, min_count=2)
    assert list(out["template"]) == ["a <*> b"]


def test_mask_line_matches_duckdb_replay():
    duckdb = pytest.importorskip("duckdb")
    lines = ["user 17 in 10.0.0.3", "  x\t0xAB  9z ",
             "id 123e4567-e89b-12d3-a456-426614174000 ok",
             "plain words only", "v=3 k=0x0 u2"]
    got = mask_line(pa.array(lines)).to_pylist()
    con = duckdb.connect()
    expr = mask_sql_expr("line")
    exp = [r[0] for r in con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS line)",
        [lines]).fetchall()]
    assert got == exp


def test_hex_masked_before_generic_digit_rule():
    # 0xDEAD3F would also match the digit-token rule; the hex rule must
    # win so '0xDEAD3F,' (with punctuation) still collapses cleanly
    out = mask_line(pa.array(["ptr 0xDEAD3F, ok"])).to_pylist()
    assert out == ["ptr <*>, ok"]
    assert [n for n, _, _ in MASK_PATTERNS] == ["uuid", "hex", "num"]


def test_template_novelty_detects_only_new_shapes():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.logmine import (
        template_novelty,
    )

    base = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                     "line": pa.array(["user 1 login ok",
                                       "user 22 login ok",
                                       "cache miss key 9"], pa.string())})
    cur = pa.table({"id": pa.array([10, 11, 12, 13], pa.int64()),
                    "line": pa.array(["user 777 login ok",      # known
                                      "disk full on /dev/sda1",  # new
                                      "disk full on /dev/sdb2",  # same new
                                      "cache miss key 123"],     # known
                                     pa.string())})
    out = template_novelty(rd.from_arrow(base), rd.from_arrow(cur),
                           "line", id_col="id", n_buckets=4)
    rows = {r["template"]: (r["n"], r["example_id"])
            for r in out.take_all()}
    assert rows == {"disk full on <*>": (2, 11)}


def test_template_novelty_empty_when_no_new():
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.logmine import (
        template_novelty,
    )

    base = pa.table({"id": pa.array([1], pa.int64()),
                     "line": pa.array(["job 5 done"], pa.string())})
    cur = pa.table({"id": pa.array([2], pa.int64()),
                    "line": pa.array(["job 6 done"], pa.string())})
    out = template_novelty(rd.from_arrow(base), rd.from_arrow(cur),
                           "line", id_col="id", n_buckets=2)
    assert out.count() == 0
