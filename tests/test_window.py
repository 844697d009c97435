"""grouped_window vs DuckDB window functions on a randomized frame."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.window import (
    WindowSpec, grouped_window)


def _frame(n=400, keys=7, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, keys, n).astype(np.int64),
        # coarse order column -> real peer groups for the rank family
        "o": rng.integers(0, 5, n).astype(np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })


def _run(df, keys, orders, specs):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = grouped_window(ds, keys, orders, specs, n_buckets=4).to_pandas()
    return out.sort_values("rid").reset_index(drop=True)


def test_rank_family_matches_duckdb():
    df = _frame()
    got = _run(df, ["k"], ["o"], [
        WindowSpec("rank", out="rnk"),
        WindowSpec("dense_rank", out="drnk"),
        WindowSpec("percent_rank", out="prank"),
        WindowSpec("cume_dist", out="cdist"),
    ])
    exp = duckdb.sql("""
        SELECT rid,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               percent_rank() OVER w AS prank,
               cume_dist() OVER w AS cdist
        FROM df WINDOW w AS (PARTITION BY k ORDER BY o)
        ORDER BY rid""").df()
    for c in ("rnk", "drnk", "prank", "cdist"):
        assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c


def test_navigation_and_frames_match_duckdb():
    df = _frame()
    got = _run(df, ["k"], ["o", "rid"], [
        WindowSpec("row_number", out="rn"),
        WindowSpec("lag", col="v", out="pv"),
        WindowSpec("lead", col="v", offset=2, out="nv2"),
        WindowSpec("lag", col="v", default=-1, out="pv_d"),
        WindowSpec("first_value", col="v", out="fv"),
        WindowSpec("last_value", col="v", out="lv"),
        WindowSpec("running_sum", col="v", out="rs"),
        WindowSpec("moving_sum", col="v", frame=3, out="ms3"),
        WindowSpec("moving_avg", col="v", frame=4, out="ma4"),
        WindowSpec("moving_min", col="v", frame=2, out="mn2"),
        WindowSpec("moving_max", col="v", frame=5, out="mx5"),
    ])
    exp = duckdb.sql("""
        SELECT rid,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               lag(v, 1) OVER w AS pv,
               lead(v, 2) OVER w AS nv2,
               CAST(lag(v, 1, -1) OVER w AS BIGINT) AS pv_d,
               CAST(first_value(v) OVER w AS BIGINT) AS fv,
               CAST(last_value(v) OVER (PARTITION BY k ORDER BY o, rid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
                    FOLLOWING) AS BIGINT) AS lv,
               CAST(sum(v) OVER w AS BIGINT) AS rs,
               CAST(sum(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS ms3,
               avg(v) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                    AS ma4,
               CAST(min(v) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS mn2,
               CAST(max(v) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS mx5
        FROM df WINDOW w AS (PARTITION BY k ORDER BY o, rid)
        ORDER BY rid""").df()
    for c in ("rn", "pv_d", "fv", "lv", "rs", "ms3", "mn2", "mx5"):
        assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c
    for c in ("pv", "nv2", "ma4"):
        assert np.allclose(got[c].to_numpy(), exp[c].to_numpy(),
                           equal_nan=True), c


def test_null_order_values_are_peers():
    df = pd.DataFrame({
        "rid": np.arange(6, dtype=np.int64),
        "k": np.zeros(6, dtype=np.int64),
        "o": pd.array([None, None, 1, 1, 2, None], dtype="Int64"),
        "v": np.arange(6, dtype=np.int64),
    })
    got = _run(df, ["k"], ["o"], [
        WindowSpec("rank", out="rnk"),
        WindowSpec("dense_rank", out="drnk"),
    ])
    exp = duckdb.sql("""
        SELECT rid, CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk
        FROM df WINDOW w AS (PARTITION BY k ORDER BY o)
        ORDER BY rid""").df()
    # pandas sorts nulls LAST while DuckDB sorts them FIRST by default;
    # compare on the rank *multiset per o-value* instead of row identity
    g = got  # grouped_window keeps the input columns
    e = exp.merge(df, on="rid")
    for o in (None, 1, 2):
        mask_g = g["o"].isna() if o is None else g["o"] == o
        mask_e = e["o"].isna() if o is None else e["o"] == o
        # all peers share one rank value in both engines
        assert g.loc[mask_g, "rnk"].nunique() == 1
        assert e.loc[mask_e, "rnk"].nunique() == 1
        assert g.loc[mask_g, "drnk"].nunique() == 1


def test_bad_specs_raise():
    import pytest

    df = _frame(20)
    try:
        _run(df, ["k"], ["o"], [WindowSpec("median", col="v")])
        raise AssertionError("unknown kind accepted")
    except ValueError:
        pass
    with pytest.raises(ValueError):
        _run(df, ["k"], ["o"], [WindowSpec("lag")])


def test_null_partition_key_is_its_own_partition():
    df = pd.DataFrame({
        "rid": np.arange(6, dtype=np.int64),
        "k": pd.array([1, None, 1, None, 2, None], dtype="Int64"),
        "o": np.arange(6, dtype=np.int64),
        "v": np.array([10, 20, 30, 40, 50, 60], dtype=np.int64),
    })
    got = _run(df, ["k"], ["o"], [
        WindowSpec("row_number", out="rn"),
        WindowSpec("running_sum", col="v", out="rs"),
    ])
    by_rid = got.set_index("rid")
    # NULL keys form ONE partition (SQL GROUP BY/PARTITION BY semantics)
    assert by_rid.loc[[1, 3, 5], "rn"].tolist() == [1, 2, 3]
    assert by_rid.loc[[1, 3, 5], "rs"].tolist() == [20, 60, 120]
    assert by_rid.loc[[0, 2], "rn"].tolist() == [1, 2]
    assert (got["rn"] > 0).all()  # never INT64_MIN garbage


def test_numpy_nan_order_values_are_peers():
    # plain float64 NaN (the normal Arrow->pandas conversion), not
    # nullable Int64: NaN != NaN must NOT create rank boundaries
    df = pd.DataFrame({
        "rid": np.arange(6, dtype=np.int64),
        "k": np.zeros(6, dtype=np.int64),
        "o": np.array([np.nan, np.nan, 1.0, 1.0, 2.0, np.nan]),
        "v": np.arange(6, dtype=np.int64),
    })
    got = _run(df, ["k"], ["o"], [
        WindowSpec("rank", out="rnk"),
        WindowSpec("dense_rank", out="drnk"),
        WindowSpec("cume_dist", out="cd"),
    ])
    nan_rows = got[got["o"].isna()]
    assert nan_rows["rnk"].nunique() == 1   # all NaN peers share one rank
    assert nan_rows["drnk"].nunique() == 1
    assert nan_rows["cd"].nunique() == 1
    assert got[got["o"] == 1.0]["rnk"].nunique() == 1


def test_time_range_frames_match_duckdb_selfjoin():
    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 5, n).astype(np.int64),
        # coarse integer-us timestamps with deliberate ties
        "ts": rng.integers(0, 40, n).astype(np.int64) * 1_000_000,
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    got = _run(df, ["k"], ["ts", "rid"], [
        WindowSpec("time_sum", col="v", range_us=10_000_000, out="tsum"),
        WindowSpec("time_count", range_us=10_000_000, out="tcnt"),
        WindowSpec("time_avg", col="v", range_us=10_000_000, out="tavg"),
    ])
    exp = duckdb.sql("""
        SELECT a.rid,
               CAST(sum(b.v) AS BIGINT) AS tsum,
               count(*) AS tcnt,
               CAST(sum(b.v) AS BIGINT) * 1.0 / count(*) AS tavg
        FROM df a JOIN df b ON a.k = b.k
          AND b.ts >= a.ts - 10000000 AND b.ts <= a.ts
          AND (b.ts < a.ts OR b.rid <= a.rid)
        GROUP BY a.rid ORDER BY a.rid""").df()
    assert np.array_equal(got["tsum"].to_numpy(), exp["tsum"].to_numpy())
    assert np.array_equal(got["tcnt"].to_numpy(), exp["tcnt"].to_numpy())
    assert np.allclose(got["tavg"].to_numpy(), exp["tavg"].to_numpy())


def test_random_windows_match_duckdb_property():
    """Randomized DuckDB parity sweep: many seeds, nulls, ties, and
    several window kinds at once — the strongest guard on the
    boundary-mask rank math and the frame semantics."""
    for seed in (0, 1, 2, 3, 4):
        rng = np.random.default_rng(seed)
        n = 400
        o = rng.integers(0, 8, n).astype(np.float64)
        o[rng.random(n) < 0.1] = np.nan        # null order keys = peers
        df = pd.DataFrame({
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 6, n).astype(np.int64),
            "o": o,
            "v": rng.integers(-50, 50, n).astype(np.int64),
        })
        got = _run(df, ["k"], ["o", "rid"], [
            WindowSpec("row_number", out="rn"),
            WindowSpec("lag", col="v", offset=2, out="l2"),
            WindowSpec("running_sum", col="v", out="rs"),
            WindowSpec("moving_max", col="v", frame=4, out="mm"),
        ])
        got_rank = _run(df, ["k"], ["o"], [
            WindowSpec("rank", out="rnk"),
            WindowSpec("dense_rank", out="drnk"),
            WindowSpec("cume_dist", out="cd"),
        ])
        exp = duckdb.sql("""
            SELECT rid,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   lag(v, 2) OVER w AS l2,
                   CAST(sum(v) OVER w AS BIGINT) AS rs,
                   CAST(max(v) OVER (PARTITION BY k ORDER BY o NULLS LAST, rid
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS mm,
                   CAST(rank() OVER p AS BIGINT) AS rnk,
                   CAST(dense_rank() OVER p AS BIGINT) AS drnk,
                   cume_dist() OVER p AS cd
            FROM df
            WINDOW w AS (PARTITION BY k ORDER BY o NULLS LAST, rid),
                   p AS (PARTITION BY k ORDER BY o NULLS LAST)
            ORDER BY rid""").df()
        for col in ("rn", "rs", "mm"):
            assert np.array_equal(got[col].to_numpy(),
                                  exp[col].to_numpy()), (seed, col)
        assert np.array_equal(got["l2"].fillna(-999).to_numpy(),
                              exp["l2"].fillna(-999).to_numpy()), seed
        for col in ("rnk", "drnk"):
            assert np.array_equal(got_rank[col].to_numpy(),
                                  exp[col].to_numpy()), (seed, col)
        assert np.allclose(got_rank["cd"].to_numpy(),
                           exp["cd"].to_numpy()), seed


def test_nth_value_matches_duckdb():
    df = _frame()
    got = _run(df, ["k"], ["o", "rid"], [
        WindowSpec("nth_value", col="v", offset=3, out="n3"),
        WindowSpec("nth_value", col="v", offset=1, out="n1"),
    ])
    exp = duckdb.sql("""
        SELECT rid,
               nth_value(v, 3) OVER w AS n3,
               nth_value(v, 1) OVER w AS n1
        FROM df WINDOW w AS (PARTITION BY k ORDER BY o, rid
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY rid""").df()
    for c in ("n3", "n1"):
        g, x = got[c].to_numpy(float), exp[c].to_numpy(float)
        assert np.array_equal(np.isnan(g), np.isnan(x)), c
        assert np.array_equal(g[~np.isnan(g)], x[~np.isnan(x)]), c


def test_exp_histogram_nonzero_scale_mappings_agree():
    # the spec's logarithm-free subbucket mapping (stage) vs the naive
    # ceil(log2(v) * 2^scale) - 1 rule (what SQL oracles replay):
    # exhaustively equal for integers 1..1M at scales 1..4, and exact
    # at every power-of-two boundary
    import numpy as np

    v = np.arange(1, 1_000_001, dtype=np.float64)
    for scale in (1, 2, 3, 4):
        sub = 1 << scale
        bounds = 2.0 ** (np.arange(sub + 1, dtype=np.float64) / sub)
        m, e = np.frexp(v)
        j = np.searchsorted(bounds, 2.0 * m, side="left")
        exact = (e.astype(np.int64) - 1) * sub + j - 1
        naive = np.ceil(np.log2(v) * sub).astype(np.int64) - 1
        assert (exact == naive).all(), scale
        # powers of two land exactly at k*sub - 1
        p = 2.0 ** np.arange(0, 20)
        mp, ep = np.frexp(p)
        jp = np.searchsorted(bounds, 2.0 * mp, side="left")
        got = (ep.astype(np.int64) - 1) * sub + jp - 1
        assert (got == np.arange(0, 20) * sub - 1).all()


def test_exp_histogram_agg_scales(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        exp_histogram_agg,
    )

    t = pa.table({"k": ["a"] * 6,
                  "v": pa.array([1, 2, 3, 4, 5, 0], pa.int64())})
    # scale=2: v=1 -> -1, 2 -> 3, 3 -> 6 (2^(6/4)=2.83 < 3 <= 2^(7/4)=3.36),
    # 4 -> 7, 5 -> 9, 0 -> zero bucket (null)
    out = {r["bucket"]: r["n"]
           for r in exp_histogram_agg(rd.from_arrow(t), ["k"], "v",
                                      scale=2).take_all()}
    assert out == {-1: 1, 3: 1, 6: 1, 7: 1, 9: 1, None: 1}
    # scale=-1 (base 4): 1 -> -1 bucket? ceil(log2(1)*0.5)-1 = -1;
    # 2,3,4 -> 0 ((1,4]); 5 -> 1 ((4,16])
    out = {r["bucket"]: r["n"]
           for r in exp_histogram_agg(rd.from_arrow(t), ["k"], "v",
                                      scale=-1).take_all()}
    assert out == {-1: 1, 0: 3, 1: 1, None: 1}


def test_rolling_distinct_wau_shape():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        rolling_distinct,
    )

    # bucket=10us, window=3 buckets; user u1 active buckets 0 and 2,
    # u2 bucket 1.  Window END b covers buckets [b-2, b]:
    # end 0: {u1}=1; end 1: {u1,u2}=2; end 2: {u1,u2}=2;
    # end 3: {u2,u1}=2 (u2@1, u1@2); end 4: {u1}=1 (u1@2)
    t = pa.table({
        "uid": pa.array([1, 1, 2, 1], pa.int64()),
        "ts": pa.array([1, 5, 15, 25], pa.int64()),
    })
    out = {r["bucket"]: r["n_distinct"] for r in rolling_distinct(
        rd.from_arrow(t), "uid", ts_col="ts", window_buckets=3,
        bucket_us=10).take_all()}
    assert out == {0: 1, 1: 2, 2: 2, 3: 2, 4: 1}


def test_rolling_distinct_with_keys():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        rolling_distinct,
    )

    t = pa.table({
        "k": pa.array(["a", "a", "b"], pa.string()),
        "uid": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([1, 11, 1], pa.int64()),
    })
    out = {(r["k"], r["bucket"]): r["n_distinct"] for r in rolling_distinct(
        rd.from_arrow(t), "uid", ts_col="ts", window_buckets=2,
        bucket_us=10, key_cols=["k"]).take_all()}
    assert out[("a", 1)] == 1 and out[("a", 2)] == 1
    assert out[("b", 0)] == 1 and ("b", 2) not in out


def test_prefix_rollup_hierarchy():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        prefix_rollup,
    )

    t = pa.table({"path": pa.array(
        ["/api/v2/users", "/api/v2/items", "/api/v1", "/health",
         None, ""], pa.string())})
    out = {(r["prefix"], r["depth"]): r["n"] for r in prefix_rollup(
        rd.from_arrow(t), "path", max_depth=2).take_all()}
    assert out[("/api", 1)] == 3
    assert out[("/api/v2", 2)] == 2
    assert out[("/api/v1", 2)] == 1
    assert out[("/health", 1)] == 1
    # null/empty paths emit nothing; depth never exceeds max_depth
    assert all(d <= 2 for (_, d) in out)


def test_prefix_rollup_validation():
    import pytest

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        prefix_rollup,
    )

    with pytest.raises(ValueError, match="max_depth"):
        prefix_rollup(None, "p", max_depth=0)


def test_session_paths_journeys():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        session_paths,
    )

    # user 1: [a,b] then (gap) [a,b]; user 2: [a,b]; user 3: single [c]
    rows = [(1, 0, "a"), (1, 10, "b"), (1, 1_900_000_000, "a"),
            (1, 1_900_000_010, "b"), (2, 0, "a"), (2, 5, "b"),
            (3, 0, "c")]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows], pa.int64()),
                  "event_type": pa.array([r[2] for r in rows],
                                         pa.string())})
    out = {r["path"]: r["n_sessions"] for r in session_paths(
        rd.from_arrow(t), "user_id", "event_type").take_all()}
    assert out == {"a>b": 3, "c": 1}


def test_session_paths_step_cap_and_min_count():
    import pyarrow as pa
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        session_paths,
    )

    rows = [(1, i, t) for i, t in enumerate("abcdefg")]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows], pa.int64()),
                  "event_type": pa.array([r[2] for r in rows],
                                         pa.string())})
    out = [r["path"] for r in session_paths(
        rd.from_arrow(t), "user_id", "event_type",
        max_steps=3).take_all()]
    assert out == ["a>b>c"]  # capped at the first 3 steps
    assert session_paths(rd.from_arrow(t), "user_id", "event_type",
                         max_steps=3, min_count=2).count() == 0
