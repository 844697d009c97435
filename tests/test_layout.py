import numpy as np
import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.layout import (
    add_zorder_partition,
    zorder_key,
    zorder_sql_expr,
)


def _slow_key(x, y):
    out = 0
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b + 1)
        out |= ((y >> b) & 1) << (2 * b)
    return out


def test_zorder_key_matches_bitwise_reference():
    rng = np.random.RandomState(11)
    x = rng.randint(0, 1 << 16, 1000).astype(np.int64)
    y = rng.randint(0, 1 << 16, 1000).astype(np.int64)
    fast = zorder_key(x, y)
    slow = np.array([_slow_key(int(a), int(b)) for a, b in zip(x, y)])
    assert (fast == slow).all()
    # extremes
    assert zorder_key(np.array([0xFFFF]), np.array([0]))[0] == 0xAAAAAAAA
    assert zorder_key(np.array([0]), np.array([0xFFFF]))[0] == 0x55555555


def test_zorder_sql_expr_parity():
    import duckdb

    rng = np.random.RandomState(12)
    x = rng.randint(0, 1 << 16, 500).astype(np.int64)
    y = rng.randint(0, 1 << 16, 500).astype(np.int64)
    con = duckdb.connect()
    con.register("t", pa.table({"x": x, "y": y}))
    got = con.sql(f"SELECT {zorder_sql_expr('x', 'y')} AS k FROM t") \
        .df()["k"].to_numpy()
    assert (got == zorder_key(x, y)).all()


def test_add_zorder_partition_locality(tmp_path):
    # neighbors in both dims share partitions; the partitioned write
    # is resumable output (one directory per zpart)
    n = 4096
    rng = np.random.RandomState(13)
    x = rng.randint(0, 1 << 16, n).astype(np.int64)
    y = rng.randint(0, 1 << 16, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"a": x, "b": y}))
    out = add_zorder_partition(ds, "a", "b", part_bits=2)
    df = out.to_pandas()
    assert set(df["zpart"]) == {0, 1, 2, 3}
    zk = df["zkey"].to_numpy(np.int64)
    zp = df["zpart"].to_numpy(np.int64)
    assert (zp == (zk >> 30)).all()
    # top bit of zkey is x's bit 15 and the next is y's bit 15, so each
    # quadrant of (x>=2^15, y>=2^15) space maps to exactly one zpart
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    assert ((((a >> 15) << 1) | (b >> 15)) == zp).all()
    out.write_parquet(str(tmp_path), partition_cols=["zpart"])
    back = rd.read_parquet(str(tmp_path))
    assert back.count() == n
