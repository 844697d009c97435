"""skew_join: salted hot keys must reproduce the plain join exactly."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.join import (
    _hot_keys, bucketed_hash_join, skew_join)


def _skewed(n=4000, hot_share=0.5, seed=3):
    rng = np.random.default_rng(seed)
    k = np.where(rng.random(n) < hot_share, 7,
                 rng.integers(0, 40, n)).astype(np.int64)
    return pd.DataFrame({"k": k, "lv": np.arange(n, dtype=np.int64)})


def _mk(df, parts=4):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


def _right(nk=40):
    return pd.DataFrame({"k": np.arange(nk, dtype=np.int64),
                         "rv": np.arange(nk, dtype=np.int64) * 10})


def _sorted(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_skew_join_equals_plain_join(how):
    ldf, rdf = _skewed(), _right()
    rdf = rdf[rdf["k"] % 3 != 1]  # some left keys unmatched
    got = _sorted(skew_join(_mk(ldf), _mk(rdf, 2), on=["k"], how=how,
                            n_salt=4, hot_keys=[7]))
    exp = _sorted(bucketed_hash_join(_mk(ldf), _mk(rdf, 2), on=["k"],
                                     how=how))
    pd.testing.assert_frame_equal(got, exp)


def test_hot_key_autodetect_and_fallback():
    ds = _mk(_skewed(hot_share=0.6))
    hot = _hot_keys(ds, "k", k=4, min_share=0.1)
    assert hot == [7]
    # uniform data -> no hot keys -> plain-join delegation still correct
    uni = pd.DataFrame({"k": np.arange(200, dtype=np.int64) % 50,
                        "lv": np.arange(200, dtype=np.int64)})
    got = _sorted(skew_join(_mk(uni), _mk(_right(50), 2), on=["k"],
                            how="inner"))
    exp = _sorted(bucketed_hash_join(_mk(uni), _mk(_right(50), 2),
                                     on=["k"], how="inner"))
    pd.testing.assert_frame_equal(got, exp)


def test_skew_join_spreads_hot_key_over_salts():
    # hot right rows replicate n_salt times; hot left rows split evenly
    ldf = _skewed(n=1000, hot_share=1.0)  # every row key 7
    out = skew_join(_mk(ldf), _mk(_right(), 2), on=["k"], how="inner",
                    n_salt=5, hot_keys=[7]).to_pandas()
    assert len(out) == 1000  # one right match each, no dup, no loss


def test_skew_join_rejects_outer_and_multi_col_autodetect():
    ldf, rdf = _skewed(100), _right()
    with pytest.raises(ValueError):
        skew_join(_mk(ldf), _mk(rdf, 2), on=["k"], how="outer")
    with pytest.raises(ValueError):
        skew_join(_mk(ldf.assign(j=1)), _mk(rdf.assign(j=1), 2),
                  on=["k", "j"], how="inner")


def test_bucketed_join_null_key_sql_semantics():
    """Null keys never match (SQL / DuckDB-oracle semantics): inner and
    semi drop null-key left rows, left keeps them with null right
    columns, anti KEEPS them (NOT EXISTS), even when the right side
    also holds a null key."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    left = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                     "lv": pa.array([10, 20, 30], pa.int64())})
    right = pa.table({"k": pa.array([1, None], pa.int64()),
                      "rv": pa.array([100, 200], pa.int64())})
    L, R = rd.from_arrow(left), rd.from_arrow(right)

    inner = bucketed_hash_join(L, R, on=["k"], how="inner").to_pandas()
    assert inner.k.tolist() == [1] and inner.rv.tolist() == [100]

    lj = bucketed_hash_join(L, R, on=["k"], how="left").to_pandas() \
        .sort_values("lv")
    assert lj.lv.tolist() == [10, 20, 30]
    assert pd.isna(lj[lj.lv == 20].rv.iloc[0])   # null key matched nothing

    semi = bucketed_hash_join(L, R, on=["k"], how="semi").to_pandas()
    assert semi.lv.tolist() == [10]

    anti = bucketed_hash_join(L, R, on=["k"], how="anti").to_pandas() \
        .sort_values("lv")
    assert anti.lv.tolist() == [20, 30]  # null-key row KEPT (NOT EXISTS)
