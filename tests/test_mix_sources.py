"""Weighted source mixing (stages/sample.py SourceMixer)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
    SourceMixer,
    mix_sources,
)


def _t(n=400, sources=("a", "b")):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": [sources[i % len(sources)] for i in range(n)]})


def test_integer_weights_exact_epochs():
    out = SourceMixer({"a": 3.0, "b": 1.0})(_t(100))
    import collections

    c = collections.Counter(zip(out.column("source").to_pylist(),
                                out.column("epoch").to_pylist()))
    assert c[("a", 0)] == c[("a", 1)] == c[("a", 2)] == 50
    assert c[("b", 0)] == 50 and ("b", 1) not in c


def test_fractional_weight_rate_and_determinism():
    t = _t(2000, sources=("a",))
    out1 = SourceMixer({"a": 0.5})(t)
    out2 = SourceMixer({"a": 0.5})(t)
    assert out1.equals(out2)  # same rows, same order — fully deterministic
    rate = out1.num_rows / 2000
    assert 0.45 < rate < 0.55


def test_zero_weight_drops_and_default_applies():
    out = SourceMixer({"a": 0.0}, default_weight=1.0)(_t(50))
    assert set(out.column("source").to_pylist()) == {"b"}
    assert out.num_rows == 25


def test_negative_weight_is_loud():
    with pytest.raises(ValueError, match="negative weight"):
        SourceMixer({"a": -1.0})


def test_dataset_level_and_epoch_copy_identity():
    ds = ray.data.from_arrow(_t(40, sources=("a",)))
    df = mix_sources(ds, {"a": 2.25}).to_pandas()
    # every doc appears at epochs 0 and 1; epoch 2 is the ~25% fraction
    by_epoch = df.groupby("epoch")["doc_id"].count()
    assert by_epoch[0] == 40 and by_epoch[1] == 40
    assert 0 <= by_epoch.get(2, 0) <= 25
    # copies are identical rows apart from the epoch column
    d0 = df[df.epoch == 0].drop(columns="epoch").reset_index(drop=True)
    d1 = df[df.epoch == 1].drop(columns="epoch").reset_index(drop=True)
    assert d0.equals(d1)
