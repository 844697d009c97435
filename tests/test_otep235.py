"""OTEP-235 threshold encoding + consistent-probability sampler."""
import numpy as np
import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
    Otep235Sampler, decode_th, encode_th, probability_from_threshold,
    threshold_from_probability)

_TH_MAX = 1 << 56


def test_th_encode_decode_roundtrip():
    for t in (0, 1, 0xD0000000000000, _TH_MAX - 1,
              threshold_from_probability(0.25)):
        assert decode_th(encode_th(t)) == t
    assert encode_th(0) == "0"
    # trailing zeros trimmed: 25% keep -> reject 0.75*2^56 = 0xc0...0
    assert encode_th(threshold_from_probability(0.25)) == "c"
    assert encode_th(threshold_from_probability(0.5)) == "8"
    with pytest.raises(ValueError):
        decode_th("")
    with pytest.raises(ValueError):
        encode_th(_TH_MAX)


def test_probability_threshold_inverse():
    for p in (0.0, 0.1, 0.25, 0.5, 0.99, 1.0):
        t = threshold_from_probability(p)
        assert abs(probability_from_threshold(t) - p) < 1e-12 or p == 0.0


def _batch(n=4000):
    return pa.table({"conv_id": pa.array([f"conv{i}" for i in range(n)]),
                     "v": pa.array(np.arange(n, dtype=np.int64))})


def test_sampler_rate_and_consistency():
    b = _batch()
    keep50 = set(Otep235Sampler(50.0).__call__(b).column("conv_id").to_pylist())
    keep25 = set(Otep235Sampler(25.0).__call__(b).column("conv_id").to_pylist())
    assert 0.45 < len(keep50) / b.num_rows < 0.55
    assert 0.20 < len(keep25) / b.num_rows < 0.30
    # consistent sampling: the 25% survivors are a subset of the 50% ones
    assert keep25 <= keep50
    # survivors carry the final encoded threshold
    out = Otep235Sampler(25.0).__call__(b)
    assert set(out.column("sampling_th").to_pylist()) == {"c"}


def test_equalizing_respects_stricter_incoming_threshold():
    b = _batch(1000)
    # upstream sampled at 10% (th 'e6666666666666'); re-sampling at 50%
    # equalizing must NOT resurrect records the 10% pass rejected
    t10 = threshold_from_probability(0.10)
    b10 = b.append_column("th", pa.array([encode_th(t10)] * b.num_rows))
    out = Otep235Sampler(50.0, th_col="th").__call__(b10)
    assert set(out.column("sampling_th").to_pylist()) == {encode_th(t10)}
    direct10 = Otep235Sampler(10.0).__call__(b)
    assert out.column("conv_id").to_pylist() == \
        direct10.column("conv_id").to_pylist()


def test_proportional_composes_multiplicatively():
    b = _batch(8000)
    s1 = Otep235Sampler(50.0, out_th="th").__call__(b)
    s2 = Otep235Sampler(50.0, mode="proportional", th_col="th").__call__(s1)
    # final threshold encodes p = 0.25
    assert set(s2.column("sampling_th").to_pylist()) == \
        {encode_th(threshold_from_probability(0.25))}
    # and the two-stage survivors are exactly the direct-25% survivors
    direct = Otep235Sampler(25.0).__call__(b)
    assert s2.column("conv_id").to_pylist() == \
        direct.column("conv_id").to_pylist()


def test_dataset_splitter_deterministic_and_proportional():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        DatasetSplitter)

    b = pa.table({"doc_id": pa.array(list(range(5000)), pa.int64())})
    sp = DatasetSplitter({"train": 0.8, "val": 0.1, "test": 0.1})
    out1 = sp(b).column("split").to_pylist()
    out2 = sp(b).column("split").to_pylist()
    assert out1 == out2
    frac = {s: out1.count(s) / len(out1) for s in ("train", "val", "test")}
    assert 0.77 < frac["train"] < 0.83
    assert 0.07 < frac["val"] < 0.13
    with pytest.raises(ValueError):
        DatasetSplitter({"a": 0.0})
