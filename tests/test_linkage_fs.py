import math

import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.linkage import (
    fellegi_sunter_scores,
    fellegi_sunter_weights,
)

PARAMS = {"phone": (0.9, 0.05), "city": (0.8, 0.2)}


def test_weights_formula_and_validation():
    import pytest

    w = fellegi_sunter_weights(PARAMS)
    assert w["phone"][0] == math.log(0.9 / 0.05)
    assert w["phone"][1] == math.log((1 - 0.9) / (1 - 0.05))
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fellegi_sunter_weights({"x": (0.2, 0.5)})


def test_scores_agree_disagree_missing():
    t = pa.table({
        "phone_a": pa.array(["123", "123", None], pa.string()),
        "phone_b": pa.array(["123", "999", "123"], pa.string()),
        "city_a": pa.array(["rome", "rome", "rome"], pa.string()),
        "city_b": pa.array(["rome", "rome", "oslo"], pa.string()),
    })
    out = fellegi_sunter_scores(rd.from_arrow(t), PARAMS,
                                threshold=2.0).to_pandas()
    wp, wc = (fellegi_sunter_weights(PARAMS)[k] for k in ("phone", "city"))
    # fixed field order: phone then city
    assert out["score"][0] == wp[0] + wc[0]
    assert out["score"][1] == wp[1] + wc[0]
    assert out["score"][2] == 0.0 + wc[1]  # null phone = no evidence
    assert list(out["match"]) == [True, False, False]
