"""Expectations-style validation: counts, flags, distributed unique."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.stages.validate import (
    validate)


def _ds(parts=3):
    import ray.data as rd

    df = pd.DataFrame({
        "id": [1, 2, 2, 3, 4, 4, 4, 5],
        "name": ["a", None, "b", "c", "x" * 30, "d", None, "e"],
        "score": [0.5, 1.5, -0.1, 0.9, 0.2, 0.8, 2.0, None],
        "lang": ["en", "fr", "xx", "en", "de", "en", "yy", "fr"],
    })
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


RULES = [
    {"kind": "not_null", "col": "name"},
    {"kind": "in_range", "col": "score", "lo": 0.0, "hi": 1.0},
    {"kind": "in_set", "col": "lang", "values": ["en", "fr", "de"]},
    {"kind": "str_len", "col": "name", "hi": 10, "name": "name_len"},
    {"kind": "unique", "col": "id"},
]


def test_violation_counts():
    got = {r["rule"]: r["n_violations"]
           for r in validate(_ds(), RULES).take_all()}
    assert got == {
        "not_null_name": 2,
        "in_range_score": 3,     # 1.5, -0.1, 2.0 (null score not counted)
        "in_set_lang": 2,        # xx, yy
        "name_len": 1,           # the 30-char name
        "unique_id": 3,          # id 2 twice (+1), id 4 thrice (+2)
    }


def test_flag_mode_row_level():
    out = validate(_ds(), RULES[:3], mode="flag").to_pandas() \
        .sort_values(["id", "lang"]).reset_index(drop=True)
    assert int(out["bad_not_null_name"].sum()) == 2
    assert int(out["bad_in_range_score"].sum()) == 3
    assert int(out["bad_in_set_lang"].sum()) == 2
    # flags align per row: the xx row is id 2
    assert bool(out.loc[(out["lang"] == "xx"), "bad_in_set_lang"].iloc[0])


def test_unique_not_flaggable_and_unknown_kind():
    with pytest.raises(ValueError):
        validate(_ds(), [{"kind": "unique", "col": "id"}], mode="flag")
    with pytest.raises(ValueError):
        validate(_ds(), [{"kind": "median", "col": "id"}])


def test_matches_rule():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "email": pa.array(["a@b.com", "bad", None, "c@d.org"])}))
    got = validate(ds, [{"kind": "matches", "col": "email",
                         "pattern": r"^[^@]+@[^@]+\.[a-z]+$"}]).take_all()
    assert got[0]["n_violations"] == 1  # null is not a match violation
