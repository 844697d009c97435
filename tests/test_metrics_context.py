"""Metric/datapoint statement contexts + the metric function family.

Conformance cases mirror the reference's function tests
(processor/transformprocessor/internal/metrics/func_*_test.go) and the
context addressing of internal/common/config.go:14-21 over flattened
metric tables (one row per datapoint)."""

import numpy as np
import pyarrow as pa
import pytest

from open_telemetry_opentelemetry_collector_contrib_ray.functions.ast import (
    Parser,
    parse_statement,
)
from open_telemetry_opentelemetry_collector_contrib_ray.stages import TransformStage


def _path_col(src: str, context=None) -> str:
    node = Parser(src, context=context).parse_expr()
    return node.column


def test_context_path_mapping():
    # metric context: bare metric fields -> metric_* (metric.go:35-47)
    assert _path_col("name", "metric") == "metric_name"
    assert _path_col("unit", "metric") == "metric_unit"
    assert _path_col("aggregation_temporality", "metric") == \
        "metric_aggregation_temporality"
    # datapoint context: metric.X is the upward reference
    # (ottldatapoint/datapoint.go:198); bare datapoint fields stay bare
    assert _path_col("metric.name", "datapoint") == "metric_name"
    assert _path_col("value_double", "datapoint") == "value_double"
    assert _path_col('attributes["host"]', "datapoint") == "attr_host"
    # legacy (no context): prefixes strip — back-compat
    assert _path_col("metric.name") == "name"
    assert _path_col("datapoint.value_int") == "value_int"
    with pytest.raises(ValueError):
        Parser("name", context="bogus")


def _metric_table() -> pa.Table:
    return pa.table({
        "metric_name": ["latency", "latency", "requests", "queue_len"],
        "metric_unit": ["ms", "ms", "1", "1"],
        "metric_type": ["Histogram", "Histogram", "Sum", "Gauge"],
        "metric_aggregation_temporality":
            ["cumulative", "cumulative", "delta", None],
        "metric_is_monotonic": [None, None, True, None],
        "attr_host": ["a", "b", "a", "a"],
        "value_double": pa.array([None, None, 41.0, 7.0], pa.float64()),
        "count": pa.array([10, 20, None, None], pa.int64()),
        "sum": pa.array([55.5, 99.0, None, None], pa.float64()),
    })


def test_transform_stage_metric_context_statements():
    t = _metric_table()
    stage = TransformStage(
        ['set(unit, "s") where name == "latency"'], context="metric")
    out = stage(t)
    assert out.column("metric_unit").to_pylist() == ["s", "s", "1", "1"]

    # datapoint context: condition on the datapoint, set via metric.-ref
    stage2 = TransformStage(
        ['set(attributes["big"], true) where value_double > 10.0 '
         'and metric.name == "requests"'], context="datapoint")
    out2 = stage2(t)
    assert out2.column("attr_big").to_pylist() == [None, None, True, None]


def test_convert_sum_to_gauge_and_back():
    # func_convert_sum_to_gauge_test.go: only Sum converts
    t = _metric_table()
    out = TransformStage(["convert_sum_to_gauge()"], context="metric")(t)
    assert out.column("metric_type").to_pylist() == \
        ["Histogram", "Histogram", "Gauge", "Gauge"]
    # the converted row sheds temporality + monotonicity
    assert out.column("metric_aggregation_temporality").to_pylist()[2] is None
    assert out.column("metric_is_monotonic").to_pylist()[2] is None

    # func_convert_gauge_to_sum_test.go: only Gauge converts; args apply
    out2 = TransformStage(['convert_gauge_to_sum("delta", true)'],
                          context="metric")(t)
    assert out2.column("metric_type").to_pylist() == \
        ["Histogram", "Histogram", "Sum", "Sum"]
    assert out2.column("metric_aggregation_temporality").to_pylist()[3] == "delta"
    assert out2.column("metric_is_monotonic").to_pylist()[3] is True
    with pytest.raises(ValueError):
        TransformStage(['convert_gauge_to_sum("sometimes", true)'],
                       context="metric")(t)


def test_scale_metric():
    # func_scale_test.go: values multiply; optional unit replacement
    t = _metric_table()
    out = TransformStage(['scale_metric(0.001, "s") where name == "latency"'],
                         context="metric")(t)
    assert out.column("sum").to_pylist()[:2] == [0.0555, 0.099]
    assert out.column("metric_unit").to_pylist() == ["s", "s", "1", "1"]
    # unscoped rows untouched
    assert out.column("value_double").to_pylist()[2] == 41.0


def test_copy_metric_override_without_unit_column(ray_session):
    # ADVICE regression: unit=/description= overrides on a batch that
    # LACKS metric_unit/metric_description must promote, not crash
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        copy_metric,
    )

    t = _metric_table().drop_columns(["metric_unit"])
    got = copy_metric(rd.from_arrow(t), "requests", "requests_backup",
                      unit="req", description="copy").to_pandas()
    assert len(got) == 5
    row = got[got.metric_name == "requests_backup"].iloc[0]
    assert row.metric_unit == "req" and row.metric_description == "copy"
    # pass-through rows get nulls in the promoted columns
    assert got[got.metric_name == "requests"].metric_unit.isna().all()


def test_copy_and_extract_metrics(ray_session):
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        aggregate_on_attributes,
        copy_metric,
        extract_count_metric,
        extract_sum_metric,
    )

    ds = rd.from_arrow(_metric_table())
    got = copy_metric(ds, "requests", "requests_backup",
                      unit="req").to_pandas()
    assert len(got) == 5
    row = got[got.metric_name == "requests_backup"].iloc[0]
    assert row.metric_unit == "req" and row.value_double == 41.0

    got2 = extract_count_metric(rd.from_arrow(_metric_table()),
                                monotonic=True).to_pandas()
    new = got2[got2.metric_name == "latency_count"]
    # one _count row per histogram datapoint; unit forced to '1'
    assert sorted(new.value_double) == [10.0, 20.0]
    assert set(new.metric_unit) == {"1"}
    assert set(new.metric_type) == {"Sum"}
    assert set(new.metric_is_monotonic) == {True}

    got3 = extract_sum_metric(rd.from_arrow(_metric_table())).to_pandas()
    new3 = got3[got3.metric_name == "latency_sum"]
    assert sorted(new3.value_double) == [55.5, 99.0]
    assert set(new3.metric_unit) == {"ms"}  # unit kept

    # aggregate_on_attributes: drop all attrs -> one row per metric
    agg = aggregate_on_attributes(
        rd.from_arrow(_metric_table()), fn="sum",
        value_col="value_double").to_pandas()
    req = agg[agg.metric_name == "requests"].iloc[0]
    assert req.value_double == 41.0
    assert "attr_host" not in agg.columns
    # keeping host: latency splits by host again
    agg2 = aggregate_on_attributes(
        rd.from_arrow(_metric_table()), fn="count",
        attributes=["host"]).to_pandas()
    assert set(agg2.columns) >= {"metric_name", "attr_host", "value_double"}
    lat = agg2[agg2.metric_name == "latency"]
    assert sorted(lat.attr_host) == ["a", "b"]
    with pytest.raises(ValueError):
        aggregate_on_attributes(ds, fn="median")


def test_aggregate_on_attribute_value(ray_session):
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        aggregate_on_attribute_value,
    )

    t = pa.table({
        "metric_name": ["m", "m", "m", "m"],
        "metric_type": ["Sum"] * 4,
        "attr_host": ["a1", "a2", "b", "a1"],
        "value_double": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
    })
    # rewrite a1/a2 -> a, then merge colliding datapoints
    out = aggregate_on_attribute_value(
        rd.from_arrow(t), fn="sum", attribute="host",
        values=["a1", "a2"], new_value="a").to_pandas()
    got = {r.attr_host: r.value_double for r in out.itertuples()}
    assert got == {"a": 11.0, "b": 4.0}


def test_exp_to_explicit_histogram(ray_session):
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.metrics import (
        exp_to_explicit_histogram,
    )

    # scale 0: bucket k covers (2^k, 2^(k+1)]
    exp = pa.table({
        "m": ["a", "a", "a", "a"],
        "bucket": pa.array([None, 2, 5, 11], pa.int64()),  # null = zero bucket
        "n": pa.array([3, 10, 20, 7], pa.int64()),
    })
    out = exp_to_explicit_histogram(
        rd.from_arrow(exp), bounds=[8, 64, 512], keys=["m"]).to_pandas()
    got = {r.le: r.n for r in out.itertuples()}
    # upper edges: 0 (zero bucket) -> 8; 2^3=8 -> 8; 2^6=64 -> 64;
    # 2^12=4096 -> overflow (+inf)
    assert got[8.0] == 13 and got[64.0] == 20
    assert got[float("inf")] == 7

    # midpoint mode: bucket 2 midpoint (4+8)/2=6 -> 8; bucket 5
    # midpoint (32+64)/2=48 -> 64; bucket 11 midpoint 3072 -> inf
    out2 = exp_to_explicit_histogram(
        rd.from_arrow(exp), bounds=[8, 64, 512], keys=["m"],
        distribution="midpoint").to_pandas()
    got2 = {r.le: r.n for r in out2.itertuples()}
    assert got2[8.0] == 13 and got2[64.0] == 20 and got2[float("inf")] == 7

    import pytest

    with pytest.raises(ValueError):
        exp_to_explicit_histogram(rd.from_arrow(exp), bounds=[8],
                                  keys=["m"], distribution="random")


def test_resource_and_scope_contexts():
    # ottlresource: bare attributes address the resource (res_*)
    assert _path_col('attributes["svc"]', "resource") == "res_svc"
    assert _path_col("schema_url", "resource") == "res_schema_url"
    # ottlscope: name/version -> scope_*, attributes -> scope_attr_*,
    # resource upward reference -> res_*
    assert _path_col("name", "scope") == "scope_name"
    assert _path_col("version", "scope") == "scope_version"
    assert _path_col('attributes["lib"]', "scope") == "scope_attr_lib"
    assert _path_col('resource.attributes["svc"]', "scope") == "res_svc"

    t = pa.table({"res_svc": ["a", "b"], "scope_name": ["s1", "s2"]})
    out = TransformStage(['set(attributes["env"], "prod") '
                          'where attributes["svc"] == "a"'],
                         context="resource")(t)
    assert out.column("res_env").to_pylist() == ["prod", None]


def test_transform_stage_conditions_gate():
    # ContextStatements.Conditions (config.go:34-38): OR'd gate ANDs
    # into every statement's where
    t = pa.table({"text": ["x", "y", "z"],
                  "attr_keep": [True, False, True],
                  "attr_also": [False, False, True]})
    stage = TransformStage(['set(attributes["tag"], "hit")'],
                           conditions=['attributes["keep"] == true',
                                       'attributes["also"] == true'])
    out = stage(t)
    assert out.column("attr_tag").to_pylist() == ["hit", None, "hit"]
    # gate composes with a statement-level where
    stage2 = TransformStage(['set(attributes["tag"], "hit") '
                             'where text == "z"'],
                            conditions=['attributes["keep"] == true'])
    out2 = stage2(t)
    assert out2.column("attr_tag").to_pylist() == [None, None, "hit"]


def test_extract_from_summary_null_temporality(ray_session):
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.stages import (
        extract_count_metric,
        extract_sum_metric,
    )

    # Summary rows carry no temporality; they still extract and the new
    # Sum is cumulative (getAggregationTemporality treats Summary as
    # implicitly cumulative)
    t = pa.table({
        "metric_name": ["lat_summary"],
        "metric_unit": ["ms"],
        "metric_type": ["Summary"],
        "metric_aggregation_temporality": pa.array([None], pa.string()),
        "count": pa.array([42], pa.int64()),
        "sum": pa.array([77.5], pa.float64()),
    })
    got = extract_count_metric(rd.from_arrow(t), monotonic=True).to_pandas()
    new = got[got.metric_name == "lat_summary_count"]
    assert len(new) == 1 and new.value_double.iloc[0] == 42.0
    assert new.metric_aggregation_temporality.iloc[0] == "cumulative"
    got2 = extract_sum_metric(rd.from_arrow(t)).to_pandas()
    new2 = got2[got2.metric_name == "lat_summary_sum"]
    assert len(new2) == 1 and new2.value_double.iloc[0] == 77.5


def test_span_context_addressing():
    # ottlspan paths over flat span tables: bare fields, dotted status,
    # attributes map — all resolve with context='span'
    assert _path_col("span.name", "span") == "name"
    assert _path_col("name", "span") == "name"
    assert _path_col("status.code", "span") == "status_code"
    assert _path_col("status.message", "span") == "status_message"
    assert _path_col('attributes["peer"]', "span") == "attr_peer"
    assert _path_col("trace_id", "span") == "trace_id"
    assert _path_col('resource.attributes["svc"]', "span") == "res_svc"
    assert _path_col("end_time_unix_nano", "span") == "end_time_unix_nano"
