import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
    attribute_conversions,
)

US = 1_000_000


def _events(rows):
    # rows: (event_id, user_id, event_type, ts_us)
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
    })


def _run(rows, model, window_us=10 * US):
    out = attribute_conversions(
        rd.from_arrow(_events(rows)), "purchase", ["view", "click"],
        window_us=window_us, model=model, n_buckets=4)
    return {r["conv_id"]: (r["touch_id"], r["touch_type"])
            for r in out.take_all()}


BASE = [
    (1, 7, "view", 0 * US),
    (2, 7, "click", 3 * US),
    (3, 7, "view", 5 * US),
    (4, 7, "purchase", 8 * US),
]


def test_last_touch_picks_latest():
    assert _run(BASE, "last")[4] == (3, "view")


def test_first_touch_picks_earliest_in_window():
    # window [t-10, t) covers all three touches; earliest = id 1
    assert _run(BASE, "first")[4] == (1, "view")
    # tight window [3, 8): view@0 excluded, earliest inside = click@3
    assert _run(BASE, "first", window_us=5 * US)[4] == (2, "click")


def test_window_boundaries_half_open():
    rows = [
        (1, 1, "view", 0 * US),          # exactly at window start: IN
        (2, 1, "click", 10 * US),        # same ts as conversion: OUT
        (3, 1, "purchase", 10 * US),
    ]
    assert _run(rows, "last", window_us=10 * US)[3] == (1, "view")
    assert _run(rows, "first", window_us=10 * US)[3] == (1, "view")


def test_same_ts_tie_breaks():
    rows = [
        (5, 2, "view", 4 * US),
        (9, 2, "click", 4 * US),         # same ts, larger id
        (10, 2, "purchase", 6 * US),
    ]
    assert _run(rows, "last")[10] == (9, "click")    # max id at max ts
    assert _run(rows, "first")[10] == (5, "view")    # min id at min ts


def test_unattributed_conversion_kept_with_nulls():
    rows = [
        (1, 3, "view", 0 * US),
        (2, 3, "purchase", 50 * US),     # view is outside the window
    ]
    assert _run(rows, "last")[2] == (None, None)
    assert _run(rows, "first")[2] == (None, None)


def test_users_isolated():
    rows = [
        (1, 1, "view", 0 * US),
        (2, 2, "purchase", 5 * US),      # user 2 has no touches
        (3, 1, "purchase", 5 * US),
    ]
    got = _run(rows, "last")
    assert got[3] == (1, "view") and got[2] == (None, None)


def test_linear_weights_split_equally():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
        attribute_linear,
    )
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([100, 200, 300, 250, 50], pa.timestamp("us")),
        "event_type": pa.array(
            ["view", "click", "purchase", "view", "purchase"],
            pa.string()),
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
    })
    out = attribute_linear(rd.from_arrow(t), "purchase",
                           ["view", "click"], window_us=1000,
                           n_buckets=2)
    rows = sorted(((r["conv_id"], r["touch_id"], r["weight"])
                   for r in out.take_all()),
                  key=lambda x: (x[0], x[1] if x[1] is not None else -1))
    # conv 12 (user1): touches 10,11,13 all in window -> 1/3 each
    # conv 14 (user2): no touches -> single null row
    assert rows == [(12, 10, 1 / 3), (12, 11, 1 / 3), (12, 13, 1 / 3),
                    (14, None, None)] or \
        rows == [(14, None, None), (12, 10, 1 / 3), (12, 11, 1 / 3),
                 (12, 13, 1 / 3)]


def test_linear_window_bound_half_open():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
        attribute_linear,
    )
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([100, 200, 300, 300], pa.timestamp("us")),
        "event_type": pa.array(["view", "view", "view", "purchase"],
                               pa.string()),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
    })
    # window 100: touch at 200 qualifies (>= 300-100), 300 excluded
    # (< conv_ts strict), 100 outside
    out = attribute_linear(rd.from_arrow(t), "purchase", ["view"],
                           window_us=100, n_buckets=2)
    rows = [(r["touch_id"], r["weight"]) for r in out.take_all()]
    assert rows == [(2, 1.0)]


def test_time_decay_buckets_and_normalization():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
        attribute_weighted,
    )
    # half-life 100us; touches at ages 50 (bucket 0), 150 (bucket 1),
    # 250 (bucket 2) -> raw 1, 1/2, 1/4; sum 7/4 -> shares 4/7, 2/7, 1/7
    t = _events([(1, 1, "view", 750), (2, 1, "view", 850),
                 (3, 1, "view", 950), (4, 1, "purchase", 1000)])
    out = attribute_weighted(rd.from_arrow(t), "purchase", ["view"],
                             window_us=1000, model="time_decay",
                             half_life_us=100, n_buckets=2)
    rows = sorted((r["touch_id"], r["weight"]) for r in out.take_all())
    assert rows == [(1, 1 / 7), (2, 2 / 7), (3, 4 / 7)]


def test_time_decay_unattributed_null_row():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
        attribute_weighted,
    )
    t = _events([(1, 9, "purchase", 1000)])
    out = attribute_weighted(rd.from_arrow(t), "purchase", ["view"],
                             window_us=1000, model="time_decay",
                             half_life_us=100, n_buckets=2)
    rows = [(r["conv_id"], r["touch_id"], r["weight"])
            for r in out.take_all()]
    assert rows == [(1, None, None)]


def test_time_decay_ratio_bound_validated():
    import pytest

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
        attribute_weighted,
    )
    # window/half_life >= 63 would overflow the SQL BIGINT shift replay
    # (and underflow to 0/0 NaN shares at n >= 1075): rejected eagerly
    with pytest.raises(ValueError, match="63"):
        attribute_weighted(None, "purchase", ["view"],
                           window_us=63_000, model="time_decay",
                           half_life_us=1_000)
    with pytest.raises(ValueError, match="half_life_us"):
        attribute_weighted(None, "purchase", ["view"],
                           window_us=1000, model="time_decay",
                           half_life_us=0)


def test_position_u_shape_weights():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
        attribute_weighted,
    )
    # k=4 touches ordered by ts: 0.4, 0.1, 0.1, 0.4
    t = _events([(1, 1, "view", 100), (2, 1, "click", 200),
                 (3, 1, "view", 300), (4, 1, "click", 400),
                 (5, 1, "purchase", 500)])
    out = attribute_weighted(rd.from_arrow(t), "purchase",
                             ["view", "click"], window_us=1000,
                             model="position", n_buckets=2)
    rows = sorted((r["touch_id"], r["weight"]) for r in out.take_all())
    assert rows == [(1, 0.4), (2, 0.2 / 2), (3, 0.2 / 2), (4, 0.4)]


def test_position_small_k_and_ties():
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
        attribute_weighted,
    )
    # user 1: k=1 -> 1.0; user 2: k=2 -> 0.5/0.5; user 3: tie on ts,
    # order falls back to touch_id (6 first, 7 last)
    t = _events([(1, 1, "view", 100), (2, 1, "purchase", 200),
                 (3, 2, "view", 100), (4, 2, "view", 150),
                 (5, 2, "purchase", 200),
                 (6, 3, "view", 100), (7, 3, "view", 100),
                 (8, 3, "view", 120), (9, 3, "purchase", 200)])
    out = attribute_weighted(rd.from_arrow(t), "purchase", ["view"],
                             window_us=1000, model="position",
                             n_buckets=2)
    rows = sorted((r["conv_id"], r["touch_id"], r["weight"])
                  for r in out.take_all())
    assert rows == [(2, 1, 1.0), (5, 3, 0.5), (5, 4, 0.5),
                    (9, 6, 0.4), (9, 7, 0.2), (9, 8, 0.4)]


def test_weighted_rejects_unknown_model():
    import pytest

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.attribution import (
        attribute_weighted,
    )
    with pytest.raises(ValueError):
        attribute_weighted(None, "p", ["v"], 10, model="bogus")
