"""Property-based tests (hypothesis): the vectorized engine vs naive
row-wise python interpretations on randomized inputs.

These complement the fixed conformance tables: hypothesis explores odd
inputs (empty strings, unicode, nulls, extreme ints) that enumerated
cases miss."""

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from open_telemetry_opentelemetry_collector_contrib_ray.functions import (
    parse_condition,
    parse_statement,
)
from open_telemetry_opentelemetry_collector_contrib_ray.stages.route import (
    Route,
    RouteIdStage,
)

texts = st.one_of(st.none(), st.text(max_size=30))
ints = st.one_of(st.none(), st.integers(min_value=-10**9, max_value=10**9))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(texts, ints), min_size=1, max_size=20))
def test_condition_matches_rowwise(rows):
    t = pa.table({"text": pa.array([r[0] for r in rows], pa.string()),
                  "n": pa.array([r[1] for r in rows], pa.int64())})
    got = parse_condition('n > 100 and IsMatch(text, "a")')(t).to_pylist()
    exp = [bool(n is not None and n > 100 and s is not None and re.search("a", s))
           for s, n in rows]
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(texts, ints), min_size=1, max_size=20))
def test_set_where_matches_rowwise(rows):
    t = pa.table({"text": pa.array([r[0] for r in rows], pa.string()),
                  "n": pa.array([r[1] for r in rows], pa.int64())})
    out = parse_statement('set(attributes["y"], n * 2) where n >= 0').apply(t)
    got = out.column("attr_y").to_pylist()
    exp = [n * 2 if (n is not None and n >= 0) else None for _, n in rows]
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a", "b", "ab", ""]), ints),
                min_size=1, max_size=30))
def test_routing_first_match_wins_property(rows):
    t = pa.table({"text": pa.array([r[0] for r in rows], pa.string()),
                  "n": pa.array([r[1] for r in rows], pa.int64())})
    stage = RouteIdStage([Route("has_a", 'IsMatch(text, "a")'),
                          Route("big", "n > 0"),
                          Route("has_b", 'IsMatch(text, "b")')])
    got = stage(t).column("route_id").to_pylist()

    def ref(s, n):
        if s is not None and "a" in s:
            return "has_a"
        if n is not None and n > 0:
            return "big"
        if s is not None and "b" in s:
            return "has_b"
        return "default"

    assert got == [ref(s, n) for s, n in rows]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abc \n", max_size=20), min_size=1, max_size=25),
       st.integers(min_value=1, max_value=5))
def test_shingle_jaccard_symmetry_and_identity(texts_list, w):
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.dedup import (
        _shingle_hashes,
    )

    for s in texts_list:
        a = set(_shingle_hashes(s, w).tolist())
        b = set(_shingle_hashes(s, w).tolist())
        assert a == b  # deterministic
    if len(texts_list) >= 2:
        x, y = texts_list[0], texts_list[1]
        sx = set(_shingle_hashes(x, w).tolist())
        sy = set(_shingle_hashes(y, w).tolist())
        # Jaccard symmetric and within [0, 1]
        u = len(sx | sy)
        j = len(sx & sy) / u if u else 0.0
        assert 0.0 <= j <= 1.0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=200),
       st.integers(min_value=2, max_value=16))
def test_space_saving_heavy_guarantee(vals, capacity):
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sketch import (
        _ss_add,
        _ss_merge,
    )

    counters: dict = {}
    for v in vals:
        _ss_add(counters, v, 1, capacity)
    # any key with true count > n/capacity must be present
    from collections import Counter

    true = Counter(vals)
    n = len(vals)
    for k, c in true.items():
        if c > n / capacity:
            assert k in counters
        if k in counters:
            assert counters[k] >= c  # estimates never undercount
    # merge keeps the bound
    merged = _ss_merge(counters, counters, capacity)
    for k in merged:
        assert merged[k] >= counters.get(k, 0)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=10))
def test_md5_lower64_matches_duckdb(strings):
    """The sampler/bucket hash must stay bit-exact with DuckDB's
    md5_number_lower forever — the whole oracle story depends on it."""
    import duckdb

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.sample import (
        _md5_lower64,
    )

    ours = _md5_lower64(strings)
    con = duckdb.connect()
    for s, h in zip(strings, ours):
        d = con.sql("select md5_number_lower(?)", params=[s]).fetchone()[0]
        assert int(h) == int(d), s
    con.close()


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=10**6),
)
def test_dedup_sorted_equals_global_on_random_layouts(conv_sizes, n_files, seed):
    """dedup_exact_sorted == dedup_exact for ANY group-contiguous file
    layout: random conversation sizes, random file splits (a conversation
    may span several adjacent files, incl. a file fully inside one
    conversation), duplicate rows planted."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    import os
    import tempfile

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.aggregate import (
        dedup_exact,
        dedup_exact_sorted,
    )

    rng = np.random.RandomState(seed % 2**31)
    rows = []
    for ci, size in enumerate(conv_sizes):
        for ti in range(size):
            # plant duplicates: every third row repeats the previous text
            txt = f"msg-{ci}-{ti if ti % 3 else max(ti - 1, 0)}"
            rows.append({"conv_id": f"c{ci:03d}", "turn_idx": ti,
                         "role": "user" if ti % 2 else "tool", "text": txt,
                         "ts": 1_700_000_000_000_000 + ci * 1000 + ti})
    tbl = pa.Table.from_pylist(rows)
    n = tbl.num_rows
    cuts = sorted(rng.choice(range(1, n), size=min(n_files - 1, n - 1),
                             replace=False).tolist()) if n > 1 and n_files > 1 else []
    bounds = [0] + cuts + [n]
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(len(bounds) - 1):
            p = os.path.join(d, f"part-{i:03d}.parquet")
            pq.write_table(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]), p)
            paths.append(p)
        keys = ["conv_id", "role", "text"]
        fast = dedup_exact_sorted(paths, keys).to_pandas()
        slow = dedup_exact(rd.read_parquet(paths), keys).to_pandas()
    cols = keys + ["log_count", "first_observed", "last_observed",
                   "representative_turn_idx"]
    f = fast[cols].sort_values(keys).reset_index(drop=True)
    s = slow[cols].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, s, check_dtype=False)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.tuples(st.integers(min_value=1, max_value=8),   # spans per conv
                       st.integers(min_value=0, max_value=3),   # start second
                       st.booleans()),                          # has error turn
            min_size=1, max_size=10),
    st.integers(min_value=1, max_value=12),                     # rate budget
)
def test_tailsampling_matches_sequential_reference(convs, budget):
    """Distributed decisions == a sequential simulation of the reference
    evaluators (rate_limiting.go strict-<, per-second reset; span_count;
    string attribute OR) on randomized conversations."""
    import pyarrow as pa

    from open_telemetry_opentelemetry_collector_contrib_ray.stages.tailsampling import (
        tail_sample_decisions,
    )

    US = 1_000_000
    rows = []
    for ci, (n, sec, has_err) in enumerate(convs):
        for ti in range(n):
            rows.append({"conv_id": f"c{ci:02d}", "turn_idx": ti,
                         "attr_status": "error" if (has_err and ti == 0) else "ok",
                         "ts": sec * US + ci * 100 + ti})
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    policies = [{"type": "span_count", "min_spans": 4},
                {"type": "string_attribute", "key": 'attributes["status"]',
                 "values": ["error"]},
                {"type": "rate_limiting", "spans_per_second": budget}]
    got = {r["conv_id"]: r["sampled"]
           for r in tail_sample_decisions(ds, policies, ts_col="ts").take_all()}

    # sequential reference: convs ordered by (decision second, min_ts, id)
    meta = []
    for ci, (n, sec, has_err) in enumerate(convs):
        meta.append((sec, sec * US + ci * 100, f"c{ci:02d}", n, has_err))
    meta.sort()
    taken, cur = 0, None
    expect = {}
    for sec, _, cid, n, has_err in meta:
        sampled = n >= 4 or has_err
        if cur != sec:
            cur, taken = sec, 0
        if taken + n < budget:  # strict <, rate_limiting.go:46
            taken += n
            sampled = True
        expect[cid] = sampled
    assert got == expect


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 2**31 - 1), st.sampled_from(["inner", "left", "outer", "semi", "anti"]))
def test_bucketed_hash_join_matches_pandas_merge(seed, how):
    """Acero in-bucket join == single-process pandas merge on random
    typed frames (dup keys, null payloads, disjoint keys), every mode."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from open_telemetry_opentelemetry_collector_contrib_ray.stages.join import (
        bucketed_hash_join,
    )

    rng = np.random.RandomState(seed)
    nl, nr = int(rng.randint(1, 60)), int(rng.randint(1, 60))
    left = pd.DataFrame({
        "k": rng.randint(0, 12, nl),
        "lv": rng.randint(-5, 5, nl).astype("int64"),
    })
    right = pd.DataFrame({
        "k": rng.randint(6, 18, nr),  # partial overlap
        "rv": rng.rand(nr),
    })
    # null payloads (keys stay non-null: null-key join semantics are
    # covered by dedicated unit tests)
    left.loc[left.sample(frac=0.2, random_state=seed).index, "lv"] = None
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)) \
        .repartition(3)
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)) \
        .repartition(2)
    got = bucketed_hash_join(lds, rds, on=["k"], how=how,
                             n_buckets=4).to_pandas()

    if how == "semi":
        exp = left[left.k.isin(set(right.k))]
        cols = ["k", "lv"]
    elif how == "anti":
        exp = left[~left.k.isin(set(right.k))]
        cols = ["k", "lv"]
    else:
        exp = left.merge(right, on="k",
                         how={"inner": "inner", "left": "left",
                              "outer": "outer"}[how])
        cols = ["k", "lv", "rv"]
    if len(exp) == 0:
        # Ray gotcha: to_pandas() on a 0-row Dataset drops the schema
        assert len(got) == 0
        return
    g = got[cols].sort_values(cols).reset_index(drop=True).astype("float64")
    x = exp[cols].sort_values(cols).reset_index(drop=True).astype("float64")
    pd.testing.assert_frame_equal(g, x)
