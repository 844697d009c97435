import pyarrow as pa
import ray.data as rd

from open_telemetry_opentelemetry_collector_contrib_ray.stages.itemsets import (
    frequent_pairs,
)


def _run(baskets, **kw):
    g, it = [], []
    for b, items in baskets:
        for i in items:
            g.append(b)
            it.append(i)
    tbl = pa.table({"g": pa.array(g, pa.int64()),
                    "item": pa.array(it, pa.int64())})
    ds = rd.from_arrow([tbl.slice(i, 1) for i in range(len(g))]) \
        if kw.pop("split_blocks", False) else rd.from_arrow(tbl)
    out = frequent_pairs(ds, "g", "item", n_buckets=4, **kw)
    return {(r["item_a"], r["item_b"]): r["support"]
            for r in out.take_all()}


def test_support_counts_distinct_baskets():
    got = _run([(1, [10, 20, 30]), (2, [10, 20]), (3, [10, 20])],
               min_support=2)
    assert got == {(10, 20): 3}
    got1 = _run([(1, [10, 20, 30]), (2, [10, 20])], min_support=1)
    assert got1 == {(10, 20): 2, (10, 30): 1, (20, 30): 1}


def test_duplicate_items_in_basket_count_once():
    got = _run([(1, [5, 5, 7, 7]), (2, [5, 7])], min_support=1)
    assert got == {(5, 7): 2}


def test_baskets_span_blocks():
    got = _run([(1, [1, 2]), (2, [1, 2]), (3, [9])],
               min_support=2, split_blocks=True)
    assert got == {(1, 2): 2}


def test_max_basket_drops_mega_baskets():
    big = list(range(50))
    got = _run([(1, big), (2, [1, 2]), (3, [1, 2])],
               min_support=1, max_basket=10)
    # basket 1 excluded entirely; pair (1,2) from baskets 2,3 only
    assert got == {(1, 2): 2}
