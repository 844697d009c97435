"""Skip-gram collocation mining: windowed word-pair counts + PMI.

The corpus-statistics primitive behind collocation extraction
("machine learning", "stack trace"), word-vector co-occurrence matrices
(GloVe's input) and phrase-table construction: count ordered token
pairs (a, b) where b follows a within a window of W tokens inside the
same document, then score each pair by pointwise mutual information
against the pair-marginal distribution:

    PMI(a,b) = ln( c(a,b) * N / (c_left(a) * c_right(b)) )

with N = total pair count and the marginals taken over the SAME pair
population — self-normalizing, so the whole statistic is replayable
from one counting rule (and that is exactly what the DuckDB oracle
does).

Scale shape: pair generation is map-only zero-copy Arrow (the token
flat array sliced against itself once per lag — no per-row Python, the
text never shuffles); per-batch pair-count partials collapse
occurrences to distinct pairs before the ONE bucketed exchange; the
merged pair table is materialized ONCE (it is the aggregate, orders of
magnitude smaller than the corpus), marginals reduce from it through
kilobyte partials, and PMI attaches map-side from ``ray.put``-broadcast
sorted marginal arrays (put once, zero-copy read in every scoring
task — never re-shipped per batch).  ``min_count`` prunes the OUTPUT
only — marginals are SUMS over the full pair population, matching the
SQL definition — but the marginal pull itself is min_count-pruned
EXACTLY: a key whose full marginal is below ``min_count`` can never be
a side of a surviving pair (the marginal includes that pair's own
count), so dropping it changes no surviving PMI bit.  ``total`` (N) is
reduced from the pair table directly, before any pruning.  A
``max_marginals`` guard bounds driver/broadcast memory honestly —
raise ``min_count`` for bigger corpora (the build_ngram_model
contract, lmscore.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .invindex import _explode_tokens


def _pair_partials(t: pa.Table, text_col: str, id_col: str,
                   window: int) -> pa.Table:
    """One batch -> distinct (left, right, c) pair-count partials for
    all lags 1..window-1, same-document pairs only."""
    doc, _, flat = _explode_tokens(t, text_col, id_col)
    n = len(doc)
    parts = []
    for d in range(1, window):
        if n <= d:
            break
        same = pa.array(doc[d:] == doc[:-d])
        parts.append(pa.table({
            "left": flat.slice(0, n - d),
            "right": flat.slice(d, n - d)}).filter(same))
    if not parts:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    pairs = pa.concat_tables(parts)
    return pa.TableGroupBy(pairs, ["left", "right"]) \
        .aggregate([([], "count_all")]) \
        .rename_columns(["left", "right", "c"])


def _marginal_arrays(counts, key_col: str, min_count: int,
                     max_marginals: int):
    """Distributed marginal pull: groupby-sum, the exact min_count
    prune (see module docstring), a metadata-count guard, then ONE
    driver gather into sorted (keys, vals) numpy arrays + ray.put."""
    import ray

    m = counts.groupby(key_col).sum("c")
    if min_count > 1:
        m = m.map_batches(
            lambda t: t.filter(pa.compute.greater_equal(
                t.column("sum(c)"), pa.scalar(min_count, pa.int64()))),
            batch_format="pyarrow")
    m = m.materialize()
    n = m.count()
    if n > max_marginals:
        raise ValueError(
            f"collocation {key_col!r} marginal table has {n} keys "
            f"(> max_marginals={max_marginals}); raise min_count")
    parts = [ray.get(r) for r in m.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    if parts:
        tbl = pa.concat_tables(parts)
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        vals = tbl.column("sum(c)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
    else:
        keys = np.array([], dtype=object)
        vals = np.array([], dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    return ray.put((keys[order], np.ascontiguousarray(vals[order])))


def collocations(ds, text_col: str = "text", id_col: str = "doc_id",
                 window: int = 3, min_count: int = 2,
                 n_buckets: int = 32, max_marginals: int = 5_000_000):
    """Mine windowed collocations (see module docstring).  Returns a
    Dataset of ``left, right, c, pmi`` for pairs with ``c >=
    min_count`` (marginals are full-population sums; keys whose full
    marginal is below min_count are pruned from the broadcast — exact,
    they cannot touch a surviving pair)."""
    import ray

    from .aggregate import grouped_agg

    counts = grouped_agg(
        ds.map_batches(
            lambda t: _pair_partials(t, text_col, id_col, window),
            batch_format="pyarrow"),
        ["left", "right"], [("sum", "c", "c")], combine="bucket",
        n_buckets=n_buckets).materialize()

    total = int(counts.sum("c") or 0)  # N over the FULL pair population
    l_ref = _marginal_arrays(counts, "left", min_count, max_marginals)
    r_ref = _marginal_arrays(counts, "right", min_count, max_marginals)

    def score(t: pa.Table) -> pa.Table:
        if min_count > 1:
            t = t.filter(pa.compute.greater_equal(
                t.column("c"), pa.scalar(min_count, pa.int64())))
        # zero-copy object-store reads after the first fetch per node
        l_keys, l_vals = ray.get(l_ref)
        r_keys, r_vals = ray.get(r_ref)
        lv = t.column("left").to_numpy(zero_copy_only=False)
        rv = t.column("right").to_numpy(zero_copy_only=False)
        li = np.searchsorted(l_keys, lv)
        ri = np.searchsorted(r_keys, rv)
        # every surviving pair's keys must be present (the prune is
        # exact by construction); verify rather than trust searchsorted
        if len(lv) and (not (l_keys[np.minimum(li, len(l_keys) - 1)] == lv).all()
                        or not (r_keys[np.minimum(ri, len(r_keys) - 1)] == rv).all()):
            raise AssertionError("pruned marginal missing a surviving key")
        cl = l_vals[li]
        cr = r_vals[ri]
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(c * float(total) / (cl.astype(np.float64) * cr))
        return t.append_column("pmi", pa.array(pmi, pa.float64()))

    return counts.map_batches(score, batch_format="pyarrow")
