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
kilobyte partials, and PMI attaches map-side from broadcast marginal
dicts (vocabulary-sized, the token_df contract).  ``min_count`` prunes
the OUTPUT only — marginals are computed over the full pair population
first, matching the SQL definition.
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


def collocations(ds, text_col: str = "text", id_col: str = "doc_id",
                 window: int = 3, min_count: int = 2,
                 n_buckets: int = 32):
    """Mine windowed collocations (see module docstring).  Returns a
    Dataset of ``left, right, c, pmi`` for pairs with ``c >=
    min_count`` (marginals over the full pair population)."""
    from .aggregate import grouped_agg

    counts = grouped_agg(
        ds.map_batches(
            lambda t: _pair_partials(t, text_col, id_col, window),
            batch_format="pyarrow"),
        ["left", "right"], [("sum", "c", "c")], combine="bucket",
        n_buckets=n_buckets).materialize()

    lm = counts.groupby("left").sum("c").to_pandas()
    rm = counts.groupby("right").sum("c").to_pandas()
    total = int(lm["sum(c)"].sum())
    l_keys = lm["left"].to_numpy()
    l_vals = lm["sum(c)"].to_numpy().astype(np.int64)
    l_order = np.argsort(l_keys)
    r_keys = rm["right"].to_numpy()
    r_vals = rm["sum(c)"].to_numpy().astype(np.int64)
    r_order = np.argsort(r_keys)

    def score(t: pa.Table) -> pa.Table:
        if min_count > 1:
            t = t.filter(pa.compute.greater_equal(
                t.column("c"), pa.scalar(min_count, pa.int64())))
        lv = t.column("left").to_numpy(zero_copy_only=False)
        rv = t.column("right").to_numpy(zero_copy_only=False)
        cl = l_vals[l_order[np.searchsorted(l_keys[l_order], lv)]]
        cr = r_vals[r_order[np.searchsorted(r_keys[r_order], rv)]]
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(c * float(total) / (cl.astype(np.float64) * cr))
        return t.append_column("pmi", pa.array(pmi, pa.float64()))

    return counts.map_batches(score, batch_format="pyarrow")
