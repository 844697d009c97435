"""Blocked fuzzy matching (record linkage / near-dup verification).

The classic two-stage record-linkage pipeline over a Ray Dataset:

1. BLOCKING — a cheap deterministic key (here: the first ``block_chars``
   code points of the text) so only same-block rows are ever compared.
   One bucketed shuffle moves (block, id, cmp-prefix) triples — never
   whole documents — and each hash bucket holds many blocks, so the
   per-bucket callback runs once per bucket, not once per block.
2. VERIFICATION — exact Levenshtein distance over the first
   ``cmp_chars`` code points of each same-block pair, keeping pairs
   with ``dist <= max_dist``.

This is the exact-verify counterpart to the probabilistic candidate
generators in stages/dedup.py (MinHash/SimHash/embedding LSH): those
scale candidate generation, this verifies candidates that a
SQL-expressible blocking key can reach — which is what makes the whole
operator DuckDB-oracle-checkable (``levenshtein()`` + a self-join on
``substr``).

100 TB design notes:
* pairs are quadratic IN THE BLOCK, so ``max_block`` caps degenerate
  blocks (boilerplate prefixes); oversized blocks are dropped with a
  ``warnings.warn`` so the recall loss is visible, the same contract as
  simhash_pairs ``max_bucket``;
* the Levenshtein DP is banded: rows where ``|len_a - len_b| >
  max_dist`` short-circuit, and the row loop aborts as soon as the
  whole DP row exceeds ``max_dist`` — O(cmp_chars * max_dist) per pair
  in practice, not O(cmp_chars^2);
* each DP row is vectorized numpy: substitution/deletion are pure
  vector ops and the insertion scan uses the
  ``min_{k<=j}(cur[k] - k) + j`` prefix-minimum identity, so there is
  no per-character Python loop over the second string.
"""

from __future__ import annotations

import warnings
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _units(s: str, unit: str) -> np.ndarray:
    if unit == "byte":
        # DuckDB's levenshtein edits UTF-8 BYTES ('é' counts as 2)
        return np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    # utf-32-le = one uint32 per code point, zero-copy into numpy
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def levenshtein(a: str, b: str, max_dist: int | None = None,
                unit: str = "byte") -> int:
    """Exact Levenshtein distance with unit insert/delete/substitute
    costs.  ``unit="byte"`` (default) edits the UTF-8 byte stream —
    the semantics of DuckDB's ``levenshtein``, which the oracle relies
    on (on pure-ASCII text the two units agree); ``unit="codepoint"``
    edits Unicode code points (the usual linguistic definition).

    With ``max_dist`` the DP early-exits once the distance provably
    exceeds it, returning ``max_dist + 1`` (a sentinel, not the true
    distance)."""
    if a == b:
        return 0
    ca, cb = _units(a, unit), _units(b, unit)
    if len(ca) > len(cb):          # iterate over the shorter string
        ca, cb = cb, ca
    if len(ca) == 0:
        d = len(cb)
        return d if max_dist is None or d <= max_dist else max_dist + 1
    if max_dist is not None and len(cb) - len(ca) > max_dist:
        return max_dist + 1
    n = len(cb)
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(n + 1, dtype=np.int64)
    for i, ch in enumerate(ca):
        # substitution / deletion are elementwise over the prev row
        cur[0] = i + 1
        np.minimum(prev[1:] + 1, prev[:-1] + (cb != ch), out=cur[1:])
        # insertion closure: min over k<=j of cur[k] + (j-k)
        #                  = prefix-min of (cur - idx), plus idx
        np.minimum(cur, np.minimum.accumulate(cur - idx) + idx, out=cur)
        if max_dist is not None and cur.min() > max_dist:
            return max_dist + 1
        prev, cur = cur, prev
    d = int(prev[-1])
    return d if max_dist is None or d <= max_dist else max_dist + 1


def _verify_block_pairs(df: pd.DataFrame, id_col: str, max_dist: int,
                        max_block: int, unit: str = "byte") -> pd.DataFrame:
    """Vectorized-across-blocks pair generation + per-pair banded DP.
    ``df`` holds MANY blocks (one hash bucket); runs once per bucket."""
    out_a, out_b, out_d = [], [], []
    for blk, g in df.groupby("__blk", sort=False):
        m = len(g)
        if m < 2:
            continue
        if m > max_block:
            warnings.warn(
                f"blocked_levenshtein_pairs: dropping block of {m} rows "
                f"(> max_block={max_block}); prefix {blk[:40]!r}")
            continue
        ids = g[id_col].to_numpy()
        texts = g["__s"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, texts = ids[order], texts[order]
        for i in range(m - 1):
            for j in range(i + 1, m):
                d = levenshtein(texts[i], texts[j], max_dist=max_dist,
                                unit=unit)
                if d <= max_dist:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_d.append(d)
    # id dtype follows the input id column (string/uuid ids work too)
    id_dtype = df[id_col].dtype
    return pd.DataFrame({"id_a": pd.Series(out_a, dtype=id_dtype),
                         "id_b": pd.Series(out_b, dtype=id_dtype),
                         "dist": pd.Series(out_d, dtype="int64")})


def blocked_levenshtein_pairs(ds, id_col: str = "doc_id",
                              text_col: str = "text",
                              block_chars: int = 16, cmp_chars: int = 200,
                              max_dist: int = 20, n_buckets: int = 32,
                              max_block: int = 256, unit: str = "byte"):
    """Same-block pairs (id_a < id_b) whose first-``cmp_chars``
    Levenshtein distance is <= ``max_dist``.

    Returns a Dataset with columns id_a, id_b, dist.  Rows with NULL
    text never match (SQL join semantics).  A SQL oracle must mirror
    the ``max_block`` cap (exclude blocks with more members) and use
    byte-unit distances (DuckDB's levenshtein) — the defaults here."""
    from .aggregate import bucketed_group_transform

    def project(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        keep = pc.is_valid(txt)
        t = t.filter(keep)
        txt = t.column(text_col)
        return pa.table({
            id_col: t.column(id_col),
            "__blk": pc.utf8_slice_codeunits(txt, 0, block_chars),
            "__s": pc.utf8_slice_codeunits(txt, 0, cmp_chars),
        })

    slim = ds.map_batches(project, batch_format="pyarrow")
    return bucketed_group_transform(
        slim, ["__blk"],
        lambda df: _verify_block_pairs(df, id_col, max_dist, max_block,
                                       unit),
        n_buckets=n_buckets)


def fellegi_sunter_weights(params: dict) -> dict:
    """Per-field (agree_weight, disagree_weight) = (ln(m/u),
    ln((1-m)/(1-u))) from the Fellegi-Sunter m/u probabilities
    (Fellegi & Sunter 1969; the classical record-linkage decision
    model).  Computed ONCE here so both the engine and a SQL oracle
    embed the identical float64 constants — no per-row libm, no
    cross-engine ln() drift."""
    import math

    out = {}
    for f, (m, u) in params.items():
        if not (0 < u < m < 1):
            raise ValueError(f"need 0 < u < m < 1 for field {f!r}: "
                             f"m={m}, u={u}")
        out[f] = (math.log(m / u), math.log((1 - m) / (1 - u)))
    return out


def fellegi_sunter_scores(pairs_ds, params: dict, threshold: float,
                          suffix_a: str = "_a", suffix_b: str = "_b"):
    """Score candidate record pairs with the Fellegi-Sunter sum of
    log-likelihood weights: per field f (columns ``f{suffix_a}`` /
    ``f{suffix_b}``), agreement adds ln(m/u), disagreement adds
    ln((1-m)/(1-u)), and a NULL on either side adds 0 (missing data is
    no evidence).  ``match`` = score >= threshold.  Map-only zero
    shuffle — candidate generation (blocking) is upstream
    (blocked_levenshtein_pairs or any join).  Weights are precomputed
    constants summed in FIXED field order, so the score replays
    bit-for-bit in SQL with the same embedded literals."""
    ws = fellegi_sunter_weights(params)
    fields = list(params)

    def score(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = np.zeros(n, dtype=np.float64)
        for f in fields:
            a = t.column(f + suffix_a)
            b = t.column(f + suffix_b)
            both = pc.and_(pc.is_valid(a), pc.is_valid(b)) \
                .to_numpy(zero_copy_only=False)
            agree = pc.fill_null(pc.equal(a, b), False) \
                .to_numpy(zero_copy_only=False)
            wa, wd = ws[f]
            s = s + np.where(both, np.where(agree, wa, wd), 0.0)
        t = t.append_column("score", pa.array(s, pa.float64()))
        return t.append_column("match",
                               pa.array(s >= threshold, pa.bool_()))

    return pairs_ds.map_batches(score, batch_format="pyarrow")
