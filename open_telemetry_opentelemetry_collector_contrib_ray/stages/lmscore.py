"""Quantized n-gram language-model familiarity scoring (CCNet-style).

CCNet (Wenzek et al. 2020) and the GPT-3/LLaMA data recipes score web
documents with an n-gram language model and filter on the score.  A
real KenLM isn't in this container, and float log-probs would never
hash-match a SQL oracle anyway — so this stage implements the same
pipeline shape with an INTEGER-EXACT quantized model:

* model  = corpus-wide n-gram counts (min_count-pruned, top_v-capped);
* score(doc) = sum over its n-grams of floor(log2(1 + count(gram))) —
  a monotone quantized log-likelihood, bit-stable across numpy and SQL
  (`length(bin(c+1)) - 1`).

Ray-Data-first shape:
* BUILD: map-only window hashing (the exact `WindowEmitter` machinery
  from stages/substringdedup.py — model build and scoring share one
  hash by construction) -> per-batch partial counts (np.unique) -> ONE
  small groupby over (hash, partial) pairs, never raw windows;
* the pruned model broadcasts once via `ray.put` as two sorted numpy
  arrays (the stages/decontam.py searchsorted idiom); `top_v` bounds
  broadcast and driver memory at 100 TB — raise `min_count` / lower
  `top_v` for bigger corpora, the score degrades gracefully (rare
  grams quantize to 0 bits anyway);
* SCORE: map-only searchsorted probe + one bincount per batch.  Zero
  text ever shuffles; the only exchange is the kilobyte count combine.

Hash collisions can only INFLATE a score (two grams sharing a 64-bit
hash pool their counts); expected corpus-wide collisions ~n_grams^2 /
2^65 — negligible below ~10^9 distinct grams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .substringdedup import WindowEmitter


def _bits(counts: np.ndarray) -> np.ndarray:
    """floor(log2(1 + c)) exactly for int64 c >= 0 (frexp exponent —
    exact while 1 + c is exactly representable, i.e. c < 2^53)."""
    return (np.frexp(counts.astype(np.float64) + 1.0)[1] - 1).astype(np.int64)


def _probe_scores(hs: np.ndarray, bits: np.ndarray, win_row: np.ndarray,
                  shv: np.ndarray, n: int) -> np.ndarray:
    """Shared model probe: per-doc sum of `bits` over the window hashes
    present in the sorted model `hs` (absent grams contribute 0)."""
    if len(win_row) == 0 or len(hs) == 0:
        return np.zeros(n)
    idx = np.searchsorted(hs, shv)
    idx[idx == len(hs)] = 0
    found = hs[idx] == shv
    w = np.zeros(len(shv), dtype=np.float64)
    w[found] = bits[idx[found]]
    return np.bincount(win_row, weights=w, minlength=n)


def build_ngram_model(ds, n: int = 2, min_count: int = 2,
                      top_v: int = 5_000_000, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Count corpus n-grams and broadcast the pruned model.

    Returns (model_ref, vocab_size): `model_ref` is a ray.put handle to
    (sorted int64 hash views, int64 counts)."""
    import ray

    wins = ds.map_batches(
        WindowEmitter, fn_constructor_kwargs=dict(
            w=n, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", batch_size=8192, concurrency=(1, 24))

    def partial(t: pa.Table) -> pa.Table:
        h = np.asarray(t.column("h"), dtype=np.uint64)
        uh, uc = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uh.view(np.int64)),
                         "c": pa.array(uc.astype(np.int64))})

    # NOTE: an A/B against grouped_agg(combine="bucket") at sf0.1 read
    # 3.0s (this) vs 3.4-4.0s — the per-batch np.unique partial already
    # collapses most mass, so the sort-based combine over the residue
    # wins; keep Dataset.groupby here.
    totals = wins.map_batches(partial, batch_format="pyarrow") \
        .groupby("h").sum("c")

    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.rename_columns(["h", "c"])
        return t.filter(pc.greater_equal(t.column("c"), min_count))

    totals = totals.map_batches(prune, batch_format="pyarrow").materialize()
    if top_v is not None and totals.count() > top_v:
        # only pay the sort shuffle when the cap actually binds
        totals = totals.sort("c", descending=True).limit(top_v)
    parts = [ray.get(r) for r in totals.to_arrow_refs()]
    tbl = pa.concat_tables([p for p in parts if p.num_rows] or
                           [pa.table({"h": pa.array([], pa.int64()),
                                      "c": pa.array([], pa.int64())})])
    hs = np.asarray(tbl.column("h"), dtype=np.int64)
    cs = np.asarray(tbl.column("c"), dtype=np.int64)
    order = np.argsort(hs, kind="stable")
    hs, cs = np.ascontiguousarray(hs[order]), np.ascontiguousarray(cs[order])
    return ray.put((hs, cs)), len(hs)


class NgramScorer:
    """map_batches stage: append int64 `n_ngrams` and `lm_score`.

    `lm_score` = sum of floor(log2(1 + model_count)) over the doc's
    n-grams (0 for grams absent from the pruned model)."""

    def __init__(self, model_ref, n: int = 2, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        self.hs, cs = (ray.get(model_ref)
                       if not isinstance(model_ref, tuple) else model_ref)
        self.bits = _bits(cs)
        self.emitter = WindowEmitter(w=n, id_col=id_col, text_col=text_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        win_row, _, sh = self.emitter.windows(batch)
        shv = sh.view(np.int64)
        score = _probe_scores(self.hs, self.bits, win_row, shv, n)
        grams = np.bincount(win_row, minlength=n) if len(win_row) \
            else np.zeros(n, dtype=np.int64)
        out = batch.append_column("n_ngrams",
                                  pa.array(grams.astype(np.int64)))
        return out.append_column("lm_score",
                                 pa.array(score.astype(np.int64)))


def build_dual_ngram_models(ds, target_mask, n: int = 2, min_count: int = 2,
                            top_v: int = 5_000_000, id_col: str = "doc_id",
                            text_col: str = "text"):
    """Single-pass twin of two `build_ngram_model` calls for the common
    DSIR case where the target distribution is a SUBSET of the corpus
    (target_mask: callable(batch) -> per-row bool).  Each batch emits
    (hash, count_all, count_target) partials, so the corpus tokenizes
    and hashes ONCE instead of twice; one small groupby combines both
    models.  Returns (target_ref, raw_ref) ray.put handles shaped
    exactly like build_ngram_model's."""
    import ray

    class DualCounter:
        def __init__(self):
            self.em = WindowEmitter(w=n, id_col=id_col, text_col=text_col)

        def __call__(self, t: pa.Table) -> pa.Table:
            win_row, _, sh = self.em.windows(t)
            if len(win_row) == 0:
                return pa.table({"h": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64()),
                                 "ct": pa.array([], pa.int64())})
            tm = np.asarray(target_mask(t), dtype=bool)
            uh, inv = np.unique(sh, return_inverse=True)
            c_all = np.bincount(inv, minlength=len(uh))
            c_t = np.bincount(inv, weights=tm[win_row].astype(np.float64),
                              minlength=len(uh)).astype(np.int64)
            return pa.table({"h": pa.array(uh.view(np.int64)),
                             "c": pa.array(c_all.astype(np.int64)),
                             "ct": pa.array(c_t)})

    totals = ds.map_batches(DualCounter, batch_format="pyarrow",
                            batch_size=8192, concurrency=(1, 24)) \
        .groupby("h").sum(["c", "ct"]) \
        .map_batches(lambda t: t.rename_columns(["h", "c", "ct"]),
                     batch_format="pyarrow")

    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.or_(pc.greater_equal(t.column("c"), min_count),
                      pc.greater_equal(t.column("ct"), min_count))
        return t.filter(keep)

    pruned = totals.map_batches(prune, batch_format="pyarrow").materialize()
    parts = [ray.get(r) for r in pruned.to_arrow_refs()]
    tbl = pa.concat_tables([p for p in parts if p.num_rows] or
                           [pa.table({"h": pa.array([], pa.int64()),
                                      "c": pa.array([], pa.int64()),
                                      "ct": pa.array([], pa.int64())})])
    hs = np.asarray(tbl.column("h"), dtype=np.int64)
    refs = []
    for col in ("ct", "c"):        # target first, then raw
        cs = np.asarray(tbl.column(col), dtype=np.int64)
        m = cs >= min_count
        h2, c2 = hs[m], cs[m]
        if top_v is not None and len(h2) > top_v:
            keep = np.argpartition(c2, -top_v)[-top_v:]
            h2, c2 = h2[keep], c2[keep]
        order = np.argsort(h2, kind="stable")
        refs.append(ray.put((np.ascontiguousarray(h2[order]),
                             np.ascontiguousarray(c2[order]))))
    return refs[0], refs[1]


class DualNgramScorer:
    """map_batches stage: score each doc against TWO broadcast n-gram
    models in one pass (windows hashed once, probed twice).  Appends
    int64 `target_score` and `raw_score` — the quantized analogs of
    DSIR's log p_target(doc) and log p_raw(doc)."""

    def __init__(self, target_ref, raw_ref, n: int = 2,
                 id_col: str = "doc_id", text_col: str = "text"):
        import ray

        self.models = []
        for ref in (target_ref, raw_ref):
            hs, cs = ray.get(ref) if not isinstance(ref, tuple) else ref
            self.models.append((hs, _bits(cs)))
        self.emitter = WindowEmitter(w=n, id_col=id_col, text_col=text_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        win_row, _, sh = self.emitter.windows(batch)
        shv = sh.view(np.int64)
        out = batch
        for name, (hs, bits) in zip(("target_score", "raw_score"),
                                    self.models):
            score = _probe_scores(hs, bits, win_row, shv, n)
            out = out.append_column(name, pa.array(score.astype(np.int64)))
        return out


def dsir_select(ds_factory, target_factory, k: int, n: int = 2,
                min_count: int = 2, top_v: int = 5_000_000,
                id_col: str = "doc_id", text_col: str = "text",
                target_mask=None):
    """DSIR-shape data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): rank raw-corpus docs by
    importance = score under a TARGET-distribution n-gram model minus
    score under the RAW-corpus model, keep the top k.

    Integer-exact analog: both models are the quantized bit-count models
    of this module, so importance = target_score - raw_score is an int64
    and the selection is deterministic (ties broken by id) — a SQL
    oracle can replay it exactly.  (Real DSIR adds Gumbel noise for
    sampling without replacement; the deterministic top-k is the
    noise-free limit and the only run-stable choice.)

    Ray shape: two model builds (map-only + kilobyte count combines),
    ONE scoring pass probing both broadcast models per batch, then
    per-batch top-k pre-prune (≤k score rows leave any batch; text
    never shuffles) feeding a tiny global sort+limit.

    When the target is a SUBSET of the corpus, pass `target_mask`
    (callable(batch) -> per-row bool) instead of target_factory: both
    models then build from ONE corpus pass (build_dual_ngram_models) —
    a full tokenize+hash pass saved."""
    if target_mask is not None:
        tref, rref = build_dual_ngram_models(
            ds_factory(), target_mask, n=n, min_count=min_count,
            top_v=top_v, id_col=id_col, text_col=text_col)
    else:
        tref, _ = build_ngram_model(target_factory(), n=n,
                                    min_count=min_count, top_v=top_v,
                                    id_col=id_col, text_col=text_col)
        rref, _ = build_ngram_model(ds_factory(), n=n, min_count=min_count,
                                    top_v=top_v, id_col=id_col,
                                    text_col=text_col)
    scored = ds_factory().map_batches(
        DualNgramScorer, fn_constructor_kwargs=dict(
            target_ref=tref, raw_ref=rref, n=n,
            id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=(1, 24))

    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        imp = pc.subtract(t.column("target_score"), t.column("raw_score"))
        t = pa.table({id_col: t.column(id_col),
                      "target_score": t.column("target_score"),
                      "raw_score": t.column("raw_score"),
                      "importance": imp})
        order = pa.table({"i": imp, "d": t.column(id_col)})
        idx = pc.sort_indices(order, sort_keys=[("i", "descending"),
                                                ("d", "ascending")])
        return t.take(idx[:k])

    pruned = scored.map_batches(prune, batch_format="pyarrow")
    return pruned.sort(["importance", id_col],
                       descending=[True, False]).limit(k)


def lm_familiarity(ds_factory, n: int = 2, min_count: int = 2,
                   top_v: int = 5_000_000, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Build the quantized n-gram model from `ds_factory()` and score
    the same corpus (the CCNet self-scoring setup).  Two passes over
    the input; document text never shuffles."""
    ref, _ = build_ngram_model(ds_factory(), n=n, min_count=min_count,
                               top_v=top_v, id_col=id_col, text_col=text_col)
    return ds_factory().map_batches(
        NgramScorer, fn_constructor_kwargs=dict(
            model_ref=ref, n=n, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=(1, 24))
