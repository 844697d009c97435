"""Brute-force parity properties for line filter / line dedup / LM score.

Reference implementations are straight Python over row lists; the
stages must match them exactly on randomized corpora."""

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
    DEFAULT_DROP_PAT,
    LineFilter,
    dedup_lines,
)

_WORDS = ["alpha", "beta.", "gamma!", "x", "lorem ipsum", "{", "tail?"]


def _line(r):
    return " ".join(r.choice(_WORDS) for _ in range(r.randint(0, 6)))


def _brute_line_filter(text, min_words=3):
    if text is None:
        return None, 0, 0
    lines = text.split("\n")
    drop = re.compile(DEFAULT_DROP_PAT.replace("(?i)", ""), re.I)
    kept = [ln for ln in lines
            if len(re.findall(r"\S+", ln)) >= min_words
            and re.search(r'[.!?"]$', ln)
            and not drop.search(ln)]
    return "\n".join(kept), len(lines), len(kept)


def _brute_dedup_lines(texts):
    seen = set()
    out = []
    for t in texts:
        lines = (t or "").split("\n")
        kept = []
        for ln in lines:
            if ln == "":
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out.append(("\n".join(kept), len(kept)))
    return out


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_line_filter_matches_brute_force(seed):
    import random

    r = random.Random(seed)
    texts = ["\n".join(_line(r) for _ in range(r.randint(1, 5)))
             for _ in range(r.randint(1, 30))]
    texts.append(None)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = LineFilter(min_words=3)(t)
    for i, txt in enumerate(texts):
        exp_text, exp_n, exp_k = _brute_line_filter(txt)
        assert out.column("text")[i].as_py() == exp_text
        if txt is not None:
            assert out.column("n_lines")[i].as_py() == exp_n
            assert out.column("n_lines_kept")[i].as_py() == exp_k


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_dedup_lines_matches_brute_force(seed):
    import random

    r = random.Random(seed)
    # small shared-line pool guarantees heavy cross-doc duplication
    pool = [f"shared line {i}" for i in range(6)] + [""]
    texts = ["\n".join(r.choice(pool) for _ in range(r.randint(1, 6)))
             for _ in range(25)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = dedup_lines(lambda: ray.data.from_arrow(tbl)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _brute_dedup_lines(texts)
    assert list(got["text"]) == [e[0] for e in exp]
    assert list(got["n_lines_kept"]) == [e[1] for e in exp]
