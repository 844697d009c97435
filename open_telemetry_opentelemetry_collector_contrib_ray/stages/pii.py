"""PII detection and scrubbing for training corpora.

The reference's redactionprocessor masks attribute values by blocklist
regex (/root/reference/processor/redactionprocessor/config.go:10-31 —
mirrored in stages/enrich.py RedactionStage); a training-data pipeline
needs the same operation on the DOCUMENT BODY with the standard PII
categories (the C4 / Dolma / FineWeb anonymization recipe): emails,
phone numbers, IP addresses, SSNs.

Pure map-only vectorized stage: one `pc.replace_substring_regex` +
`pc.count_substring_regex` pair per category, applied sequentially
(counts reflect the progressively-scrubbed text, so a span consumed by
an earlier category is never double-counted).  All patterns are RE2
syntax — identical semantics under pyarrow.compute and the DuckDB
oracle (both are RE2 engines).  No Python row loop, no shuffle: the
100 TB cost is one pass of C++ regex kernels.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# order matters: earlier categories consume their spans first (an SSN
# never re-counts as a phone, an email's host part never as a domain)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


class PiiScrubber:
    """map_batches stage: scrub PII categories from `text_col`, append
    one int64 `n_<category>` count column per category."""

    def __init__(self, text_col: str = "text",
                 categories: list[str] | None = None,
                 count_cols: bool = True):
        wanted = set(categories) if categories is not None else None
        self.patterns = [(n, p, r) for n, p, r in PII_PATTERNS
                         if wanted is None or n in wanted]
        if wanted is not None and len(self.patterns) != len(wanted):
            unknown = wanted - {n for n, _, _ in PII_PATTERNS}
            raise KeyError(f"unknown PII categories: {sorted(unknown)}")
        self.text_col = text_col
        self.count_cols = count_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        counts = {}
        for name, pat, rep in self.patterns:
            if self.count_cols:
                counts[name] = pc.count_substring_regex(col, pat).cast(pa.int64())
            col = pc.replace_substring_regex(col, pat, rep)
        idx = batch.column_names.index(self.text_col)
        out = batch.set_column(idx, self.text_col, col)
        for name, c in counts.items():
            out = out.append_column(f"n_{name}", c)
        return out


def scrub_pii(ds, text_col: str = "text",
              categories: list[str] | None = None, count_cols: bool = True):
    """Dataset-level PII scrub; see PiiScrubber."""
    return ds.map_batches(
        PiiScrubber(text_col, categories, count_cols), batch_format="pyarrow")
