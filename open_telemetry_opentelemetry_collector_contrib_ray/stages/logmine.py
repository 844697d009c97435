"""Log template mining — Drain-style constant/variable splitting.

Log analytics backends (and the collector deployments that feed them)
cluster raw log lines into TEMPLATES: the constant skeleton of the
format string with the variable fields masked out ("user 4711 logged
in from 10.0.0.3" -> "user <*> logged in from <*>").  The reference
ships the building blocks — regex parsers
(/root/reference/pkg/stanza/operator/parser/regex/parser.go) and the
logdedup processor that counts identical bodies
(/root/reference/processor/logdeduplicationprocessor/) — but template
mining is the missing composition: dedup AFTER masking, so lines that
differ only in their variable fields collapse into one pattern.  This
is the published log-parsing recipe (Drain, He 2017: fixed-depth
token-prefix clustering; masking digits/hex/uuids first is the
standard preprocessing all Drain implementations apply — and on
machine-generated logs the masking step alone recovers the format
string for the overwhelming majority of lines).

Pipeline shape (100 TB-safe):

1. MASK — map-only chain of RE2 kernels (`pc.replace_substring_regex`)
   over the raw line: uuid -> hex -> any-token-containing-a-digit ->
   whitespace collapse.  Zero shuffle, C++ regex cost only.  All
   patterns are RE2 syntax, so the DuckDB oracle replays the identical
   chain (`mask_sql_expr` emits it — single source of truth).
2. COUNT — `grouped_agg(combine="bucket")` on the template string:
   per-batch pyarrow group_by partials (one row per template per
   batch), ONE bucketed exchange of those partials, vectorized merge.
   What shuffles is the distinct-template partials — the corpus text
   never moves.  Template cardinality on real logs is ~1e2..1e5
   (that's the point of mining), so the exchange is metadata-sized.
3. PRUNE — `min_count` drops rare templates map-side after the merge.

Each template row carries `n` (line count) and the smallest id as a
deterministic example pointer back into the corpus.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import grouped_agg

# order matters: structured ids are masked before the generic
# digit-token rule so a uuid collapses to ONE <*>, not four fragments.
# RE2-only syntax — pyarrow.compute and DuckDB replay identically.
MASK_PATTERNS: list[tuple[str, str, str]] = [
    ("uuid", r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
             r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}", "<*>"),
    ("hex", r"0x[0-9a-fA-F]+", "<*>"),
    ("num", r"\S*[0-9]\S*", "<*>"),
]
_WS = r"[ \t\r\n]+"


def mask_line(col: pa.ChunkedArray | pa.Array,
              patterns: Sequence[tuple[str, str, str]] = MASK_PATTERNS):
    """Apply the masking chain to a string column: variable fields ->
    '<*>', whitespace runs -> one space, edges trimmed."""
    for _, pat, rep in patterns:
        col = pc.replace_substring_regex(col, pat, rep)
    col = pc.replace_substring_regex(col, _WS, " ")
    col = pc.replace_substring_regex(col, r"^ | $", "")
    return col


def mask_sql_expr(col_expr: str,
                  patterns: Sequence[tuple[str, str, str]] = MASK_PATTERNS
                  ) -> str:
    """The identical masking chain as a DuckDB expression (RE2 both
    sides) — the oracle's single source of truth."""
    e = col_expr
    for _, pat, rep in patterns:
        p = pat.replace("'", "''")
        e = f"regexp_replace({e}, '{p}', '{rep}', 'g')"
    e = f"regexp_replace({e}, '{_WS}', ' ', 'g')"
    return f"regexp_replace({e}, '^ | $', '', 'g')"


def mine_templates(ds, line_col: str, id_col: str | None = None,
                   patterns: Sequence[tuple[str, str, str]] = MASK_PATTERNS,
                   min_count: int = 1, n_buckets: int = 64):
    """Mine log templates from a Dataset of raw lines.

    Returns one row per template: ``template`` (the masked skeleton),
    ``n`` (how many lines matched) and — when ``id_col`` is given —
    ``example_id`` (the smallest id of a matching line, a deterministic
    pointer to a concrete example).  Templates seen fewer than
    ``min_count`` times are dropped.
    """

    def mask(t: pa.Table) -> pa.Table:
        cols = {"template": mask_line(t.column(line_col), patterns)}
        if id_col is not None:
            cols[id_col] = t.column(id_col)
        return pa.table(cols)

    masked = ds.map_batches(mask, batch_format="pyarrow")
    specs = [("count", None, "n")]
    if id_col is not None:
        specs.append(("min", id_col, "example_id"))
    out = grouped_agg(masked, ["template"], specs, combine="bucket",
                      n_buckets=n_buckets)
    if min_count > 1:
        out = out.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n"),
                                                pa.scalar(min_count,
                                                          pa.int64()))),
            batch_format="pyarrow")
    return out


def template_novelty(baseline, current, line_col: str,
                     id_col: str | None = None,
                     patterns: Sequence[tuple[str, str, str]] = MASK_PATTERNS,
                     min_count: int = 1, n_buckets: int = 16):
    """New-template detection — the log-anomaly primitive: mine the
    template set of a BASELINE window and of a CURRENT window, and
    return the current templates (with counts/example pointers) whose
    skeleton never occurred in the baseline.  A new template after a
    deploy is the classic "new kind of error" signal that per-line
    filters cannot express (the line is new precisely because no rule
    matches it).

    Both inputs collapse to metadata-sized template tables map-side
    (the corpus text never shuffles — see mine_templates); the anti
    join then runs over template strings only, via the bucketed hash
    join's NOT EXISTS path."""
    from .join import bucketed_hash_join

    base = mine_templates(baseline, line_col, patterns=patterns,
                          n_buckets=n_buckets)
    cur = mine_templates(current, line_col, id_col=id_col,
                         patterns=patterns, min_count=min_count,
                         n_buckets=n_buckets)
    return bucketed_hash_join(cur, base.select_columns(["template"]),
                              ["template"], how="anti",
                              n_buckets=n_buckets)
