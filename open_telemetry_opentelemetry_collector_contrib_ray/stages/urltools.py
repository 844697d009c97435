"""URL canonicalization for web-corpus pipelines (CC/C4-style).

Common-Crawl-derived pipelines (C4, RefinedWeb, FineWeb) dedup by URL
after canonicalizing it: lowercase scheme+authority, drop the fragment,
strip tracking parameters (utm_*, fbclid, gclid), strip default ports,
strip the trailing slash.  The reference ships a URL *parser* (OTTL
`URL` converter — functions/registry.py, ref
pkg/ottl/ottlfuncs/func_url.go); this stage is the corpus-side
*normalizer* that feeds exact dedup / host-level aggregation.

Map-only, pure RE2 kernel chain (`pc.replace_substring_regex` with
backref rewrites) — identical semantics under the DuckDB oracle (both
RE2 engines), zero shuffle at 100 TB.  RE2 has no lookahead, so the
port strip uses a captured delimiter instead.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# applied in order; each is (pattern, rewrite)
_CHAIN: list[tuple[str, str]] = [
    (r"#.*$", ""),                                   # fragment
    (r"(utm_[a-z0-9_]*|fbclid|gclid)=[^&#]*&?", ""),  # tracking params
    (r"[?&]$", ""),                                  # dangling ? / &
    (r"\?&", "?"),                                   # ?&id=1 -> ?id=1
]
_PREFIX_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_PORT_CHAIN: list[tuple[str, str]] = [
    (r"^(http://[^/?#:]*):80([/?#]|$)", r"\1\2"),
    (r"^(https://[^/?#:]*):443([/?#]|$)", r"\1\2"),
]
_TRAIL = (r"/$", "")
_HOST_PAT = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#:]*)"


class UrlNormalizer:
    """map_batches stage: append `<url_col>_norm` and `host` columns."""

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        u0 = pc.fill_null(batch.column(self.url_col), "")
        u = u0
        for pat, rep in _CHAIN:
            u = pc.replace_substring_regex(u, pat, rep)
        # lowercase ONLY scheme://authority, keep path/query case:
        # pre = the whole string collapsed to its prefix match, rest =
        # the string with the prefix removed; rows without a scheme
        # keep their cleaned value unchanged via the match mask
        has_scheme = pc.match_substring_regex(u, _PREFIX_PAT)
        pre = pc.replace_substring_regex(u, f"({_PREFIX_PAT})(?s:.*)",
                                         r"\1")
        rest = pc.replace_substring_regex(u, _PREFIX_PAT, "")
        lowered = pc.binary_join_element_wise(pc.utf8_lower(pre), rest,
                                              pa.scalar(""))
        u = pc.if_else(has_scheme, lowered, u)
        for pat, rep in _PORT_CHAIN:
            u = pc.replace_substring_regex(u, pat, rep)
        u = pc.replace_substring_regex(u, *_TRAIL)
        host = pc.struct_field(pc.extract_regex(u, _HOST_PAT), "host")
        host = pc.fill_null(host, "")
        out = batch.append_column(f"{self.url_col}_norm", u)
        return out.append_column("host", host)


def normalize_urls(ds, url_col: str = "url"):
    """Dataset-level URL canonicalization; see UrlNormalizer."""
    return ds.map_batches(UrlNormalizer(url_col), batch_format="pyarrow")
