"""IPv4 parsing + CIDR longest-prefix-match enrichment.

The geoip/network-zone lookup shape the reference collector ships as
`geoipprocessor` (and k8sattributes' pod-CIDR mapping): attach a label
to every record whose IP falls inside a routing-table prefix, with the
LONGEST matching prefix winning (real routing semantics, so overlapping
prefixes like 10.0.0.0/8 vs 10.1.0.0/16 resolve deterministically).

Ray-Data-first shape: the prefix table is tiny (thousands of rows) and
broadcasts once; the per-batch kernel is pure numpy — dotted-quad parse
is a vectorized split + digit fold, and LPM over a batch is at most 32
``searchsorted`` probes (one per distinct prefix length, longest
first), each over the sorted network array of that length.  No per-row
Python, no shuffle, map-only — the same broadcast-lookup contract as
stages/enrich.py LookupEnricher but over RANGES instead of exact keys.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def ipv4_to_u32(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized dotted-quad -> uint32 (as int64 numpy).  Invalid
    strings (wrong part count, non-digits, octet > 255, nulls) map to
    -1 — callers treat them as matching nothing."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    parts = pc.split_pattern(pc.cast(arr, pa.string()), ".")
    lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    ok = ~arr.is_null().to_numpy(zero_copy_only=False) & (lens == 4)
    out = np.full(n, -1, dtype=np.int64)
    if not ok.any():
        return out
    # flatten only the 4-part rows, fold digits without Python loops
    sel = pc.list_flatten(parts.filter(pa.array(ok)))
    octs = pc.cast(pc.if_else(pc.match_substring_regex(sel, r"^\d{1,3}$"),
                              sel, None), pa.int64(), safe=False)
    o = octs.to_numpy(zero_copy_only=False).reshape(-1, 4)
    valid = ~np.isnan(o).any(axis=1)
    o = np.nan_to_num(o, nan=0).astype(np.int64)
    valid &= (o <= 255).all(axis=1)
    ip = (o[:, 0] << 24) | (o[:, 1] << 16) | (o[:, 2] << 8) | o[:, 3]
    ip[~valid] = -1
    out[ok] = ip
    return out


class CidrTable:
    """Sorted per-prefix-length network arrays for vectorized LPM."""

    def __init__(self, cidrs: Sequence[tuple[str, str]]):
        self.labels: list[str] = []
        by_len: dict[int, list[tuple[int, int]]] = {}
        for cidr, label in cidrs:
            net_s, len_s = cidr.split("/")
            plen = int(len_s)
            if not 1 <= plen <= 32:
                raise ValueError(f"prefix length out of range: {cidr}")
            net = ipv4_to_u32(pa.array([net_s], pa.string()))[0]
            if net < 0:
                raise ValueError(f"bad network address: {cidr}")
            self.labels.append(label)
            by_len.setdefault(plen, []).append(
                (int(net) >> (32 - plen), len(self.labels) - 1))
        # longest first; duplicate networks at one length: first wins
        self.levels = []
        for plen in sorted(by_len, reverse=True):
            seen: dict[int, int] = {}
            for key, idx in by_len[plen]:
                seen.setdefault(key, idx)
            keys = np.array(sorted(seen), dtype=np.int64)
            lbl = np.array([seen[k] for k in keys], dtype=np.int64)
            self.levels.append((plen, keys, lbl))

    def lookup(self, ip: np.ndarray) -> np.ndarray:
        """Label INDEX per ip (-1 = no match; negative ips never match).
        At most one searchsorted per distinct prefix length, longest
        first, probing only still-unmatched rows."""
        out = np.full(len(ip), -1, dtype=np.int64)
        todo = ip >= 0
        for plen, keys, lbl in self.levels:
            if not todo.any():
                break
            idx = np.flatnonzero(todo)
            key = ip[idx] >> (32 - plen)
            pos = np.searchsorted(keys, key)
            hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)]
                                       == key)
            out[idx[hit]] = lbl[pos[hit]]
            todo[idx[hit]] = False
        return out


def cidr_enrich(ds, ip_col: str, cidrs: Sequence[tuple[str, str]],
                out_col: str = "net_label", default: str = "other"):
    """Append the longest-prefix-match label of ``ip_col`` (dotted-quad
    strings) — map-only; the table builds once per task from the tiny
    cidr list (broadcast-by-closure; use ray.put for 100k+ prefixes)."""
    table = CidrTable(cidrs)
    label_arr = np.array(table.labels + [default], dtype=object)

    def enrich(t: pa.Table) -> pa.Table:
        ip = ipv4_to_u32(t.column(ip_col))
        idx = table.lookup(ip)
        idx[idx < 0] = len(label_arr) - 1
        return t.append_column(out_col, pa.array(label_arr[idx].tolist(),
                                                 pa.string()))

    return ds.map_batches(enrich, batch_format="pyarrow")
