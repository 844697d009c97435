"""Data-layout optimization: z-order (Morton) clustering keys.

The lakehouse ``OPTIMIZE ZORDER BY (a, b)`` primitive: interleave the
bits of two dimension columns so that rows close in BOTH dimensions
get close keys, then range-partition the output on the key — a scan
filtered on either dimension touches a small fraction of files because
every file's min/max envelope is tight in both dimensions at once.

Ray-Data-first shape: the key is a pure map-side Arrow/numpy kernel
(classic bit-spreading magic constants, no per-row Python); the
partition id is the key's TOP bits, so assigning a row to its output
partition needs NO sort and NO shuffle — ``write_parquet(
partition_cols=["zpart"])`` then groups files by partition.  A global
sort would give perfect ordering but costs an all-to-all; top-bits
bucketing gives the same file-pruning envelopes for 1/2^p of the cost,
which is the right trade at 100 TB.

The key construction is exactly replayable in SQL (a 2*bits-term
bit-arithmetic expression), so layout results are oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value to the even bit positions
    of a 32-bit lane (0b...abc -> 0b...0a0b0c) — standard Morton-code
    bit-twiddling (public domain magic constants)."""
    v = v.astype(np.uint32) & np.uint32(0xFFFF)
    v = (v | (v << np.uint32(8))) & np.uint32(0x00FF00FF)
    v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    v = (v | (v << np.uint32(2))) & np.uint32(0x33333333)
    v = (v | (v << np.uint32(1))) & np.uint32(0x55555555)
    return v


def zorder_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit dimensions into one 32-bit Morton key:
    x's bit b lands at position 2b+1, y's at 2b."""
    return ((_spread_bits16(x).astype(np.int64) << 1)
            | _spread_bits16(y).astype(np.int64))


def add_zorder_partition(ds, x_col: str, y_col: str,
                         x_expr=None, y_expr=None,
                         part_bits: int = 4,
                         key_col: str = "zkey", part_col: str = "zpart"):
    """Append the Morton key and its top-bits partition id — map-only.

    x_expr/y_expr: optional numpy callables mapping the raw column to
    the 16-bit dimension (e.g. ``lambda v: np.floor(v * 100)``); the
    low 16 bits are taken after the transform either way.
    """

    def key(t: pa.Table) -> pa.Table:
        xv = t.column(x_col).to_numpy(zero_copy_only=False)
        yv = t.column(y_col).to_numpy(zero_copy_only=False)
        if x_expr is not None:
            xv = x_expr(xv)
        if y_expr is not None:
            yv = y_expr(yv)
        zk = zorder_key(np.asarray(xv, np.int64) & 0xFFFF,
                        np.asarray(yv, np.int64) & 0xFFFF)
        zp = zk >> (32 - part_bits)
        return (t.append_column(key_col, pa.array(zk, pa.int64()))
                 .append_column(part_col, pa.array(zp, pa.int64())))

    return ds.map_batches(key, batch_format="pyarrow")


def zorder_sql_expr(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """The SAME Morton key as ``zorder_key``, as a DuckDB expression —
    x's bit b at position 2b+1, y's at 2b."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_sql} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({y_sql} >> {b}) & 1) << {2 * b})")
    return "(" + " | ".join(terms) + ")"
