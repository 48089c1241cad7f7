"""Z-order (Morton) keys: multi-column data clustering for file pruning.

``write_clustered_parquet`` (sources/sinks.py) gives 1-D clustering —
range-partition + sort on ONE key yields disjoint per-file min/max for
that key only. Predicates on a second high-cardinality column still scan
every file. Interleaving the bits of k normalized columns into one Morton
key and clustering on THAT bounds every file to a small k-D tile, so
footer min/max stats prune files for predicates on ANY of the interleaved
columns — the technique lakehouse formats ship as ``OPTIMIZE ZORDER BY``.

The interleave is plain integer bit arithmetic, generated identically for
Spark (``shiftleft``/``shiftright``/``&``/``|``) and DuckDB
(``<<``/``>>``/``&``/``|``) so a z-key computation can be value-checked
by the oracle gate like any other expression.

Normalization: callers map each column into ``[0, 2**bits)`` first (the
helpers truncate with ``& (2**bits - 1)`` as a safety net). For skewed
domains use a rank/percentile bucketing upstream; equal-width truncation
is the cheap default.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton key of k non-negative integer columns, ``bits`` bits each
    (key width = k·bits ≤ 63). Bit b of column i lands at position
    ``b·k + i``."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(
            f"z-key width {k}*{bits} exceeds a signed 64-bit long; "
            "lower bits or interleave fewer columns"
        )
    mask = (1 << bits) - 1
    terms: list[Column] = []
    for i, c in enumerate(cols):
        c = c.cast("long").bitwiseAND(F.lit(mask))
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i
                )
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms).alias("z")


def zorder_key_sql(exprs: list[str], bits: int = 8) -> str:
    """DuckDB SQL text computing the identical Morton key over the given
    integer expressions."""
    k = len(exprs)
    mask = (1 << bits) - 1
    terms = []
    for i, e in enumerate(exprs):
        masked = f"(({e}) & {mask})"
        for b in range(bits):
            terms.append(f"((({masked} >> {b}) & 1) << {b * k + i})")
    return "(" + " | ".join(terms) + ")"
