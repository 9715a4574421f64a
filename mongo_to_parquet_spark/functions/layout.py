"""Multi-dimensional layout keys (z-order / Morton interleave).

A single-column range-clustered export (``sources/export.export_sorted``)
prunes files for predicates on THAT column only. Interleaving the bits of
two dimension keys produces one sort key whose contiguous ranges cover
small rectangles in BOTH dimensions — parquet footer min/max statistics
then prune files for predicates on either dimension (the Delta/Iceberg
Z-ORDER layout idea, built here from plain built-in expressions).

Everything is JVM-side integer bit math (shiftright / bitwiseAND /
shiftleft) — codegen'd, no UDF. ``zorder_oracle_expr`` emits the identical
unrolled arithmetic as ANSI SQL so DuckDB can hash-check the computation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton code of two non-negative ints confined to ``bits`` bits each.

    Callers clamp the dimensions first (e.g. ``col % 256`` for bits=8);
    the interleave itself is an unrolled sum of masked shifts — constant
    folded by Catalyst into one codegen'd expression.
    """
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x + y, parts).cast("long")


def zorder_oracle_expr(a_sql: str, b_sql: str, bits: int = 8) -> str:
    """The same interleave as portable SQL (DuckDB oracle side)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({a_sql} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({b_sql} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(parts)
