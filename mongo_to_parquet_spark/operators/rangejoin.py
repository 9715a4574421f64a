"""Time-banded range self-join (SURVEY §2.3 `q_join_theta_range`; SCALE.md).

Finds all ordered pairs within the same key whose time delta lies in
``(0, band_us]``. The naive shape — equi-join on the key with the range
predicate as a residual — evaluates every pair within a key, so one hot
key's full history is quadratic. Banding bounds that: a qualifying pair
always lands in the same or adjacent ``band_us``-wide bucket, so the
later side is exploded to (bucket, bucket−1) and the join is equi on
(key, bucket) with the exact residual inside. Every pair is met exactly
once — via the earlier row's own bucket — and per-key fan is bounded by
events per 2·band window, i.e. linear in stream density.

Equivalence to the naive join is property-tested over random timestamps
(tests/test_properties.py) and against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_pairs(
    df: DataFrame,
    band_us: int,
    id_col: str = "event_id",
    key_col: str = "user_id",
    time_col: str = "us",
) -> DataFrame:
    """All (id1, id2) with same key, ``0 < t2 − t1 <= band_us``.

    ``time_col`` must be integral microseconds. Output columns:
    id1, id2, delta_us.
    """
    e = df.select(id_col, key_col, time_col)
    a = e.withColumn("bkt", (F.col(time_col) / band_us).cast("long")).alias("a")
    b = (
        e.withColumn("__b0", (F.col(time_col) / band_us).cast("long"))
        .withColumn("bkt", F.explode(F.array(F.col("__b0"), F.col("__b0") - 1)))
        .drop("__b0")
        .alias("b")
    )
    ta, tb = F.col(f"a.{time_col}"), F.col(f"b.{time_col}")
    return (
        a.join(
            b,
            (F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (tb > ta)
            & (tb - ta <= band_us),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            (tb - ta).alias("delta_us"),
        )
    )
