"""Skew mitigation: salted joins and salted two-phase aggregation (SCALE.md).

At 100 TB a handful of hot keys dominate: one reducer gets the hot key's
entire partition while the rest idle. AQE's skew-join split
(``spark.sql.adaptive.skewJoin``) handles the SORT-MERGE case at runtime;
these operators cover the two shapes AQE does not:

- ``salted_join``: fact⋈dim equi-join where the dim is small enough to
  replicate ``n_salt``× but too big (or too mutable) to broadcast. The
  fact side gets a deterministic per-row salt, the dim side is exploded
  across all salts, and the join key becomes (key, salt) — a hot key's
  rows now spread over ``n_salt`` reducers. Row-identical to the plain
  join, any join row multiplicity preserved.
- ``salted_distinct_count``: exact COUNT(DISTINCT x) per group. Partial
  aggregation can't compress distincts, so a hot group funnels every
  distinct value through one reducer. Phase 1 dedups on
  (group, salt(x), x) — spreading the hot group — phase 2 counts per
  (group): two small shuffles, no hot reducer, exact answer.

The reference has no skew handling at all (single-process cursor loop,
SURVEY §2.1 R1-R5); this module exists purely for the 100 TB target.
Declared query ``q_join_salted`` pins salted ≡ plain against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str | Column, n_salt: int, out: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, n_salt) derived by hashing ``from_col``.

    Hash a column that VARIES WITHIN the hot join/group key (a line number,
    an id, a timestamp) — salting on the key itself changes nothing.
    """
    c = F.col(from_col) if isinstance(from_col, str) else from_col
    return df.withColumn(out, F.pmod(F.xxhash64(c), F.lit(n_salt)).cast("int"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_from: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated across ``n_salt`` salts.

    ``salt_from`` is a fact column that varies within each join key. The
    dim is exploded n_salt× (its scan is n_salt× — use only when dim ≪
    fact and broadcast is off the table). Output columns = plain join's.
    """
    f = with_salt(fact, salt_from, n_salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return f.join(d, on=[*on, "__salt"], how=how).drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_salt: int = 64,
    out: str = "n_distinct",
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT distinct_col), skew-proof.

    Phase 1 dedups (group, salt, value) — the value itself picks the salt,
    so duplicates of one value always collide and the hot group's values
    spread over n_salt reducers. Phase 2 sums per-salt distinct counts:
    correct because salting PARTITIONS the value space.
    """
    salted = with_salt(df.select(*group_cols, distinct_col), distinct_col, n_salt)
    phase1 = (
        salted.groupBy(*group_cols, "__salt")
        .agg(F.count_distinct(distinct_col).alias("__part"))
    )
    return (
        phase1.groupBy(*group_cols)
        .agg(F.sum("__part").alias(out))
    )
