"""Data-quality validation: declarative checks → one violations DataFrame.

An export pipeline at 100 TB needs its gate checks (nulls, domains, ranges,
uniqueness, referential integrity) to cost as little as possible. The shapes
here:

- ``row_checks``: ALL row-level predicates for one table fused into a
  SINGLE aggregate pass — one scan, one conditional-sum per rule, then an
  unpivot of the 1-row result. Adding a rule costs one column, not one scan.
- ``unique_check``: duplicate count via ``count(*) − count(distinct …)`` —
  partial-aggregated, no row explosion back to the driver.
- ``fk_check``: orphan count via LEFT ANTI join (broadcast when the parent
  is a dim, SMJ otherwise) — never a row-by-row lookup.

All checks return the same 2-column shape ``(chk, violations)`` so they
union into one report; 0-violation rows stay in the report as evidence the
check ran. The reference has no validation at all (schema drift is silently
frozen-or-dropped, SURVEY §1.1) — this module is the guard the reference
was missing, generalized.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_checks(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One scan over ``df``; each rule maps check-name → VIOLATION predicate."""
    wide = df.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)
            for name, cond in rules.items()
        ]
    )
    return wide.unpivot([], list(rules), "chk", "violations")


def unique_check(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Violations = rows beyond the first per distinct key tuple."""
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("bigint")
        .alias("violations")
    ).select(F.lit(name).alias("chk"), "violations")


def fk_check(
    child: DataFrame, key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """Violations = child rows whose key has no parent (anti join)."""
    orphans = child.select(F.col(key).alias("__k")).join(
        parent.select(F.col(parent_key).alias("__k")), "__k", "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("violations")).select(
        F.lit(name).alias("chk"), "violations"
    )


def run_checks(*reports: DataFrame) -> DataFrame:
    """Union per-table reports into one (chk, violations) DataFrame."""
    return reduce(lambda a, b: a.unionByName(b), reports)


def profile_columns_kmv(
    df: DataFrame,
    reprs: dict[str, "Column | None"],
    hash_inputs: dict[str, Column] | None = None,
    k: int = 64,
) -> DataFrame:
    """:func:`profile_columns` with KMV-estimated distinct counts —
    hash-checkable by a DuckDB oracle (functions/sketch.py), unlike the
    HLL ``exact=False`` mode.

    ``hash_inputs`` maps column → a canonical STRING expression to hash
    (None/absent = plain string cast; doubles and timestamps need an
    explicit engine-stable rendering).

    Plan — TWO table scans total, one full-data shuffle:

    - base: nulls/min/max for every column in ONE 1-row aggregate pass.
    - sketches: ONE stacked scan builds all columns' ``(col_name, h)``
      hash pairs (a single Generate — not a scan per column), then
      ``distinct`` (HashAggregate, dedups map-side so the only
      full-data shuffle carries per-task-distinct hashes) feeding
      ``row_number() ≤ k`` per column. Catalyst rewrites that filter
      into ``WindowGroupLimit``: each map task keeps only the k
      smallest rows per column BEFORE the window's shuffle, so the
      per-task state is a fixed k-slot heap per column and the final
      per-column sort sees at most ``k × shuffle_partitions`` rows.
      (History, all best-of-3 under the bench.py protocol at sf0.1 on
      one box: a ``collect_set``-per-bucket form buffered a bucket's
      ENTIRE distinct-hash set — unbounded per-group state at high
      cardinality — and measured 2.34s; this form without the
      parallelism guard below, 1.85s; with it, 1.63s. The round-4
      per-column TakeOrdered form was bounded but paid len(reprs)
      pruned scans.)

    n_distinct is a BIGINT estimate: exact below k, else ⌊(k−1)·2³²/θ⌋.
    """
    from pyspark.sql import Window as _W

    from mongo_to_parquet_spark.functions import sketch as _sk

    names = list(reprs)
    hash_inputs = hash_inputs or {}
    # (Sharing one fan_out exchange between this base aggregate and the
    # hash pipeline does NOT dedupe: Catalyst pushes each consumer's
    # projection below the round-robin exchange, so the two subtrees
    # canonicalize differently and ReuseExchange never fires — lesson 24;
    # a persist isn't worth a 1-row aggregate's input. Two scans stands.)
    from mongo_to_parquet_spark.operators.parallel import fan_out

    base = df.agg(
        *[
            a
            for i, c in enumerate(names)
            for a in (
                (F.count(F.lit(1)) - F.count(F.col(c))).cast("bigint").alias(f"nn_{i}"),
                F.min(F.col(c)).alias(f"mn_{i}"),
                F.max(F.col(c)).alias(f"mx_{i}"),
            )
        ]
    )
    fmt = lambda i, c: (  # noqa: E731
        reprs[names[i]](c) if reprs[names[i]] is not None else c.cast("string")
    )
    shaped = base.select(
        *[
            col
            for i in range(len(names))
            for col in (
                F.col(f"nn_{i}"),
                fmt(i, F.col(f"mn_{i}")).alias(f"mns_{i}"),
                fmt(i, F.col(f"mx_{i}")).alias(f"mxs_{i}"),
            )
        ]
    )
    stack_args = ", ".join(
        f"'{names[i]}', nn_{i}, mns_{i}, mxs_{i}" for i in range(len(names))
    )
    stacked = shaped.selectExpr(
        f"stack({len(names)}, {stack_args}) "
        "as (col_name, n_nulls, min_repr, max_repr)"
    )
    # Parallelism guard for the hash stage: the stacked Generate computes
    # len(names) md5s per row inside its stage, so without fan_out a
    # one-file scan serializes every hash on one core — measured 0.94s of
    # a 1.6s sketch at sf0.1. Projection AFTER the fan_out so the
    # date_format/decimal renderings run parallel too; no-op at 100 TB.
    pruned = fan_out(df.select(*dict.fromkeys(names)))
    hash_cols = pruned.select(
        *[hash_inputs.get(c, F.col(c).cast("string")).alias(f"v_{i}")
          for i, c in enumerate(names)]
    )
    pairs = (
        hash_cols.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            _sk.kmv_hash(F.col(f"v_{i}")).alias("h"),
                        )
                        for i, c in enumerate(names)
                    ]
                )
            ).alias("p")
        )
        .select("p.col_name", "p.h")
        .filter(F.col("h").isNotNull())
    )
    rn = F.row_number().over(_W.partitionBy("col_name").orderBy("h"))
    sk = (
        pairs.distinct()
        .withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .groupBy("col_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"), F.max("h").alias("theta"))
    )
    est = sk.select(
        "col_name",
        _sk.kmv_estimate_long(F.col("m"), F.col("theta"), k).alias("n_distinct"),
    )
    # LEFT join + coalesce(n_distinct, 0) is LOAD-BEARING: an all-NULL
    # column contributes zero rows to `pairs` (every hash filtered by
    # isNotNull), so its group never forms in `est` — an inner join
    # would silently drop exactly the columns a data-quality profile
    # exists to flag. tests/test_operators.py pins this with an
    # all-NULL column; the oracle mirrors it with LEFT JOIN + COALESCE.
    return stacked.join(F.broadcast(est), "col_name", "left").select(
        "col_name",
        "n_nulls",
        F.coalesce("n_distinct", F.lit(0)).cast("bigint").alias("n_distinct"),
        "min_repr",
        "max_repr",
    )


def profile_columns(
    df: DataFrame, reprs: dict[str, Column | None], exact: bool = True
) -> DataFrame:
    """Column profiler → (col_name, n_nulls, n_distinct, min_repr, max_repr).

    ``reprs`` maps column name → a formatting expression applied to the raw
    MIN/MAX **after** aggregation (None = plain string cast). Formatting
    post-agg matters: min over a string repr would compare "100" < "99"
    lexicographically; the aggregate runs on the native type.

    Plan shape (the part that matters): mixing exact multi-column
    ``count_distinct`` with plain aggregates drags the WHOLE query through
    the distinct rewrite — Expand (k+1× row amplification) feeding
    SortAggregate, since string min/max buffers are not hash-aggregatable
    (measured 30× slower than the split plan at sf0.1). So:

    - ``exact=True``: TWO 1-row aggregates (nulls/min/max; distincts)
      cross-joined — each partial-aggregates map-side, the distinct pass
      keeps its Expand but no longer poisons the cheap metrics.
    - ``exact=False``: ONE pass — ``approx_count_distinct`` has a
      fixed-size HLL buffer, so everything stays in a single
      HashAggregate over a single scan. Recommended at 100 TB (the
      signature defaults to exact=True for oracle-exact results).
    """
    names = list(reprs)
    base = df.agg(
        *[
            a
            for i, c in enumerate(names)
            for a in (
                (F.count(F.lit(1)) - F.count(F.col(c))).cast("bigint").alias(f"nn_{i}"),
                F.min(F.col(c)).alias(f"mn_{i}"),
                F.max(F.col(c)).alias(f"mx_{i}"),
            )
        ]
    )
    if exact:
        nd = df.agg(
            *[
                F.count_distinct(F.col(c)).cast("bigint").alias(f"nd_{i}")
                for i, c in enumerate(names)
            ]
        )
        wide = base.crossJoin(nd)
    else:
        wide = df.agg(
            *[
                a
                for i, c in enumerate(names)
                for a in (
                    (F.count(F.lit(1)) - F.count(F.col(c)))
                    .cast("bigint")
                    .alias(f"nn_{i}"),
                    F.approx_count_distinct(F.col(c)).cast("bigint").alias(f"nd_{i}"),
                    F.min(F.col(c)).alias(f"mn_{i}"),
                    F.max(F.col(c)).alias(f"mx_{i}"),
                )
            ]
        )
    fmt = lambda i, c: (  # noqa: E731
        reprs[names[i]](c) if reprs[names[i]] is not None else c.cast("string")
    )
    shaped = wide.select(
        *[
            col
            for i in range(len(names))
            for col in (
                F.col(f"nn_{i}"),
                F.col(f"nd_{i}"),
                fmt(i, F.col(f"mn_{i}")).alias(f"mns_{i}"),
                fmt(i, F.col(f"mx_{i}")).alias(f"mxs_{i}"),
            )
        ]
    )
    stack_args = ", ".join(
        f"'{names[i]}', nn_{i}, nd_{i}, mns_{i}, mxs_{i}" for i in range(len(names))
    )
    return shaped.selectExpr(
        f"stack({len(names)}, {stack_args}) "
        "as (col_name, n_nulls, n_distinct, min_repr, max_repr)"
    )


def exact_kth_smallest(
    df: DataFrame, col: str, k: int, buckets: int = 1024,
    weight_col: str | None = None,
) -> int:
    """EXACT k-th smallest of an integer column WITHOUT a global sort —
    the 100 TB path for exact quantiles.

    Spark's ``percentile`` aggregate buffers every value (exact but
    memory-bound); a global sort is a full shuffle of the fact. This
    instead narrows an integer value range by iterative HISTOGRAM
    REFINEMENT: each round is ONE map-combined aggregate that buckets
    the in-range rows into ≤``buckets`` cells (≤``buckets`` rows reach
    the driver), picks the cell holding rank k, and recurses into it.
    Rounds = ⌈log_buckets(range)⌉ — 3 full scans for a 32-bit domain at
    B=1024, independent of row count; per-round driver state is the
    bucket census (the kmeans/kcore scalar-probe exception).

    When the bucket width reaches 1, the chosen cell IS the answer (a
    single integer with count > 0 — an actual data value). Requires a
    non-null integer-valued column; caller pre-scales decimals.

    ``weight_col``: treat each row as ``weight`` occurrences of its
    value — rank-k over the EXPANDED multiset without expanding it.
    This is what lets a caller collapse a 100 TB fact to its key census
    once (one scan, |keys| rows) and then run many rank probes against
    the census instead of the fact (q_partition_bounds).
    """
    c = F.col(col)
    w = F.col(weight_col) if weight_col else F.lit(1)
    # count only rows that can land in a bucket: a NULL value never
    # passes between(), so counting it in n would make high ranks die
    # mid-refinement ('rank not found in census') instead of failing the
    # range check here (round-7 advice). NULL-value (and NULL-weight)
    # rows are excluded from the ranked multiset, consistently with the
    # census sums below.
    row = df.agg(
        F.min(c).alias("lo"),
        F.max(c).alias("hi"),
        F.sum(F.when(c.isNotNull(), w)).alias("n"),
    ).collect()[0]
    lo, hi, n = row["lo"], row["hi"], row["n"] or 0
    if n == 0 or not 1 <= k <= n:
        raise ValueError(f"rank {k} out of range for {n} rows")
    base = 0  # values known < lo from previous rounds
    while hi > lo:
        width = (hi - lo + buckets) // buckets  # ceil → width >= 1
        # INTEGER bucket index: (c - lo) / width through double would
        # mis-bucket once the range passes 2^53 (value near a bucket
        # boundary rounds across it); div() keeps the whole contract in
        # int64 like the driver-side range arithmetic below
        census = dict(
            df.filter(c.between(lo, hi))
            .groupBy(F.expr(f"div({col} - {int(lo)}L, {int(width)}L)").alias("b"))
            .agg(F.sum(w).alias("cnt"))
            .collect()
        )
        cum = base
        for b in sorted(census):
            if cum + census[b] >= k:
                new_lo = lo + b * width
                hi = min(hi, new_lo + width - 1)
                lo = new_lo
                base = cum
                break
            cum += census[b]
        else:  # pragma: no cover - counts always reach k by construction
            raise AssertionError("rank not found in census")
    return int(lo)


def exact_ranks_smallest(
    df: DataFrame,
    col: str,
    ks: list[int],
    buckets: int = 1024,
    weight_col: str | None = None,
) -> dict[int, int]:
    """MANY exact ranks in shared passes — :func:`exact_kth_smallest` for
    a whole rank list (equi-depth boundaries, percentile grids).

    Probing R ranks one at a time costs R·⌈log_B(range)⌉ scans; here
    every refinement ROUND is ONE scan serving all still-active ranks:
    each rank's current [lo, hi] window rides a broadcast relation, rows
    fan out to the windows containing them (R-row broadcast nested-loop
    — R is tens), and one (rank, bucket) aggregate narrows every window
    simultaneously. Total scans = ⌈log_B(range)⌉ + 1, independent of R
    and of row count. Per-rank results are IDENTICAL to the one-rank
    probe (pinned in tests). Driver state: R bucket histograms.
    """
    c = F.col(col)
    w = F.col(weight_col) if weight_col else F.lit(1)
    # NULL-value rows are excluded from n for the same reason as in
    # exact_kth_smallest: they can never land in a bucket census
    row = df.agg(
        F.min(c).alias("lo"),
        F.max(c).alias("hi"),
        F.sum(F.when(c.isNotNull(), w)).alias("n"),
    ).collect()[0]
    glo, ghi, n = row["lo"], row["hi"], row["n"] or 0
    bad = [k for k in ks if n == 0 or not 1 <= k <= n]
    if bad:
        raise ValueError(f"ranks {bad} out of range for {n} rows")
    # state per rank: [lo, hi, base] (base = weight known < lo)
    state = {k: [glo, ghi, 0] for k in set(ks)}
    spark = df.sparkSession
    while True:
        active = {k: s for k, s in state.items() if s[1] > s[0]}
        if not active:
            break
        wins = [
            (k, s[0], s[1], (s[1] - s[0] + buckets) // buckets)
            for k, s in active.items()
        ]
        wdf = F.broadcast(
            spark.createDataFrame(wins, "k long, wlo long, whi long, wwidth long")
        )
        census: dict[int, dict[int, int]] = {k: {} for k in active}
        rows = (
            df.join(wdf, c.between(F.col("wlo"), F.col("whi")))
            .groupBy("k", F.expr(f"div({col} - wlo, wwidth)").alias("b"))
            .agg(F.sum(w).alias("cnt"))
            .collect()
        )
        for r in rows:
            census[r["k"]][r["b"]] = r["cnt"]
        for k, s in active.items():
            lo, hi, base = s
            width = (hi - lo + buckets) // buckets
            cum = base
            for b in sorted(census[k]):
                if cum + census[k][b] >= k:  # the dict key IS the rank
                    new_lo = lo + b * width
                    state[k] = [new_lo, min(hi, new_lo + width - 1), cum]
                    break
                cum += census[k][b]
            else:  # pragma: no cover
                raise AssertionError("rank not found in census")
    return {k: int(state[k][0]) for k in ks}
