"""Scalar function-library queries: string / date / math / case / array
(SURVEY §2.3). Generalizes the reference's only scalar computations —
year/month/day extraction (main.py:96-99) and ISO date parse (main.py:40-43).

Per-row, shuffle-free, fully codegen'd. Oracle casts pin DuckDB's wider
return types (BIGINT length/ceil, DATE vs TIMESTAMP date_trunc) to Spark's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T

QUERIES = {}
ORACLE = {}


def q(key, sql=None):
    def deco(fn):
        QUERIES[key] = fn
        if sql is not None:
            ORACLE[key] = sql
        return fn
    return deco


@q(
    "q_str_funcs",
    """
    SELECT p_partkey,
           lower(p_name) AS lo,
           upper(p_brand) AS up,
           substr(p_name, 1, 3) AS pre3,
           concat(p_brand, '|', p_type) AS brand_type,
           trim(p_name) AS trimmed,
           CAST(length(p_name) AS INT) AS name_len,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
    FROM part
    """,
)
def q_str_funcs(spark, sf):
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_brand").alias("up"),
        F.substring("p_name", 1, 3).alias("pre3"),
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("brand_type"),
        F.trim("p_name").alias("trimmed"),
        F.length("p_name").cast("int").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("int").alias("n_words"),
    )


@q(
    "q_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy,
           strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95,
           strftime(CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def q_date_funcs(spark, sf):
    # NB: Spark datediff(end, start) vs DuckDB date_diff('day', start, end) —
    # argument order flips (SURVEY §2.3 hard-parts watch list).
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        # dates emitted as ISO strings: DATE columns round-trip differently
        # through pandas in each engine (datetime.date vs datetime64)
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("month_end"),
    )


@q(
    "q_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / 3.0, 4) AS price_third,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           ROUND(pow(1.0 + l_tax, 2), 6) AS tax_sq,
           ROUND(ln(l_extendedprice), 6) AS price_ln
    FROM lineitem
    """,
)
def q_math_funcs(spark, sf):
    l = T(spark, sf, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # NB: never ROUND 2-decimal-like doubles at 1dp — Spark (shortest-
        # string HALF_UP) and DuckDB (binary-value) disagree on .x5 ties.
        F.round(F.col("l_extendedprice") / 3.0, 4).alias("price_third"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
    )


@q(
    "q_case_expr",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS bucket
    FROM orders
    """,
)
def q_case_expr(spark, sf):
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("bucket"),
    )


@q(
    "q_array_explode",
    """
    SELECT vec_id, CAST(u.pos AS INT) AS pos, u.val AS val
    FROM (SELECT vec_id,
                 unnest(list_transform(embedding, (x, i) -> {'pos': i - 1, 'val': x})) AS u
          FROM embeddings)
    """,
)
def q_array_explode(spark, sf):
    return T(spark, sf, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )


@q(
    "q_hof_array",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           ROUND(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4) AS l1_norm,
           len(list_filter(embedding, x -> x > 3)) > 0 AS has_big
    FROM embeddings
    """,
)
def q_hof_array(spark, sf):
    # higher-order array functions (filter / aggregate-fold / exists): stay
    # JVM-side and codegen'd — the UDF-free way to compute per-vector stats.
    # Both engines fold left-to-right over the list, so the double sum is
    # order-deterministic (unlike a grouped SUM).
    e = T(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double"))
            ),
            4,
        ).alias("l1_norm"),
        F.exists("embedding", lambda x: x > 3).alias("has_big"),
    )


@q(
    "q_array_funcs",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
           ROUND(CAST(embedding[8] AS DOUBLE), 4) AS eighth_val,
           ROUND(list_sum(CAST(list_slice(embedding, 1, 4) AS DOUBLE[])), 4) AS head4_sum
    FROM embeddings
    """,
)
def q_array_funcs(spark, sf):
    e = T(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(F.element_at("embedding", 8).cast("double"), 4).alias("eighth_val"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 4),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            4,
        ).alias("head4_sum"),
    )
