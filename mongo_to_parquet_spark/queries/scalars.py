"""Scalar function-library queries: string / date / math / case / array
(SURVEY §2.3). Generalizes the reference's only scalar computations —
year/month/day extraction (main.py:96-99) and ISO date parse (main.py:40-43).

Per-row, shuffle-free, fully codegen'd. Oracle casts pin DuckDB's wider
return types (BIGINT length/ceil, DATE vs TIMESTAMP date_trunc) to Spark's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


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


@q(
    "q_map_funcs",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           event_type AS m_type,
           user_id AS m_uid,
           CAST(2 AS INT) AS n_keys,
           'type,uid' AS keys_csv,
           FALSE AS has_missing
    FROM events
    """,
)
def q_map_funcs(spark, sf):
    # map column surface (the Mongo-subdocument analog): parse props into
    # map<string,bigint>, build a map from columns, concat, probe, enumerate
    # keys. All JVM-side — the oracle recomputes each scalar straight from
    # the source columns, so the hash check proves values survive the
    # map round-trip intact.
    e = T(spark, sf, "events")
    parsed = F.from_json("props", "map<string,bigint>")
    m = F.map_concat(
        F.create_map(F.lit("type"), F.col("event_type")),
        F.create_map(F.lit("uid"), F.col("user_id").cast("string")),
    )
    return e.select(
        "event_id",
        F.element_at(parsed, "k").alias("k_val"),
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").cast("bigint").alias("m_uid"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.map_contains_key(m, "missing").alias("has_missing"),
    )


@q(
    "q_regex_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
           CAST(len(regexp_extract_all(p_name, 'a')) AS INT) AS n_a,
           regexp_matches(p_name, 'green|red|blue') AS has_color
    FROM part
    """,
)
def q_regex_funcs(spark, sf):
    # regex family: extract / replace-all / count / match. Spark
    # regexp_replace replaces ALL matches by default — DuckDB only the first,
    # hence the 'g' flag on the oracle side.
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.regexp_count("p_name", F.lit("a")).cast("int").alias("n_a"),
        F.col("p_name").rlike("green|red|blue").alias("has_color"),
    )


@q(
    "q_null_funcs",
    """
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS closed_status,
           COALESCE(nullif(o_orderstatus, 'O'), 'open') AS status_filled,
           (nullif(o_orderstatus, 'O') IS NULL) AS is_open,
           CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
                THEN 'done' ELSE 'pending' END AS nvl2_tag,
           COALESCE(CAST(NULL AS DOUBLE), o_totalprice, 0.0) AS price_nn
    FROM orders
    """,
)
def q_null_funcs(spark, sf):
    # null-handling family over nulls we mint with nullif (fixtures are
    # null-free): nullif / coalesce / IS NULL / nvl2. nvl2 has no DuckDB
    # twin — the oracle spells it as CASE, which is also what Catalyst
    # rewrites it to (RuntimeReplaceable).
    o = T(spark, sf, "orders")
    closed = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        closed.alias("closed_status"),
        F.coalesce(closed, F.lit("open")).alias("status_filled"),
        closed.isNull().alias("is_open"),
        F.nvl2(closed, F.lit("done"), F.lit("pending")).alias("nvl2_tag"),
        F.coalesce(F.lit(None).cast("double"), F.col("o_totalprice"), F.lit(0.0)).alias(
            "price_nn"
        ),
    )


@q(
    "q_json_variant",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(NULL AS BIGINT) AS missing_val,
           json(props)::VARCHAR AS canonical
    FROM events
    """,
)
def q_json_variant(spark, sf):
    # Spark 4 VARIANT type — the real Mongo-document answer: parse once into
    # a binary self-describing value, then typed path extraction
    # (variant_get) without a fixed schema. Shredded-at-scan when stored in
    # parquet. Canonical JSON round-trip pins serialization (both engines
    # minify), try_variant_get pins missing-path → NULL.
    e = T(spark, sf, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_val"),
        F.to_json(v).alias("canonical"),
    )


@q(
    "q_lateral_explode",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> len(t) > 6) AS lt
      FROM documents)
    SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok AS tok
    FROM (SELECT doc_id,
                 unnest(list_transform(lt, (t, i) -> {'pos': i - 1, 'tok': t})) AS u
          FROM base WHERE len(lt) > 0)
    UNION ALL
    SELECT doc_id, CAST(NULL AS INT) AS pos, CAST(NULL AS VARCHAR) AS tok
    FROM base WHERE len(lt) = 0
    """,
)
def q_lateral_explode(spark, sf):
    # OUTER lateral explode: docs whose filtered token list is EMPTY must
    # survive as a (doc_id, null, null) row — posexplode_outer, vs plain
    # explode which would silently drop them (104 of 500 docs here).
    d = T(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 6)
    return d.select(
        "doc_id", F.posexplode_outer(toks).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "tok")


@q(
    "q_date_series",
    """
    SELECT o_orderkey, strftime(m, '%Y-%m-%d') AS month_start
    FROM (SELECT o_orderkey,
                 unnest(generate_series(date_trunc('month', o_orderdate),
                                        date_trunc('month', o_orderdate) + INTERVAL 2 MONTH,
                                        INTERVAL 1 MONTH)) AS m
          FROM orders)
    """,
)
def q_date_series(spark, sf):
    # sequence() + explode: per-row date-series generation (the densify /
    # gap-fill primitive). Anchored on month TRUNCATION so month arithmetic
    # never hits end-of-month clamping, which Spark and DuckDB resolve
    # differently. ISO-string output sidesteps tz/dtype drift.
    o = T(spark, sf, "orders")
    start = F.date_trunc("month", F.col("o_orderdate"))
    series = F.sequence(
        start, start + F.expr("interval 2 months"), F.expr("interval 1 month")
    )
    return o.select(
        "o_orderkey",
        F.explode(series).alias("m"),
    ).select("o_orderkey", F.date_format("m", "yyyy-MM-dd").alias("month_start"))


@q(
    "q_str_collate",
    """
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang
        FROM documents
    )
    SELECT lower(lang) AS lang_lc, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM d GROUP BY lower(lang)
    """,
)
def q_str_collate(spark, sf):
    # Spark 4 COLLATION surface: the corpus's language tags arrive with
    # inconsistent casing (synthesized deterministically here: even
    # doc_ids uppercased), and the group key is `lang COLLATE
    # UTF8_LCASE` — case handling lives in the COMPARATOR, not in a
    # derived lower() column: original strings survive, and the shuffle
    # hash-partitions on the collation key correctly (equal-under-
    # collation values land together). The oracle groups by lower() —
    # same partitions; the output key is lower()ed on both sides because
    # a collated group's representative string is first-seen
    # (nondeterministic across partitionings).
    #
    # Honest scale note: collated keys are not hash-aggregatable in this
    # build — the plan falls to SortAggregate (PLANS.md). Where grouped
    # cardinality is fact-sized, pre-folding with lower() and grouping
    # binary (one codegen'd hash agg) is the faster plan; the collation
    # form wins when ORIGINAL casing must survive or the collation is
    # not expressible as a normalization (locale-aware UNICODE_CI).
    d = T(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang"),
    )
    return (
        d.groupBy(F.expr("lang COLLATE UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.lower(F.col("k")).cast("string").alias("lang_lc"), "n_docs")
    )
