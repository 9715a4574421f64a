"""UDF / UDAF / UDTF surface (SURVEY §2.3).

Python crosses the boundary ONLY as Arrow-batched pandas UDFs — the
10-100× rule vs row-at-a-time Python UDFs (pyspark guide). The UDTF row
is deliberately the built-in explode(split(...)) composition: when a
built-in expresses the semantics, the UDTF is the wrong tool at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


@F.pandas_udf(DoubleType())
def _charge(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    # vectorized IEEE double math — bit-identical to the SQL expression
    return ext * (1.0 - disc) * (1.0 + tax)


@q(
    "q_udf_scalar_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def q_udf_scalar_pandas(spark, sf):
    # no ROUND: both sides run the identical left-associated IEEE sequence,
    # so the doubles are bit-equal; rounding would only ADD tie hazards.
    l = T(spark, sf, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        _charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@F.pandas_udf(DoubleType())
def _stddev(v: pd.Series) -> float:
    # grouped-agg pandas UDF; ddof=1 == stddev_samp
    return float(v.std(ddof=1))


@q(
    "q_udaf_grouped",
    """
    SELECT event_type, ROUND(stddev_samp(value), 4) AS value_std
    FROM events GROUP BY event_type
    """,
)
def q_udaf_grouped(spark, sf):
    e = T(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(_stddev("value"), 4).alias("value_std")
    )


@q(
    "q_udtf_split",
    """
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
)
def q_udtf_split(spark, sf):
    # UDTF-equivalent: one row per token. explode(split()) stays JVM-side;
    # a Python UDTF would pay the Arrow round-trip for no expressiveness gain.
    return T(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


def tokenize_udtf():
    """The REAL Python UDTF surface (Spark 4 ``@udtf``), for completeness.

    ``q_udtf_split`` deliberately uses explode(split(...)) — JVM-side,
    the right choice when a built-in expresses the semantics — so this
    UDTF is the library escape hatch for genuinely procedural row
    expansion. Register with ``spark.udtf.register("tokenize",
    tokenize_udtf())`` and use as a LATERAL table function.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text):
            for i, t in enumerate((text or "").split(" ")):
                yield i, t

    return Tokenize


@q(
    "q_udf_grouped_map",
    """
    SELECT doc_id, lang,
           CAST(row_number() OVER (
               PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS BIGINT
           ) AS len_rank
    FROM documents
    """,
)
def q_udf_grouped_map(spark, sf):
    # grouped-map applyInPandas: whole-group pandas transform (here a
    # per-language length rank — integer output, so the oracle hash-match
    # is exact with no float hazard). One shuffle on the group key; each
    # group materializes as ONE pandas frame, so the scale constraint is
    # max-group-size fits an executor — for unbounded groups use the
    # iterator-based mapInPandas instead (operators/multimodal.py).
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("len_rank", LongType()),
        ]
    )

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "len_rank": range(1, len(pdf) + 1),
            }
        )

    d = T(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(rank_group, schema=schema)


@q(
    "q_udf_sql",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def q_udf_sql(spark, sf):
    # SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN):
    # the user-facing way to package business expressions WITHOUT leaving
    # the JVM - the body inlines into the plan at analysis time, so unlike
    # any Python UDF it stays inside whole-stage codegen and costs exactly
    # what the raw expression costs (same q_udf_scalar_pandas math,
    # zero Arrow round-trip). Same no-ROUND reasoning: identical
    # left-associated IEEE sequence on both engines.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge_of(
            ep DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DOUBLE
        RETURN ep * (1 - d) * (1 + t)
        """
    )
    l = T(spark, sf, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("charge_of(l_extendedprice, l_discount, l_tax)").alias("charge"),
    )


@q(
    "q_udtf_kwic",
    """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
            FROM base)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           array_to_string(toks[greatest(1, i - 2):least(len(toks), i + 2)], ' ')
               AS context
    FROM pos WHERE toks[i] = 'spark'
    """,
)
def q_udtf_kwic(spark, sf):
    # the REAL Spark 4 Python UDTF surface, exercised end-to-end as a
    # LATERAL table function: keyword-in-context — each occurrence of the
    # term expands to (position, +-2-token window). Genuinely procedural
    # row expansion (per-match variable-length yield) is where a UDTF
    # earns its Arrow round-trip; pure tokenization stays explode(split)
    # (q_udtf_split's point). The UDTF runs once per input row with
    # LATERAL correlation; the outer columns never copy into Python —
    # only text crosses the boundary.
    from pyspark.sql.functions import udtf

    from mongo_to_parquet_spark.sources.catalog import register_views

    @udtf(returnType="pos int, context string", useArrow=True)
    class KwicUdtf:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for j, t in enumerate(toks):
                if t == "spark":
                    lo, hi = max(0, j - 2), min(len(toks), j + 3)
                    yield j, " ".join(toks[lo:hi])

    register_views(spark, sf)
    spark.udtf.register("kwic_udtf", KwicUdtf)
    return spark.sql(
        """
        SELECT d.doc_id, k.pos, k.context
        FROM documents d, LATERAL kwic_udtf(d.text) k
        """
    )


@q(
    "q_udf_grouped_arrow",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS v_min,
           MAX(value) AS v_max,
           MAX(value) - MIN(value) AS v_range
    FROM events GROUP BY event_type
    """,
)
def q_udf_grouped_arrow(spark, sf):
    # grouped-map applyInArrow: the zero-pandas twin of applyInPandas —
    # each group arrives as ONE pyarrow.Table and returns one, no pandas
    # materialization of the batch (the win for wide/binary columns;
    # operators/multimodal.py uses the mapInArrow streaming variant).
    # Min/max/count picks are exact, so the oracle hash-match carries no
    # float hazard. Same scale constraint as any grouped map: a group
    # must fit an executor.
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = (
        "event_type string, n bigint, v_min double, v_max double, v_range double"
    )

    def stats(tbl: pa.Table) -> pa.Table:
        vals = tbl.column("value")
        mm = pc.min_max(vals)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        return pa.table(
            {
                "event_type": [tbl.column("event_type")[0].as_py()],
                "n": [tbl.num_rows],
                "v_min": [lo],
                "v_max": [hi],
                "v_range": [hi - lo],
            }
        )

    e = T(spark, sf, "events").select("event_type", "value")
    return e.groupBy("event_type").applyInArrow(stats, schema=schema)


def _zscore_iter_udf():
    """Iterator-form scalar pandas UDF (``Iterator[Series] -> Iterator
    [Series]``): the API mode for EXPENSIVE per-executor init — load a
    model/tokenizer ONCE per partition, then stream Arrow batches
    through it. The scalar form would re-enter Python with no place to
    hoist the init; here everything before the ``for`` runs once per
    partition, amortized across all its batches.
    """
    @F.pandas_udf(DoubleType())
    def zscore(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # stand-in for an expensive model load: constants fixed per
        # partition (deterministic, so the oracle can reproduce them)
        mu, sigma = 250.0, 125.0
        for v in batches:
            yield (v - mu) / sigma

    return zscore


@q(
    "q_udf_scalar_iter",
    """
    SELECT event_id, (value - 250.0) / 125.0 AS z
    FROM events
    """,
)
def q_udf_scalar_iter(spark, sf):
    # iterator-form pandas UDF: same vectorized IEEE arithmetic as the
    # SQL expression (bit-identical doubles), but executed through the
    # Iterator[Series] protocol — per-partition init happens once, every
    # Arrow batch streams through without re-entering setup. At 100 TB
    # this is the scoring path: model deserialization costs seconds and
    # must not be paid per batch (or worse, per row).
    e = T(spark, sf, "events")
    return e.select("event_id", _zscore_iter_udf()("value").alias("z"))
