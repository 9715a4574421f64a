"""Training-data curation operators, round 2 (N★ widening).

Second batch of LLM-pipeline operators beyond queries/llm.py: semantic
(embedding-centroid) dedup, kNN label assignment, weighted sampling,
key-skew auditing, SCD-2 history building, k-anonymity suppression,
per-doc keyword extraction, and embedding-corpus QA. Same discipline as
every other family: declarative DataFrame plans, oracle-exact determinism
(ROUND-wrapped floats, total orders under every limit, identical aliases
both sides), and a 100 TB scale note per query.

Heritage: the reference has none of this (SURVEY §2.2 — single-collection
ETL, reference main.py:287-309); these generalize the north-star pipeline
surface (BASELINE.json north_star).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo_to_parquet_spark.functions import vector
from mongo_to_parquet_spark.operators import text, tokenizer
from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


# ------------------------------------------------------- semantic dedup ----
@q(
    "q_dedup_semantic",
    """
    WITH dims AS (
        SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    cd AS (SELECT label, pos, ROUND(AVG(val), 4) AS cv
           FROM dims GROUP BY label, pos),
    cent AS (SELECT label, list(cv ORDER BY pos) AS centroid
             FROM cd GROUP BY label),
    scored AS (
        SELECT vec_id, e.label,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            centroid), 4) AS cent_sim
        FROM embeddings e JOIN cent USING (label)
    )
    SELECT vec_id, label, cent_sim,
           CASE WHEN row_number() OVER (PARTITION BY label
                                        ORDER BY cent_sim DESC, vec_id ASC) = 1
                     OR cent_sim < 0.30
                THEN 'keep' ELSE 'drop' END AS disposition
    FROM scored
    """,
)
def q_dedup_semantic(spark, sf):
    # SemDeDup-style semantic dedup: within each cluster (label is the
    # cluster stand-in), docs whose cosine-to-centroid >= tau are mutually
    # redundant "prototypes" — keep exactly one (the closest, vec_id
    # tiebreak) and drop the rest; docs below tau are diverse and all kept.
    #
    # Scale: the centroid table is labels x dims rows (independent of
    # corpus size) built from one posexplode + partial-agg shuffle that
    # carries per-(label,dim,partition) sums; it broadcasts back, so the
    # scoring pass is map-only. The only per-row shuffle is the per-label
    # window rank; with millions of clusters each partition holds ~cluster
    # size rows, the balanced case. The centroid is ROUND(4)ed on both
    # sides BEFORE the cosine so the score is engine-portable.
    e = T(spark, sf, "embeddings")
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 4).alias("cv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
            ).alias("centroid")
        )
    )
    scored = e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.round(vector.cosine(F.col("embedding"), F.col("centroid")), 4).alias(
            "cent_sim"
        ),
    )
    w = Window.partitionBy("label").orderBy(F.desc("cent_sim"), F.asc("vec_id"))
    return scored.select(
        "vec_id",
        "label",
        "cent_sim",
        F.when(
            (F.row_number().over(w) == 1) | (F.col("cent_sim") < 0.30), "keep"
        )
        .otherwise("drop")
        .alias("disposition"),
    )


# ------------------------------------------------------ kNN classification --
@q(
    "q_knn_classify",
    """
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS p
                    FROM embeddings WHERE vec_id < 20),
    scored AS (
        SELECT probe_id, e.vec_id, e.label,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(p AS DOUBLE[])), 4) AS sim
        FROM embeddings e CROSS JOIN probes
        WHERE e.vec_id >= 20
    ),
    topk AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
                                         ORDER BY sim DESC, vec_id ASC) AS rk
            FROM scored
        ) WHERE rk <= 5
    ),
    votes AS (SELECT probe_id, label, CAST(COUNT(*) AS BIGINT) AS votes
              FROM topk GROUP BY probe_id, label)
    SELECT probe_id, label AS pred_label, votes FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY votes DESC, label ASC) AS vr
        FROM votes
    ) WHERE vr = 1
    """,
)
def q_knn_classify(spark, sf):
    # kNN label assignment (auto-labeling / label-noise audit): each probe
    # vector takes the majority label of its 5 nearest neighbors by
    # cosine; ties break to the smaller label. Ranked on the ROUNDED sim
    # (q_sim_topk convention) so boundary ties agree across engines.
    #
    # Scale: probes broadcast (a labeling batch is small); the corpus scan
    # is one pass with a per-probe WindowGroupLimit — each partition keeps
    # only k rows per probe before the shuffle, so the exchange carries
    # O(probes x k x partitions), never the corpus. The N-probe variant at
    # 100 TB is q_sim_topk_batch's plan with the vote aggregation fused on
    # top; for probe sets too big to broadcast, block by IVF cell
    # (operators/similarity.py) before voting.
    e = T(spark, sf, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p")
    )
    scored = (
        e.filter(F.col("vec_id") >= 20)
        .crossJoin(F.broadcast(probes))
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round(vector.cosine(F.col("embedding"), F.col("p")), 4).alias("sim"),
        )
    )
    wk = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    votes = (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= 5)
        .groupBy("probe_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    wv = Window.partitionBy("probe_id").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("probe_id", F.col("label").alias("pred_label"), "votes")
    )


# ------------------------------------------------------ weighted sampling ---
@q(
    "q_sample_weighted",
    """
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ROUND(pow((CAST(concat('0x', substr(md5(concat('wsamp',
                              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 0.5)
                             / 4294967296.0,
                         1.0 / CAST(n_chars AS DOUBLE)), 6) AS wkey
        FROM documents
    )
    SELECT doc_id, n_chars, wkey FROM keyed
    ORDER BY wkey DESC, doc_id ASC
    LIMIT 20
    """,
)
def q_sample_weighted(spark, sf):
    # Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    # key_i = u_i^(1/w_i) with u_i a content-addressed uniform from
    # md5(doc_id) — the top-k by key is an exact weighted sample (here
    # weight = n_chars, i.e. length-proportional, the usual mixture knob
    # when rebalancing sources by byte budget). No RNG state: the sample
    # is reproducible across runs, engines, and repartitionings.
    #
    # Scale: TakeOrderedAndProject — each partition keeps its local top-k,
    # the driver merges k x n_partitions candidates; no global sort, no
    # full shuffle. One scan of (doc_id, n_chars): the text column is
    # never read (pruned projection). Ordered by the ROUNDED key on both
    # sides so sub-6dp libm pow differences cannot flip the cut.
    d = T(spark, sf, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wsamp"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.round(F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 6).alias(
            "wkey"
        ),
    )
    return keyed.orderBy(F.desc("wkey"), F.asc("doc_id")).limit(20)


# --------------------------------------------------------- key-skew audit ---
@q(
    "q_stats_skew",
    """
    WITH pk AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           ROUND(AVG(cnt), 4) AS avg_cnt,
           ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / AVG(cnt), 4) AS skew_ratio
    FROM pk
    """,
)
def q_stats_skew(spark, sf):
    # Partition-skew audit: the diagnostic you run BEFORE choosing a join
    # strategy on a new key. skew_ratio = hottest key / mean; >> 1 means a
    # plain hash-partitioned join/agg on this key will straggle and the
    # plan should salt (operators/skew.py) or rely on AQE skew-join.
    #
    # Scale: two aggregations, both partial — the first shuffles one count
    # per (key, partition), the second reduces #keys rows to one. This is
    # the cheap O(keys) census that makes the 100 TB salting decision
    # data-driven instead of guessed.
    o = T(spark, sf, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.round(F.avg("cnt"), 4).alias("avg_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
        F.round(F.max("cnt").cast("double") / F.avg("cnt"), 4).alias("skew_ratio"),
    )


# -------------------------------------------------------- Pareto skyline ---
@q(
    "q_skyline_pareto",
    """
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def q_skyline_pareto(spark, sf):
    # 2-D Pareto skyline: parts not dominated on (price↓, size↑) — the
    # quality-vs-cost frontier query behind "which corpus slices are
    # worth keeping at this budget". The oracle states the semantics as
    # the O(n²) NOT EXISTS; the engine never forms pairs: sort by price
    # and a row is dominated iff a strictly-cheaper row has size ≥ mine
    # (running MAX over an integer-cents RANGE frame excluding the
    # current price) or an equal-priced row has size > mine (per-price
    # MAX). Two window passes over ONE ordering replace the self-join.
    #
    # Scale: a bare global window would single-task, so dominated rows
    # are first pruned per-partition (same two windows keyed by
    # spark_partition_id — a row dominated locally is dominated
    # globally), and only the per-partition frontiers — typically
    # O(distinct prices) rows, not O(n) — meet the final global window.
    # The skyline-of-skylines is exactly the skyline, so the
    # partition-id-dependent intermediate never leaks into the result.
    p = T(spark, sf, "part").select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias("cents"),
    )

    def survivors(df, *part_cols):
        w_cheaper = (
            Window.partitionBy(*part_cols)
            .orderBy("cents")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_equal = Window.partitionBy(*part_cols, "cents")
        m1 = F.max("p_size").over(w_cheaper)
        m2 = F.max("p_size").over(w_equal)
        dominated = (m1.isNotNull() & (m1 >= F.col("p_size"))) | (
            m2 > F.col("p_size")
        )
        return df.withColumn("dom", dominated).filter(~F.col("dom")).drop("dom")

    local = survivors(p.withColumn("pid", F.spark_partition_id()), "pid").drop("pid")
    return survivors(local).select("p_partkey", "p_size", "p_retailprice")


# ------------------------------------------------------- OLS regression ----
@q(
    "q_stats_regression",
    """
    WITH t AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    s AS (
        SELECT flag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM t GROUP BY flag
    )
    SELECT flag AS l_returnflag, n_rows,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) / CAST(100 AS DOUBLE)
               AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               / CAST(100 AS DOUBLE) AS intercept,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM s
    """,
)
def q_stats_regression(spark, sf):
    # Per-group OLS fit (slope/intercept/R²) of price on quantity — the
    # drift/QA regression you run per corpus slice. Both engines ship
    # regr_slope/regr_intercept/regr_r2, but their double accumulation
    # is partition-order dependent, so this is the repo's fixed-point
    # formulation instead: scale x,y to exact integers (quantity units,
    # price cents), take the five sufficient sums in overflow-proof
    # integer space (Spark DECIMAL(38,0), DuckDB HUGEINT), convert ONCE
    # to double, then evaluate the identical closed-form expression tree
    # on both engines — same IEEE inputs, same op order, bit-equal
    # UNROUNDED output (pattern: q_score_recency_decay; rule:
    # queries/__init__ wide-decimal note — scale-0 conversion is a
    # single correctly-rounded int→double on both engines, no 10^s
    # float division).
    #
    # Scale: one partial-aggregated groupBy — sufficient statistics are
    # the textbook map-side-combinable shape, one row per group out.
    li = T(spark, sf, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = t.groupBy("flag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("syy"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    hundred = F.lit(100.0)
    return s.select(
        F.col("flag").alias("l_returnflag"),
        "n_rows",
        (num / den / hundred).alias("slope"),
        ((sy - num / den * sx) / n / hundred).alias("intercept"),
        ((num * num) / (den * (n * syy - sy * sy))).alias("r2"),
    )


# -------------------------------------------------------- SCD-2 history ----
@q(
    "q_scd2_history",
    """
    WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
                FROM events),
    chg AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                       THEN 1 ELSE 0 END AS chg
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seg AS (
        SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS seg_id
        FROM chg
    ),
    hist AS (
        SELECT user_id, CAST(seg_id AS BIGINT) AS seg_id,
               MIN(event_type) AS event_type,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS valid_from_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM seg GROUP BY user_id, seg_id
    )
    SELECT user_id, seg_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY seg_id)
               AS valid_to_us,
           CAST(CASE WHEN lead(valid_from_us) OVER (PARTITION BY user_id
                                                    ORDER BY seg_id) IS NULL
                     THEN 1 ELSE 0 END AS INT) AS is_current,
           n_events
    FROM hist
    """,
)
def q_scd2_history(spark, sf):
    # SCD-2 (slowly-changing-dimension type 2) history build: collapse each
    # user's event stream into validity intervals — one row per run of
    # equal event_type, [valid_from, valid_to) half-open, open interval =
    # current. Complements operators/merge.py's SCD-1 upsert (which keeps
    # only latest state) with full history, the lineage ETL shape.
    #
    # Scale: classic gaps-and-islands — ONE shuffle by user_id serves the
    # change-flag window, the running segment sum, the per-segment
    # aggregate, and the lead() (all partitioned by the same key, Catalyst
    # reuses the exchange). State per key is a sort of that user's rows.
    ev = T(spark, sf, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # null-safe change flag (= the oracle's IS DISTINCT FROM): a NULL
    # event_type following a non-null one IS a change, and the first row's
    # NULL lag differs from any value — `lag != col` would return NULL
    # (→ 0) in both cases and silently glue segments together
    seg = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(wo).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    ).withColumn("seg_id", F.sum("chg").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    hist = seg.groupBy("user_id", F.col("seg_id").cast("bigint").alias("seg_id")).agg(
        F.min("event_type").alias("event_type"),
        F.unix_micros(F.min("ts")).alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    ws = Window.partitionBy("user_id").orderBy("seg_id")
    return hist.select(
        "user_id",
        "seg_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(ws).alias("valid_to_us"),
        F.when(F.lead("valid_from_us").over(ws).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
        "n_events",
    )


# --------------------------------------------------------- k-anonymity -----
@q(
    "q_kanonymize",
    """
    WITH g AS (SELECT c_mktsegment AS seg, CAST(c_nationkey AS INT) AS nat,
                      COUNT(*) AS n, SUM(c_acctbal) AS bal
               FROM customer GROUP BY 1, 2)
    SELECT CASE WHEN n >= 8 THEN seg ELSE '*' END AS seg,
           CASE WHEN n >= 8 THEN nat ELSE -1 END AS nat,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           ROUND(SUM(bal) / SUM(n), 2) AS avg_bal
    FROM g GROUP BY 1, 2
    """,
)
def q_kanonymize(spark, sf):
    # k-anonymity suppression (k=8) over the quasi-identifier
    # (mktsegment, nationkey): cohorts smaller than k are merged into one
    # suppressed bucket ('*', -1) so no released group identifies fewer
    # than k individuals. The released aggregate (avg balance) is computed
    # AFTER merging, so the suppressed bucket leaks only its pooled mean.
    # Pairs with q_anonymize_join (pseudonymized keys) as the release
    # pipeline's generalization step.
    #
    # Scale: two hash aggregations; the first shuffles one partial per
    # (quasi-id, partition), the second re-buckets the (small) group
    # census — the data-sized pass is map-side only.
    c = T(spark, sf, "customer")
    g = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("int").alias("nat"),
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("c_acctbal").alias("bal"))
    k = 8
    return (
        g.select(
            F.when(F.col("n") >= k, F.col("seg")).otherwise("*").alias("seg"),
            F.when(F.col("n") >= k, F.col("nat")).otherwise(-1).alias("nat"),
            "n",
            "bal",
        )
        .groupBy("seg", "nat")
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.round(F.sum("bal") / F.sum("n"), 2).alias("avg_bal"),
        )
    )


# ----------------------------------------------------- keyword extraction ---
@q(
    "q_text_keywords",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND(tf * ln(CAST(n AS DOUBLE) / df), 4) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, CAST(rk AS INT) AS rk FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, token ASC) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def q_text_keywords(spark, sf):
    # Per-doc keyword extraction: top-3 tokens by TF-IDF (ties to the
    # lexicographically smaller token). This is q_text_tfidf's scoring
    # with a per-doc WindowGroupLimit on top — the standard cheap
    # doc-topic signal for corpus browsing / mixture tagging.
    #
    # Scale: the rank window partitions by doc_id — the same key as the
    # tf aggregation, so the heavy (doc, token) stream is shuffled once
    # and WindowGroupLimit truncates each partition to 3 rows per doc
    # before any downstream exchange.
    scored = text.tfidf(T(spark, sf, "documents"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tfidf", "rk")
    )


# ------------------------------------------------------ embedding QA -------
@q(
    "q_embed_quality",
    """
    WITH e AS (
        SELECT label, len(embedding) AS dim,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(DISTINCT dim) AS BIGINT) AS n_dims_distinct,
           CAST(COUNT(*) FILTER (WHERE nrm = 0) AS BIGINT) AS n_zero,
           ROUND(MIN(nrm), 4) AS min_norm,
           ROUND(MAX(nrm), 4) AS max_norm,
           ROUND(AVG(nrm), 4) AS avg_norm
    FROM e GROUP BY label
    """,
)
def q_embed_quality(spark, sf):
    # Embedding-corpus QA gate: per label — vector count, dimension
    # consistency (n_dims_distinct must be 1), zero-vector count (a zero
    # norm breaks cosine downstream), and the norm distribution
    # (un-normalized or truncated embedding batches show up as outlier
    # norms). Run before any similarity/dedup family lands on a new batch;
    # the validate.py quality-gate analog for the vector modality.
    #
    # Scale: norm is a codegen'd array fold computed during the scan; one
    # partial-aggregated shuffle of labels x partitions rows. The exact
    # dim-distinct is tiny-cardinality; at extreme label counts swap to
    # approx_count_distinct (q_profile's exact/approx split).
    e = T(spark, sf, "embeddings").select(
        "label",
        F.size("embedding").alias("dim"),
        vector.norm(F.col("embedding")).alias("nrm"),
    )
    return e.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.countDistinct("dim").cast("bigint").alias("n_dims_distinct"),
        F.count(F.when(F.col("nrm") == 0, 1)).cast("bigint").alias("n_zero"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.round(F.avg("nrm"), 4).alias("avg_norm"),
    )


# ------------------------------------------------------ graph: pagerank ----
_PR_SCALE = 1_000_000_000  # fixed-point: pr values are ×1e9 integers


@q(
    "q_graph_pagerank",
    f"""
    WITH e0 AS (
        SELECT concat('C', CAST(o_custkey AS VARCHAR)) AS src,
               concat('S', CAST(l_suppkey AS VARCHAR)) AS dst,
               COUNT(*) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    edges AS (SELECT src, dst, w FROM e0 UNION ALL SELECT dst, src, w FROM e0),
    deg AS (SELECT src, SUM(w) AS wd FROM edges GROUP BY src),
    en AS (SELECT e.src, e.dst, e.w, d.wd FROM edges e JOIN deg d USING (src)),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    p0 AS (SELECT src AS node, {_PR_SCALE} // n AS pr FROM deg CROSS JOIN nn),
    i1 AS (SELECT en.dst AS node,
                  {15 * _PR_SCALE} // (100 * n)
                      + (85 * SUM((p.pr * en.w) // en.wd)) // 100 AS pr
           FROM en JOIN p0 p ON p.node = en.src CROSS JOIN nn
           GROUP BY en.dst, nn.n),
    i2 AS (SELECT en.dst AS node,
                  {15 * _PR_SCALE} // (100 * n)
                      + (85 * SUM((p.pr * en.w) // en.wd)) // 100 AS pr
           FROM en JOIN i1 p ON p.node = en.src CROSS JOIN nn
           GROUP BY en.dst, nn.n),
    i3 AS (SELECT en.dst AS node,
                  {15 * _PR_SCALE} // (100 * n)
                      + (85 * SUM((p.pr * en.w) // en.wd)) // 100 AS pr
           FROM en JOIN i2 p ON p.node = en.src CROSS JOIN nn
           GROUP BY en.dst, nn.n)
    SELECT node, CAST(pr AS BIGINT) AS pagerank_scaled FROM i3
    """,
)
def q_graph_pagerank(spark, sf):
    # Weighted PageRank (3 fixed iterations, damping 0.85) over the
    # bipartite customer↔supplier purchase graph, in FIXED-POINT integer
    # arithmetic: pr values are ×1e9 integers, per-edge contribution is
    # (pr·w) div weighted-degree, and each iteration re-adds the
    # teleport base. Integer sums are order-independent, so the result
    # hash-matches the oracle exactly — no float-summation drift, the
    # usual blocker for cross-engine iterative algorithms.
    #
    # Scale: each iteration is one fact-sized shuffle (join ranks to
    # edges on src, aggregate contributions on dst). The edge list and
    # weighted degrees are computed once; undirected symmetrization means
    # no dangling-mass correction is needed. A 100 TB / billion-node run
    # adds per-iteration checkpointing (truncate the growing lineage) and
    # partitions edges by src so the rank join is co-located; the
    # iteration count stays a driver-side Python loop — Spark has no
    # native iterate operator, and unrolling through Catalyst is exactly
    # how GraphFrames does it.
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    deg = edges.groupBy("src").agg(F.sum("w").alias("wd"))
    # Iteration hygiene: the edge⋈degree relation `en` appears in every
    # iteration, so it is computed ONCE — repartitioned by src (the join
    # key every iteration probes) and persisted. The cached
    # InMemoryRelation reports hashpartitioning(src), so each iteration's
    # rank join shuffles only the node-sized rank relation to meet it;
    # the fact-sized edge build (lineitem⋈orders + two aggs) never
    # re-runs. This is exactly the "partition edges by src, materialize
    # once" layout a 100 TB / billion-edge run needs (there: a bucketed-
    # by-src parquet layout via export_bucketed instead of a cache, and
    # per-iteration checkpoints for deep unrolls).
    # (measured: localCheckpoint(eager=True) instead of persist() loses
    # the partitioning — LogicalRDD reports UnknownPartitioning, so every
    # iteration re-exchanges the edge side: 3.9s vs 2.05s at sf0.1.)
    en = edges.join(deg, "src").repartition("src").persist()
    # node count: a bounded 1-row driver scalar (also materializes the
    # cache before the iteration DAG is planned); folding it into the
    # plan as a crossJoin(broadcast(nn)) costs an extra exchange per
    # iteration for a constant.
    n = en.select(F.countDistinct("src")).first()[0]
    base = 15 * _PR_SCALE // (100 * n)  # teleport term, integer floor div
    pr = (
        en.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.lit(_PR_SCALE // n).alias("pr"))
    )
    for _ in range(3):
        pr = (
            en.join(pr.hint("shuffle_hash"), en.src == pr.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum(F.expr("(pr * w) div wd")).alias("s"))
            .select(
                F.col("node2").alias("node"),
                (F.lit(base) + F.expr("(85 * s) div 100")).alias("pr"),
            )
        )
    return pr.select("node", F.col("pr").cast("bigint").alias("pagerank_scaled"))


# -------------------------------------------------------- snapshot diff ----
@q(
    "q_snapshot_diff",
    """
    WITH snap_a AS (
        SELECT o_orderkey,
               md5(concat_ws('|',
                   coalesce(CAST(o_orderstatus AS VARCHAR), '<NULL>'),
                   coalesce(CAST(o_totalprice AS VARCHAR), '<NULL>'))) AS fp
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ),
    snap_b AS (
        SELECT o_orderkey,
               md5(concat_ws('|',
                   coalesce(CAST(o_orderstatus AS VARCHAR), '<NULL>'),
                   coalesce(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                                      THEN o_totalprice + 1.0
                                      ELSE o_totalprice END AS VARCHAR), '<NULL>'))) AS fp
        FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT CASE WHEN a.fp IS NULL THEN 'added'
                WHEN b.fp IS NULL THEN 'removed'
                WHEN a.fp <> b.fp THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
    GROUP BY 1
    """,
)
def q_snapshot_diff(spark, sf):
    # Export reconciliation (operators/diff.py): two snapshots of orders —
    # "last run" (pre-1997) vs "this run" (1996 onward, with urgent
    # orders repriced to simulate updates) — classified into added /
    # removed / changed / unchanged. The diff joins (key, md5 fingerprint)
    # pairs, never payloads; md5 over the same canonical string makes the
    # classification identical in both engines. One full-outer SMJ on the
    # key + a 4-group rollup; at 100 TB the shuffle carries 40 bytes/row.
    #
    # CAST-to-string portability note: both engines render these doubles
    # (2-dec money values) identically; the +1.0 update keeps the mutated
    # value on the same grid.
    from mongo_to_parquet_spark.operators import diff as D

    o = T(spark, sf, "orders")
    snap_a = o.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    snap_b = o.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    d = D.snapshot_diff(
        snap_a, snap_b, keys=["o_orderkey"], compare_cols=["o_orderstatus", "o_totalprice"]
    )
    return D.diff_summary(d)


# ---------------------------------------------------- tokenizer training ---
@q(
    "q_bpe_pairs",
    """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    pairs AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair
        FROM tok, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair ASC
    LIMIT 30
    """,
)
def q_bpe_pairs(spark, sf):
    # Tokenizer-training prep: adjacent symbol-pair frequencies within
    # words — the statistic BPE's first merge iteration maximizes (the
    # top row IS the first merge). Character pairs here; after a merge
    # the same plan re-runs over the rewritten symbol sequences, so this
    # is the per-iteration workhorse of corpus-scale BPE training.
    #
    # Scale: explode(words) → per-word pair generation via a codegen'd
    # transform(sequence) — map-only until one count aggregation whose
    # shuffle carries (pair, partial count): alphabet² keys regardless of
    # corpus size. Top-k is TakeOrderedAndProject. One scan of text; no
    # UDFs, no Python.
    d = T(spark, sf, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(30)
    )


_BPE_TRAIN_K = 8


def _bpe_train_ctes(k: int = _BPE_TRAIN_K) -> str:
    """Chained-CTE WITH block for k unrolled BPE merge iterations
    (lesson 27 — the q_rag_mmr / q_select_cover pattern applied to
    tokenizer training): w0 = the word census, then per iteration p_i
    (pair counts) → m_i (argmax merge) → w_i (census rewritten by
    list_reduce — the same left-to-right non-overlapping fold the Spark
    side runs). Shared by q_bpe_train (emits the merge table) and
    q_bpe_pipeline (applies m_1..m_k to the corpus)."""
    sql = """
    WITH w0 AS (
        SELECT array_to_string(list_transform(generate_series(1, len(w)),
                   i -> substr(w, CAST(i AS INT), 1)), '·') AS sym,
               CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 2 GROUP BY sym
    )"""
    for i in range(1, k + 1):
        sql += f""",
    p{i} AS (
        SELECT s[CAST(i AS INT)] AS x, s[CAST(i AS INT) + 1] AS y,
               CAST(SUM(wc) AS BIGINT) AS cnt
        FROM (SELECT string_split(sym, '·') AS s, wc FROM w{i - 1}),
             UNNEST(generate_series(1, len(s) - 1)) AS t(i)
        GROUP BY x, y
    ),
    m{i} AS (SELECT x, y, cnt FROM p{i} ORDER BY cnt DESC, x ASC, y ASC LIMIT 1)"""
        if i < k:
            sql += f""",
    w{i} AS (
        SELECT list_reduce(string_split(w{i - 1}.sym, '·'), (acc, s) ->
                   CASE WHEN regexp_extract(acc, '[^·]*$') = m{i}.x
                             AND s = m{i}.y
                        THEN acc || m{i}.y ELSE acc || '·' || s END) AS sym,
               wc
        FROM w{i - 1} CROSS JOIN m{i}
    )"""
    return sql


def _bpe_train_sql(k: int = _BPE_TRAIN_K) -> str:
    union = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, x, y, x || y AS merged, cnt FROM m{i}"
        for i in range(1, k + 1)
    )
    return _bpe_train_ctes(k) + f"\n    SELECT * FROM ({union}) ORDER BY rank ASC"


def _bpe_spelled():
    """Char-by-char spelling of a word column `w` into '·'-joined symbols
    — the census key every merge-family trainer aggregates on. Built
    lazily: F.expr needs an active session, so no module-import-time
    column objects (the _registry modules import before any session)."""
    return F.expr(
        "array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), '·')"
    )


def _bpe_census(spark, sf):
    """ONE corpus scan → the (sym, wc) word census training runs on.

    Aggregates on the RAW word and spells the DISTINCT words afterwards
    (round-12, guide §2.3): spelling is injective (the '·'-join of
    single chars reconstructs uniquely from the even positions), so the
    census is bit-identical to spelling first — but the per-token
    transform/array_join now runs |distinct words| times instead of
    |corpus tokens| times, and the aggregation shuffles the raw word
    (~half the bytes of its spelled form)."""
    d = T(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select(_bpe_spelled().alias("sym"), "wc")
    )


def _bpe_train_merges(spark, sf, k: int = _BPE_TRAIN_K):
    """The iterative training loop (census → k × [pair count → 1-row
    argmax collect → fold rewrite]); returns [(rank, x, y, merged, cnt)].
    Shared by q_bpe_train and q_bpe_pipeline."""
    return _bpe_train_from_census(_bpe_census(spark, sf), k)


#: per-iteration pair-count argmax over a census temp view — ONE SQL
#: statement per iteration (one py4j round trip, one action; round-11:
#: the DataFrame-built form spent ~0.15s/iteration constructing and
#: re-analyzing the same plan column object by column object)
_PAIR_ARGMAX_SQL = """
SELECT p.x AS x, p.y AS y, SUM(wc) AS cnt FROM (
  SELECT explode(transform(sequence(1, size(split(sym, '·')) - 1),
      i -> struct(split(sym, '·')[i-1] AS x, split(sym, '·')[i] AS y))) AS p, wc
  FROM {view} WHERE size(split(sym, '·')) >= 2)
GROUP BY p.x, p.y
ORDER BY cnt DESC, x ASC, y ASC LIMIT 1
"""


@contextmanager
def _loop_conf(spark, width: int):
    """Pin the iteration-loop shuffle width and switch AQE off for the
    scope, restoring both on exit — the shared conf discipline of the
    census/vocabulary-bounded trainer loops (see _merge_loop_env for the
    rationale and measurements). Set+restore in one context manager so
    they cannot be separated (round-11 advice)."""
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(max(1, width)))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


class _MergeLoopState:
    """Mutable holder for the merge loops' persist-chain: the loop body
    rebinds ``census``/``pending`` as it rewrites, and the enclosing
    context manager's cleanup sees whichever frames are live when the
    loop exits — normally, early, or by exception."""

    __slots__ = ("census", "pending")

    def __init__(self, census):
        self.census = census
        self.pending = None


@contextmanager
def _merge_loop_env(census):
    """Shared environment for the census merge-loop trainers: persist the
    census, register it under a fresh temp-view name, and derive the
    loop's shuffle width from the census's own cached width. Iteration
    shuffles carry (symbol-pair, partial-count) rows — bounded by the
    census, never the corpus — so spark.sql.shuffle.partitions for the
    loop follows the census's partition count (guide §2: scale-adaptive,
    at fixture scale 1 instead of 32 near-empty reducers per stage, at
    corpus scale the census's own AQE-coalesced width). AQE itself is
    OFF inside the loop (the classifier-loop discipline): the width is
    already pinned to the census's, so there is nothing for AQE to
    re-plan at any scale, and its per-statement query-stage
    re-optimization measured ~15-30 ms/iteration of pure overhead
    (round-12, interleaved A/B). Set and restore live in ONE context
    manager so the restore cannot be separated from the set (round-11
    advice); the session is single-threaded per the engine contract, so
    no concurrent statement observes the loop's conf."""
    from uuid import uuid4

    spark = census.sparkSession
    census = census.persist()
    view = f"merge_census_{uuid4().hex[:12]}"
    census.createOrReplaceTempView(view)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    census.count()  # materialize: the loop and the width read the cache
    st = _MergeLoopState(census)
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(1, census.rdd.getNumPartitions())),
        )
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        yield spark, st, view
    finally:
        if st.pending is not None:
            st.pending.unpersist()
        st.census.unpersist()
        spark.catalog.dropTempView(view)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def _bpe_train_from_census(census, k: int = _BPE_TRAIN_K):
    """Training FROM an explicit (sym, wc) census — the entry point that
    makes the census a swappable input: q_bpe_train scans the corpus,
    q_bpe_retrain_incremental reads a maintained census STATE, and both
    run this identical loop (so the two keys can only differ if their
    censuses differ)."""
    merges: list[tuple[int, str, str, str, int]] = []
    # the context manager wraps the whole loop: the TAIL census of the
    # persist-chain must not outlive the call. Relying on the caller's
    # clearCache() (bench.py does, parity.py and library consumers don't)
    # leaks one cached census per invocation in a long-lived session
    # (round-7 verdict finding #1). The cleanup sees whichever census is
    # current when the loop exits — normally, early, or by exception.
    with _merge_loop_env(census) as (spark, st, view):
        for rank in range(1, k + 1):
            # this statement reads the CURRENT census view; running it
            # also materializes a just-rewritten census's cache, after
            # which the parent from the previous iteration can go — the
            # deferred unpersist replaces the old per-iteration count()
            # materializer job
            top = spark.sql(_PAIR_ARGMAX_SQL.format(view=view)).collect()
            if st.pending is not None:
                st.pending.unpersist()
                st.pending = None
            if not top:  # census fully merged to single symbols — stop early
                break
            x, y, cnt = top[0]["x"], top[0]["y"], top[0]["cnt"]
            merges.append((rank, x, y, x + y, int(cnt)))
            if rank == k:
                break  # last iteration's rewrite is never observed
            s = F.split("sym", "·")
            fold = F.aggregate(
                F.slice(s, F.lit(2), F.size(s) - 1),
                F.element_at(s, 1),
                lambda acc, el: F.when(
                    (F.regexp_extract(acc, "[^·]*$", 0) == F.lit(x))
                    & (el == F.lit(y)),
                    F.concat(acc, F.lit(y)),
                ).otherwise(F.concat(acc, F.lit("·"), el)),
            )
            # persist each rewritten census and drop its parent: without
            # this, iteration i's pair count replays ALL i-1 interpreted
            # string folds from the base census (lazy lineage), so the loop
            # is quadratic in k in fold work — measured 10.4 -> 4.3s at
            # sf0.1 (best-of-3, idle box). The perf-lessons persist rule:
            # iterations keep their own materialization.
            st.pending = st.census
            st.census = st.pending.select(fold.alias("sym"), "wc").persist()
            st.census.createOrReplaceTempView(view)
    return merges


@q("q_bpe_train", _bpe_train_sql())
def q_bpe_train(spark, sf):
    # FULL iterative BPE training (Sennrich et al. 2016) — the multi-step
    # loop q_bpe_pairs is one iteration of: spell every word into symbols,
    # then k=8 times (count adjacent symbol pairs weighted by word
    # frequency → merge the most frequent pair everywhere → repeat),
    # emitting the rank-ordered merge table that q_bpe_apply consumes
    # (composed end to end in tests/test_curation.py). Merging is the
    # canonical left-to-right non-overlapping single pass ('a a a a' →
    # 'aa aa'), expressed as a string fold whose merge case is pure
    # append: when the accumulator's LAST symbol is x and the next symbol
    # is y, appending y (no separator) yields the merged token — so both
    # engines run the identical fold (F.aggregate / list_reduce) and the
    # argmax sequence is engine-exact (integer counts, (cnt desc, x, y)
    # ties). Oracle = k unrolled chained CTEs (_bpe_train_sql).
    #
    # Scale: ONE corpus scan builds the word census (vocabulary-sized,
    # partial-combined — the classic trick that makes corpus-scale BPE
    # tractable: all k iterations run over DISTINCT words × frequency,
    # never the corpus); each iteration is a census-sized pair count whose
    # shuffle carries (pair, partial sum) ≤ alphabet² keys + a 1-row
    # argmax collect (bounded driver pick, the q_select_cover discipline).
    # Inherently sequential in k, like all BPE trainers.
    merges = _bpe_train_merges(spark, sf)
    return spark.createDataFrame(
        merges, "rank bigint, x string, y string, merged string, cnt bigint"
    ).orderBy("rank")


def _bpe_pipeline_sql(k: int = _BPE_TRAIN_K) -> str:
    """Train-then-apply composed in ONE statement: the k-merge training
    chain (_bpe_train_ctes) feeds a corpus-wide APPLY whose replace chain
    takes the merge pairs as CORRELATED COLUMNS (m_i 1-row relations),
    then per-language subword accounting. Each m_i joins as LEFT JOIN ON
    TRUE with the pair strings COALESCEd to a never-matching chr(0)
    sentinel, so a corpus whose training runs DRY before k merges keeps
    its document rows and the dead replace steps become no-ops — exactly
    the Spark side's early-stopping truncation (_bpe_train_merges stops,
    bpe_apply_cols folds in only the real merges). A CROSS JOIN here
    would yield ZERO oracle rows on degenerate corpora (round-7 advice;
    the q_bpe_curve HAVING guard fixed the same hazard)."""
    return _bpe_train_ctes(k) + _merge_apply_sql(k)


def _merge_apply_sql(k: int) -> str:
    """The APPLY tail shared by q_bpe_pipeline and q_wordpiece_pipeline:
    both trainers emit m_1..m_k 1-row merge relations, so one replace
    chain + per-language accounting serves both families — the shared-CTE
    discipline (twins cannot drift)."""
    merged = "regexp_replace(w, '(.)', '\\1·', 'g')"
    for i in range(1, k + 1):
        merged = (
            f"replace({merged}, COALESCE(m{i}.x || '·' || m{i}.y, chr(1)),"
            f" COALESCE(m{i}.x || m{i}.y, chr(1)))"
        )
    subword = f"len(list_filter(string_split({merged}, '·'), x -> x <> ''))"
    crosses = " ".join(f"LEFT JOIN m{i} ON TRUE" for i in range(1, k + 1))
    return f""",
    app AS (
        SELECT d.lang,
               len(list_filter(string_split(d.text, ' '), w -> w <> ''))
                   AS n_words,
               COALESCE(list_sum(list_transform(
                   list_filter(string_split(d.text, ' '), w -> w <> ''),
                   w -> {subword})), 0) AS n_subwords
        FROM documents d {crosses}
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_subwords) AS BIGINT) AS n_subwords
    FROM app GROUP BY lang
    """


@q("q_bpe_pipeline", _bpe_pipeline_sql())
def q_bpe_pipeline(spark, sf):
    # the COMPOSED tokenizer pipeline — train BPE on the corpus, then
    # tokenize the SAME corpus with the trained merges, reporting
    # per-language word vs subword counts (the compression the tokenizer
    # actually achieves — the number a tokenizer-budget decision reads).
    # Spark: the k-merge training loop (_bpe_train_merges, census-sized),
    # then the trained table fed straight into the q_bpe_apply expression
    # builder (bpe_apply_cols — merges folded in as literals, map-only
    # codegen'd HOFs over one corpus scan). Oracle: the SAME train CTEs
    # plus a replace chain taking the merge pairs as correlated columns —
    # the whole train→apply dataflow hash-checked end to end.
    #
    # Scale: training cost is the census loop (q_bpe_train); apply is one
    # map-only corpus pass at scan speed (the merge table broadcasts as
    # expression literals, the way real tokenizers ship merge files).
    merges = _bpe_train_merges(spark, sf)
    n_words, n_subwords = bpe_apply_cols([(x, y) for _, x, y, _, _ in merges])
    d = T(spark, sf, "documents")
    return (
        d.select("lang", n_words.alias("nw"), n_subwords.alias("ns"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nw").cast("bigint").alias("n_words"),
            F.sum("ns").cast("bigint").alias("n_subwords"),
        )
    )


# ----------------------------------------------------- n-gram LM training ---
@q(
    "q_ngram_lm",
    """
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    bi AS (
        SELECT ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT) + 1] AS w2
        FROM tok, UNNEST(generate_series(1, len(ts) - 1)) AS t(i)
        WHERE len(ts) >= 2
    ),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM bi GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w2) AS vsz FROM bi),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bi GROUP BY w1, w2)
    SELECT w1, w2, CAST(n12 AS BIGINT) AS n12,
           ROUND((n12 + 0.5) / (n1 + 0.5 * vsz), 6) AS p_smooth
    FROM c12 JOIN c1 USING (w1) CROSS JOIN v
    WHERE n12 >= 5
    """,
)
def q_ngram_lm(spark, sf):
    # Bigram language-model estimation with add-k smoothing (k=0.5):
    # P(w2|w1) = (c12 + k) / (c1 + k·|V|) — the classic n-gram LM
    # training step (the bigram big sibling of the UNIGRAM freq table
    # q_text_logprob scores with, which since round 10 serves from the
    # store as q_logprob_apply_artifact). Counts are integers, the smoothed
    # probability is one double division of exactly-representable values,
    # so ROUND(6) is stable across engines.
    #
    # Scale: one explode to bigrams feeding THREE count aggregations that
    # all partial-combine; the context counts and vocabulary scalar join
    # back as broadcasts, so corpus text is read once and the only
    # data-sized shuffle carries (w1, w2, count) partials. The n12 >= 5
    # support cut is the standard LM pruning knob (and keeps the declared
    # result compact).
    d = T(spark, sf, "documents")
    toks = d.select(F.split("text", " ").alias("ts")).filter(F.size("ts") >= 2)
    bi = toks.select(
        F.explode(
            F.expr("transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] as w1, ts[i] as w2))")
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    v = bi.agg(F.countDistinct("w2").alias("vsz"))
    return (
        c12.filter(F.col("n12") >= 5)
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.col("n12").cast("bigint").alias("n12"),
            F.round(
                (F.col("n12") + 0.5) / (F.col("n1") + 0.5 * F.col("vsz")), 6
            ).alias("p_smooth"),
        )
    )


# ------------------------------------------------------------ A/B stats ----
@q(
    "q_abtest_stats",
    """
    WITH base AS (
        SELECT event_type, CAST(user_id % 2 AS INT) AS arm, value
        FROM events WHERE value IS NOT NULL
    ),
    s AS (
        SELECT event_type, arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(38,6))) AS sm,
               SUM(CAST(value * value AS DECIMAL(38,6))) AS sq
        FROM base GROUP BY event_type, arm
    )
    SELECT a.event_type,
           a.n AS n_a, b.n AS n_b,
           ROUND(CAST(a.sm AS DOUBLE) / a.n, 6) AS mean_a,
           ROUND(CAST(b.sm AS DOUBLE) / b.n, 6) AS mean_b,
           ROUND(CAST(b.sm AS DOUBLE) / b.n - CAST(a.sm AS DOUBLE) / a.n, 6)
               AS lift,
           ROUND(
               (CAST(b.sm AS DOUBLE) / b.n - CAST(a.sm AS DOUBLE) / a.n)
               / sqrt(
                   ((CAST(a.sq AS DOUBLE)
                     - CAST(a.sm AS DOUBLE) * CAST(a.sm AS DOUBLE) / a.n)
                    / (a.n - 1)) / a.n
                   + ((CAST(b.sq AS DOUBLE)
                       - CAST(b.sm AS DOUBLE) * CAST(b.sm AS DOUBLE) / b.n)
                      / (b.n - 1)) / b.n
               ), 4) AS t_stat
    FROM s a JOIN s b USING (event_type)
    WHERE a.arm = 0 AND b.arm = 1 AND a.n > 1 AND b.n > 1
    """,
)
def q_abtest_stats(spark, sf):
    # A/B experiment readout (Welch's t): users split into two arms by
    # id parity, per event_type the arm means, lift, and t-statistic.
    # The float-parity discipline that makes a STATISTICAL query
    # hash-checkable: every per-arm moment (n, Σx, Σx²) is an exact
    # DECIMAL aggregate — order-independent — and the t formula is one
    # identical double expression tree over those exact inputs in both
    # engines; ROUND only at the end.
    #
    # Scale: one hash aggregation over (metric, arm) — six numbers per
    # group — then a self-join of the tiny per-arm stats table. The raw
    # events never shuffle twice; this is the moment-sketch pattern every
    # experimentation platform runs at 100 TB.
    ev = T(spark, sf, "events").filter(F.col("value").isNotNull())
    s = (
        ev.select(
            "event_type",
            (F.col("user_id") % 2).cast("int").alias("arm"),
            "value",
        )
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sm"),
            F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)")).alias("sq"),
        )
    )
    a = s.filter((F.col("arm") == 0) & (F.col("n") > 1)).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("sm").cast("double").alias("sm_a"),
        F.col("sq").cast("double").alias("sq_a"),
    )
    b = s.filter((F.col("arm") == 1) & (F.col("n") > 1)).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("sm").cast("double").alias("sm_b"),
        F.col("sq").cast("double").alias("sq_b"),
    )
    mean_a = F.col("sm_a") / F.col("n_a")
    mean_b = F.col("sm_b") / F.col("n_b")
    var_a = (F.col("sq_a") - F.col("sm_a") * F.col("sm_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("sq_b") - F.col("sm_b") * F.col("sm_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    return a.join(b, "event_type").select(
        "event_type",
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(mean_b - mean_a, 6).alias("lift"),
        F.round(
            (mean_b - mean_a)
            / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
            4,
        ).alias("t_stat"),
    )


# ------------------------------------------------- sequence patterns -------
@q(
    "q_seq_pattern",
    """
    WITH seq AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               string_agg(event_type, '>' ORDER BY CAST(ts AS TIMESTAMP),
                          event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST((length(s) - length(replace(s, 'error>error', '')))
                // length('error>error') AS BIGINT) AS n_error_bursts,
           CAST((length(s) - length(replace(s, 'view>click>purchase', '')))
                // length('view>click>purchase') AS BIGINT) AS n_funnel_runs
    FROM seq
    """,
)
def q_seq_pattern(spark, sf):
    # sequence-pattern matching over per-user event strings — the
    # MATCH_RECOGNIZE analog Spark lacks as syntax, expressed as encode +
    # string scan: each user's type sequence (total (ts,id) order) becomes
    # one delimited string; patterns ('error>error' bursts, the
    # view>click>purchase funnel) count by non-overlapping replace-length
    # arithmetic — pure string ops, so both engines count identically with
    # zero regex-dialect risk. Complements q_events_transitions (1-step
    # Markov) and q_funnel (stage survivors) with arbitrary-length motifs.
    #
    # Scale: ONE shuffle by user (the sort_array(collect_list) aggregate
    # partial-combines); state per key is the user's own sequence string —
    # session-bounded, the same constraint every sessionization op has.
    ev = T(spark, sf, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "event_type"
    )
    seq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("s"),
    )

    def n_occ(pat: str):
        return (
            (F.length("s") - F.length(F.replace(F.col("s"), F.lit(pat))))
            / F.lit(len(pat))
        ).cast("bigint")

    return seq.select(
        "user_id",
        "n_events",
        n_occ("error>error").alias("n_error_bursts"),
        n_occ("view>click>purchase").alias("n_funnel_runs"),
    )


# ---------------------------------------------------- correlation matrix ---
@q(
    "q_agg_corr_matrix",
    """
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sq,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS se,
               CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sd,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sqq,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS see,
               CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sdd,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sqe,
               CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sqd,
               CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sed
        FROM lineitem
    )
    SELECT 'l_quantity' AS var_x, 'l_extendedprice' AS var_y,
           ROUND((n * sqe - sq * se)
                 / sqrt((n * sqq - sq * sq) * (n * see - se * se)), 6) AS corr
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           ROUND((n * sqd - sq * sd)
                 / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd)), 6)
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           ROUND((n * sed - se * sd)
                 / sqrt((n * see - se * se) * (n * sdd - sd * sd)), 6)
    FROM m
    """,
)
def q_agg_corr_matrix(spark, sf):
    # pairwise Pearson correlation matrix over the fact table's numeric
    # columns. Built-in corr() accumulates co-moments in float — summation
    # order moves the result across engines; here every moment (n, Σx,
    # Σxy, Σx²) is an exact DECIMAL aggregate and the correlation formula
    # is one identical double expression over those exact inputs — the
    # same moment-sketch discipline as q_abtest_stats.
    #
    # Scale: ONE scan, one 10-number aggregate (partial-combined to a
    # single row), then a 3-row projection. A k-column matrix is k(k+1)/2
    # moment columns in the same single pass — never k² scans.
    li = T(spark, sf, "lineitem")

    def dsum(expr):
        return F.sum(expr.cast("decimal(38,6)")).cast("double")

    qn, ep, dc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(qn).alias("sq"),
        dsum(ep).alias("se"),
        dsum(dc).alias("sd"),
        dsum(qn * qn).alias("sqq"),
        dsum(ep * ep).alias("see"),
        dsum(dc * dc).alias("sdd"),
        dsum(qn * ep).alias("sqe"),
        dsum(qn * dc).alias("sqd"),
        dsum(ep * dc).alias("sed"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        n = F.col("n")
        return F.round(
            (n * F.col(sxy) - F.col(sx) * F.col(sy))
            / F.sqrt(
                (n * F.col(sxx) - F.col(sx) * F.col(sx))
                * (n * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            6,
        )

    wide = m.select(
        corr("sqe", "sq", "se", "sqq", "see").alias("c1"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("c2"),
        corr("sed", "se", "sd", "see", "sdd").alias("c3"),
    )
    # unpivot via stack: the 1-row aggregate is computed ONCE (a 3-way
    # union of projections would re-derive it per branch)
    return wide.selectExpr(
        "stack(3, "
        "'l_quantity', 'l_extendedprice', c1, "
        "'l_quantity', 'l_discount', c2, "
        "'l_extendedprice', 'l_discount', c3) AS (var_x, var_y, corr)"
    )


# -------------------------------------------------------- graph triangles --
@q(
    "q_graph_triangles",
    """
    WITH s AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
    e AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM s a JOIN s b ON a.ok = b.ok AND a.p < b.p
    ),
    deg AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        GROUP BY x
    ),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3
             ON e3.u = e1.u AND e3.v = e2.v
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
               CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
        FROM deg
    ),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
    SELECT n_vertices, n_edges, n_wedges, t AS n_triangles,
           ROUND(CAST(3 * t AS DOUBLE) / n_wedges, 6) AS gcc
    FROM tot, ne, tri
    """,
)
def q_graph_triangles(spark, sf):
    # triangle counting + global clustering coefficient over the part
    # co-occurrence graph (parts linked when they appear in the same
    # order). DEGREE-ORDERED + EDGE-CENTRIC: each undirected edge points
    # from its lower-(degree, id) endpoint to the higher one, out-
    # neighborhoods are collected into per-vertex adjacency arrays, and
    # each edge (u→v) contributes |N+(u) ∩ N+(v)| — a triangle (a,b,c)
    # with rank a<b<c is counted exactly once, at edge (a→b), so the
    # total equals the oracle's simpler id-ordered 3-way-join enumeration.
    #
    # Scale: two properties make this survive 100 TB. (1) Degree
    # orientation bounds every out-neighborhood by O(√m) regardless of
    # raw degree skew — a hot part in every order cannot square. (2) The
    # edge-centric form NEVER materializes wedges: the O(m^1.5) candidate
    # set of the join formulation (measured 13.3s / 20M wedge rows at
    # sf0.1) collapses into per-row array_intersect over two ≤O(√m)
    # arrays (4.4s) — shuffle volume is the adjacency table (Σ outdeg =
    # m entries), intermediate rows stay at m. All joins are equi-joins
    # on vertex ids; the wedge denominator comes from the degree table.
    # The edge list feeds four consumers but is NOT persisted: AQE's
    # runtime ReuseExchange already dedupes the identical subtrees, and a
    # persist() was re-measured 3× SLOWER (9.9s vs 3.0s — cache build
    # forces an extra materialization and loses AQE across the cache
    # boundary; contrast pagerank, where persist wins because
    # ITERATIONS, not DAG branches, reuse it).
    li = T(spark, sf, "lineitem")
    # Edge build WITHOUT a self-join: collect each order's part set into a
    # sorted array, then generate the ordered pairs map-side — posexplode
    # picks u, slice(ps, i+2, …) yields every later element as v. One
    # groupBy(ok) shuffle replaces the self-join's two shuffles + hash
    # build, and pair generation happens inside Generate with no join at
    # all (measured 4.8s → 3.0s full-query at sf0.1 vs the
    # shuffle_hash self-join). collect_set dedupes parts within an order,
    # so no pre-distinct is needed — the fact shuffles exactly ONCE here.
    # (A .distinct() before this groupBy would be removed by Catalyst's
    # RemoveRedundantAggregates anyway — collect_set is duplicate-
    # agnostic — so writing it direct documents the plan that actually
    # runs rather than relying on the rewrite.) Per-order arrays are
    # basket-sized (lineitems per order), not degree-sized, so no skew
    # hazard; the O(basket²) pair fan-out is the same row count the join
    # produced.
    g = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    e = (
        g.select(F.posexplode("ps").alias("i", "u"), "ps")
        .select(
            "u",
            F.explode(
                F.slice(F.col("ps"), F.col("i") + F.lit(2), F.size("ps"))
            ).alias("v"),
        )
        .distinct()
    )
    # shuffle_hash hints on the remaining joins: edge-sized inputs whose
    # SMJ sort dominates — hash build sides measured 13% faster at sf0.1,
    # exact same rows
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient each edge from lower (deg, id) to higher (deg, id)
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du.hint("shuffle_hash"), "u").join(dv.hint("shuffle_hash"), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    de = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    adj = de.groupBy("src").agg(F.collect_list("dst").alias("nbr"))
    tri = (
        de.join(
            adj.select(F.col("src"), F.col("nbr").alias("nbr_u")).hint(
                "shuffle_hash"
            ),
            "src",
        )
        .join(
            adj.select(F.col("src").alias("dst"), F.col("nbr").alias("nbr_v")).hint(
                "shuffle_hash"
            ),
            "dst",
            "left",  # top-ranked vertices have no out-neighbors
        )
        .select(
            F.size(
                F.array_intersect(
                    F.col("nbr_u"), F.coalesce(F.col("nbr_v"), F.array())
                )
            ).alias("c")
        )
        .agg(F.sum("c").alias("t"))
    )
    tot = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.expr("(d * (d - 1)) div 2")).alias("n_wedges"),
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tot.crossJoin(ne)
        .crossJoin(tri)
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            F.col("t").alias("n_triangles"),
            F.round((F.lit(3) * F.col("t")).cast("double") / F.col("n_wedges"), 6).alias(
                "gcc"
            ),
        )
    )


# ----------------------------------------------------------- drift (PSI) ---
_PSI_BINS = 10
_PSI_LO, _PSI_HI = 0.0, 500.0
_PSI_SPLIT = "2024-01-16"  # reference period before, current period after
_PSI_B = _PSI_BINS + 2     # smoothing denominator: interior + 2 overflow bins


@q(
    "q_drift_psi",
    f"""
    WITH binned AS (
        SELECT event_type,
               CASE WHEN value < {_PSI_LO} THEN 0
                    WHEN value >= {_PSI_HI} THEN {_PSI_BINS + 1}
                    ELSE CAST(FLOOR((value - {_PSI_LO})
                              / (({_PSI_HI} - {_PSI_LO}) / {_PSI_BINS}))
                              AS BIGINT) + 1 END AS bucket,
               CAST(ts AS TIMESTAMP) < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
        FROM events
    ),
    counts AS (
        SELECT event_type, bucket,
               CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
               CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
        FROM binned GROUP BY event_type, bucket
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(n_ref) AS BIGINT) AS t_ref,
               CAST(SUM(n_cur) AS BIGINT) AS t_cur
        FROM counts GROUP BY event_type
    ),
    terms AS (
        SELECT c.event_type, t_ref, t_cur,
               CAST(
                   (CAST(n_cur + 1 AS DOUBLE) / (t_cur + {_PSI_B})
                    - CAST(n_ref + 1 AS DOUBLE) / (t_ref + {_PSI_B}))
                   * ln((CAST(n_cur + 1 AS DOUBLE) / (t_cur + {_PSI_B}))
                        / (CAST(n_ref + 1 AS DOUBLE) / (t_ref + {_PSI_B})))
               AS DECIMAL(38, 18)) AS term
        FROM counts c JOIN tot t ON c.event_type = t.event_type
    )
    SELECT event_type, t_ref AS n_ref, t_cur AS n_cur,
           ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi
    FROM terms GROUP BY event_type, t_ref, t_cur
    """,
)
def q_drift_psi(spark, sf):
    # data-drift monitor: Population Stability Index of the value
    # distribution per event type, reference period (before the split
    # date) vs current. Equi-width bins with overflow buckets (mirroring
    # q_agg_histogram's exact float bucketing), Laplace-smoothed
    # proportions so empty-on-one-side bins stay finite. Every float
    # flows from integer counts through an identical expression tree;
    # per-bin terms are summed as DECIMAL(38,18) so the reduction is
    # order-independent — PSI is hash-exact, not approximately equal.
    #
    # Scale: ONE pass over events into a (type × bucket × period) count
    # cube — a map-side-combinable aggregation with ≤ types·(bins+2) rows
    # of state; totals and PSI terms are computed on that tiny cube. This
    # is the shape of a production drift monitor: the fixed bin edges are
    # frozen from the reference period, so the daily check is a single
    # aggregation, never a re-sort of history.
    ev = T(spark, sf, "events")
    binned = ev.select(
        "event_type", drift_bucket().alias("bucket"), drift_is_ref().alias("is_ref")
    )
    counts = binned.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
    )
    return psi_from_counts(counts)


def drift_bucket(value_col: str = "value"):
    """The frozen equi-width PSI bin (0 / interior 1..n / n+1 overflow)."""
    width = (_PSI_HI - _PSI_LO) / _PSI_BINS
    return (
        F.when(F.col(value_col) < _PSI_LO, F.lit(0))
        .when(F.col(value_col) >= _PSI_HI, F.lit(_PSI_BINS + 1))
        .otherwise(
            F.floor((F.col(value_col) - F.lit(_PSI_LO)) / F.lit(width)).cast("bigint")
            + F.lit(1)
        )
        .cast("bigint")
    )


def drift_is_ref(ts_col: str = "ts"):
    """Reference-period predicate (before the frozen split date)."""
    return F.col(ts_col) < F.lit(_PSI_SPLIT).cast("timestamp_ntz")


def psi_from_counts(counts):
    """PSI per event type from a (event_type, bucket, n_ref, n_cur) count
    cube — the same final formula whether the cube came from one batch
    pass (q_drift_psi) or was folded incrementally by the streaming
    refresh (tests/test_streaming.py)."""
    tot = counts.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_cur = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + _PSI_B)
    p_ref = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + _PSI_B)
    terms = counts.join(tot, "event_type").select(
        "event_type",
        "t_ref",
        "t_cur",
        ((p_cur - p_ref) * F.log(p_cur / p_ref)).cast("decimal(38,18)").alias("term"),
    )
    return terms.groupBy("event_type", "t_ref", "t_cur").agg(
        F.round(F.sum("term").cast("double"), 6).alias("psi")
    ).select(
        "event_type",
        F.col("t_ref").alias("n_ref"),
        F.col("t_cur").alias("n_cur"),
        "psi",
    )


# ------------------------------------------------------------- BPE apply ---
#: fixed merge table (rank order matters — BPE applies merges in sequence);
#: pairs over the corpus alphabet, '·' is the intra-word separator
_BPE_MERGES = (("t", "h"), ("th", "e"), ("e", "r"), ("a", "n"))


@q(
    "q_bpe_apply",
    f"""
    WITH docs AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(toks, w ->
               len(list_filter(string_split(
                   replace(replace(replace(replace(
                       regexp_replace(w, '(.)', '\\1·', 'g'),
                       't·h', 'th'), 'th·e', 'the'), 'e·r', 'er'), 'a·n', 'an'),
                   '·'), x -> x <> ''))
           )) AS BIGINT) AS n_subwords
    FROM docs
    """,
)
def q_bpe_apply(spark, sf):
    # BPE tokenizer APPLY (inference): each word is spelled into '·'-
    # separated symbols, then a fixed rank-ordered merge table is applied
    # (leftmost-first, the BPE convention — SQL REPLACE's left-to-right
    # non-overlapping scan in both engines) and the resulting subword
    # count per document is emitted. The counterpart of q_bpe_pairs
    # (which TRAINS the merge statistics): together they close the
    # tokenizer loop — count pairs, pick merges, apply them.
    #
    # Scale: map-only — zero shuffles, zero joins; every document is
    # tokenized independently inside whole-stage-codegen'd array HOFs
    # (the merge table is folded into the expression tree as literals,
    # the way a real tokenizer broadcasts its merge file). At 100 TB this
    # runs at scan speed; the downstream n_subwords feeds q_text_pack's
    # budget packing.
    d = T(spark, sf, "documents")
    n_words, n_subwords = bpe_apply_cols(_BPE_MERGES)
    return d.select(
        "doc_id", n_words.alias("n_words"), n_subwords.alias("n_subwords")
    )


def bpe_apply_cols(merges):
    """The q_bpe_apply expression builder, parameterized by an arbitrary
    rank-ordered merge table so q_bpe_train's output can be APPLIED (the
    train→apply composition is pinned in tests/test_curation.py).
    Returns (n_words, n_subwords) columns over a `text` column — all
    codegen'd HOFs. The merge table enters as F.lit VALUES, never
    f-string fragments (round-7 self-review: the earlier injection-style
    builder ASSERTED alnum merges, so a corpus whose trained pairs carry
    quotes/punctuation would crash the Spark side while the oracle kept
    running — divergence by error; literals make any merge pair safe)."""

    def subwords(w):
        spelled = F.regexp_replace(w, "(.)", "$1·")
        for x, y in merges:
            spelled = F.replace(
                spelled, F.lit(f"{x}·{y}"), F.lit(f"{x}{y}")
            )
        return F.size(
            F.filter(F.split(spelled, "·"), lambda t: t != "")
        ).cast("bigint")

    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n_words = F.size(words).cast("bigint")
    n_subwords = F.aggregate(
        F.transform(words, subwords),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    ).cast("bigint")
    return n_words, n_subwords


# ------------------------------------------------- degree distribution -----
@q(
    "q_graph_degree_stats",
    """
    WITH s AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
    e AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM s a JOIN s b ON a.ok = b.ok AND a.p < b.p
    ),
    deg AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        GROUP BY x
    )
    SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS lb,
           CAST(COUNT(*) AS BIGINT) AS n_vertices,
           MIN(d) AS min_deg, MAX(d) AS max_deg,
           CAST(SUM(d) AS BIGINT) AS sum_deg
    FROM deg GROUP BY lb
    """,
)
def q_graph_degree_stats(spark, sf):
    # degree-distribution census of the part co-occurrence graph: vertices
    # histogrammed into power-of-two degree buckets (⌊log2 d⌋ computed as
    # the binary-string length — pure INTEGER semantics, no float log at
    # bucket boundaries). This is the pre-flight read for every graph
    # op: whether the tail is heavy decides salting for q_dedup_clusters'
    # propagation joins and confirms why q_graph_triangles' degree
    # orientation matters (max_deg in the top bucket vs the √m bound).
    #
    # Scale: edge building is the shared equi-join path; the census
    # itself is two map-combinable aggregations (degree, then bucket) —
    # shuffle state is one row per vertex then one per bucket (~32 rows
    # total regardless of graph size).
    li = T(spark, sf, "lineitem")
    s = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = s.alias("a"), s.alias("b")
    e = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lb = (F.length(F.bin(F.col("d"))) - 1).cast("bigint")
    return deg.groupBy(lb.alias("lb")).agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.min("d").alias("min_deg"),
        F.max("d").alias("max_deg"),
        F.sum("d").alias("sum_deg"),
    )


# ------------------------------------------------------ attribution --------
_ATTR_TOUCHES = ("view", "click")


@q(
    "q_attribution_last_touch",
    f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
        FROM events
    ),
    la AS (
        SELECT *,
            last_value(CASE WHEN event_type IN {_ATTR_TOUCHES!r}
                            THEN event_id END IGNORE NULLS) OVER w AS touch_id,
            last_value(CASE WHEN event_type IN {_ATTR_TOUCHES!r}
                            THEN event_type END IGNORE NULLS) OVER w AS touch_type,
            last_value(CASE WHEN event_type IN {_ATTR_TOUCHES!r}
                            THEN us END IGNORE NULLS) OVER w AS touch_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, us AS purchase_us,
           touch_id AS touch_event_id, touch_type,
           us - touch_us AS gap_us
    FROM la WHERE event_type = 'purchase'
    """,
)
def q_attribution_last_touch(spark, sf):
    # last-touch conversion attribution: each purchase credits the user's
    # most recent preceding view/click (strictly before, (ts, event_id)
    # total order). The three filled columns CASE-null the same rows, so
    # they always describe ONE touch row — no join back. Purchases with
    # no prior touch keep NULL credit (organic conversions stay visible).
    #
    # Scale: the as-of idiom's shape — one user-partitioned running
    # window over the event stream, no self-join, state per task bounded
    # by one user's history; the µs integer timeline keeps gap arithmetic
    # exact cross-engine.
    ev = T(spark, sf, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*_ATTR_TOUCHES)
    la = ev.select(
        "*",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("us")), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
    )
    return la.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        F.col("touch_id").alias("touch_event_id"),
        "touch_type",
        (F.col("us") - F.col("touch_us")).alias("gap_us"),
    )


# --------------------------------------------------------- journey paths ---
@q(
    "q_seq_trigrams",
    """
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, event_id
        FROM events
    ),
    steps AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM steps WHERE e3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path ASC LIMIT 10
    """,
)
def q_seq_trigrams(spark, sf):
    # most common 3-step user journeys: each user's event stream windowed
    # into consecutive type-trigrams (lead×2 over the (ts, event_id)
    # total order), counted globally with per-path user reach. The
    # discovery query behind funnel design — q_funnel checks a KNOWN
    # path, this surfaces the paths worth checking.
    #
    # Scale: one user-partitioned window (state = one user's stream per
    # task), then a hash aggregation on a |types|³-bounded key space that
    # partial-combines to almost nothing map-side; top-10 is TakeOrdered.
    ev = T(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("us").asc(), F.col("event_id").asc())
    steps = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        steps.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path"), "user_id"
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


# ---------------------------------------------------------- data mixing ----
_MIX_WEIGHTS = (("src0", 0.4), ("src1", 0.3), ("src2", 0.2), ("src3", 0.1))


@q(
    "q_mix_plan",
    f"""
    WITH avail AS (
        SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS avail_tokens
        FROM documents GROUP BY source
    ),
    w (source, weight) AS (
        VALUES {", ".join(f"('{s}', CAST({w} AS DOUBLE))" for s, w in _MIX_WEIGHTS)}
    ),
    caps AS (
        SELECT source, weight, avail_tokens,
               CAST(FLOOR(avail_tokens / weight) AS BIGINT) AS cap_total
        FROM avail JOIN w USING (source)
    ),
    t AS (SELECT MIN(cap_total) AS t_max FROM caps)
    SELECT source, weight, avail_tokens,
           CAST(FLOOR(weight * t_max) AS BIGINT) AS quota_tokens,
           ROUND(CAST(CAST(FLOOR(weight * t_max) AS BIGINT) AS DOUBLE)
                 / avail_tokens, 4) AS utilization
    FROM caps CROSS JOIN t
    """,
)
def q_mix_plan(spark, sf):
    # pretraining data-mixture planning: given per-source target weights,
    # the largest total token budget T is bounded by the scarcest source
    # (T = min over s of avail_s / w_s); each source's quota is then
    # floor(w_s · T) and utilization shows which source is the binding
    # constraint (=1.0) vs how much of the others goes unused. This is
    # the sizing pass run before q_sample_stratified draws the actual
    # mixture.
    #
    # Scale: one count-aggregation per source (map-combined, |sources|
    # rows of state), a broadcast join against the literal weight table,
    # and a 1-row min folded back with a broadcast cross join — plan cost
    # is independent of corpus size beyond the single token-count scan.
    d = T(spark, sf, "documents")
    avail = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("avail_tokens")
    )
    w = spark.createDataFrame(list(_MIX_WEIGHTS), "source string, weight double")
    caps = avail.join(F.broadcast(w), "source").withColumn(
        "cap_total", F.floor(F.col("avail_tokens") / F.col("weight")).cast("bigint")
    )
    t = caps.agg(F.min("cap_total").alias("t_max"))
    quota = F.floor(F.col("weight") * F.col("t_max")).cast("bigint")
    return (
        caps.crossJoin(F.broadcast(t))
        .select(
            "source",
            "weight",
            "avail_tokens",
            quota.alias("quota_tokens"),
            F.round(
                quota.cast("double") / F.col("avail_tokens"), 4
            ).alias("utilization"),
        )
    )


# ----------------------------------------------------------- winsorizing ---
_WINS_LO, _WINS_HI = 0.05, 0.95


@q(
    "q_winsorize",
    f"""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    bounds AS (
        SELECT event_type,
               MIN(CASE WHEN rn = CAST(CEIL({_WINS_LO} * n) AS BIGINT)
                        THEN value END) AS lo,
               MIN(CASE WHEN rn = CAST(CEIL({_WINS_HI} * n) AS BIGINT)
                        THEN value END) AS hi,
               CAST(MAX(n) AS BIGINT) AS n
        FROM ranked GROUP BY event_type
    ),
    clamped AS (
        SELECT r.event_type, b.n, b.lo, b.hi,
               CASE WHEN r.value < b.lo THEN 1 ELSE 0 END AS cl,
               CASE WHEN r.value > b.hi THEN 1 ELSE 0 END AS ch,
               CAST(least(greatest(r.value, b.lo), b.hi)
                    AS DECIMAL(18, 6)) AS wv,
               CAST(r.value AS DECIMAL(18, 6)) AS rv
        FROM ranked r JOIN bounds b USING (event_type)
    )
    SELECT event_type, n, ROUND(lo, 4) AS p05, ROUND(hi, 4) AS p95,
           CAST(SUM(cl) AS BIGINT) AS n_clamped_low,
           CAST(SUM(ch) AS BIGINT) AS n_clamped_high,
           ROUND(CAST(SUM(rv) AS DOUBLE) / n, 4) AS mean_raw,
           ROUND(CAST(SUM(wv) AS DOUBLE) / n, 4) AS mean_winsorized
    FROM clamped GROUP BY event_type, n, lo, hi
    """,
)
def q_winsorize(spark, sf):
    # robust-stats preprocessing: winsorize each event type's value at
    # its exact p05/p95 (DISCRETE percentiles — pure rank SELECTION over
    # the (value, event_id) total order, no interpolation arithmetic to
    # drift cross-engine), then report clamp counts and the mean shift.
    # The standard outlier-taming pass before training a quality model
    # on heavy-tailed signals; complements q_anomaly_zscore (which flags
    # rows, this fixes the distribution).
    #
    # Scale: one window shuffle keyed by event_type computes ranks and
    # group sizes together; bounds collapse to |types| rows broadcast
    # back onto the same shuffled layout; means sum in DECIMAL so the
    # reduction is order-independent.
    ev = T(spark, sf, "events")
    wo = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn") == F.ceil(_WINS_LO * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("rn") == F.ceil(_WINS_HI * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("hi"),
        F.max("n").cast("bigint").alias("n"),
    )
    clamped = ranked.drop("n").join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "n",
        "lo",
        "hi",
        F.when(F.col("value") < F.col("lo"), 1).otherwise(0).alias("cl"),
        F.when(F.col("value") > F.col("hi"), 1).otherwise(0).alias("ch"),
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
        .cast("decimal(18,6)")
        .alias("wv"),
        F.col("value").cast("decimal(18,6)").alias("rv"),
    )
    return (
        clamped.groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.sum("cl").alias("n_clamped_low"),
            F.sum("ch").alias("n_clamped_high"),
            F.sum("rv").alias("srv"),
            F.sum("wv").alias("swv"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("lo"), 4).alias("p05"),
            F.round(F.col("hi"), 4).alias("p95"),
            "n_clamped_low",
            "n_clamped_high",
            F.round(F.col("srv").cast("double") / F.col("n"), 4).alias("mean_raw"),
            F.round(F.col("swv").cast("double") / F.col("n"), 4).alias(
                "mean_winsorized"
            ),
        )
    )


# --------------------------------------------------- point-in-time join ----
_PIT_STATES = ("signup", "error")


@q(
    "q_join_pit_scd2",
    f"""
    WITH st AS (
        SELECT user_id, event_type,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, event_id
        FROM events WHERE event_type IN {_PIT_STATES!r}
    ),
    chg AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                       THEN 1 ELSE 0 END AS chg
        FROM st WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    seg AS (
        SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS seg_id
        FROM chg
    ),
    dim AS (
        SELECT user_id, MIN(event_type) AS state_type,
               CAST(MIN(us) AS BIGINT) AS valid_from_us,
               lead(CAST(MIN(us) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY seg_id) AS valid_to_us
        FROM seg GROUP BY user_id, seg_id
    ),
    fact AS (
        SELECT event_id, user_id,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS purchase_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.purchase_us,
           d.state_type, d.valid_from_us AS state_from_us
    FROM fact f LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.purchase_us >= d.valid_from_us
     AND (d.valid_to_us IS NULL OR f.purchase_us < d.valid_to_us)
    """,
)
def q_join_pit_scd2(spark, sf):
    # point-in-time dimension lookup: each purchase joined to the SCD-2
    # validity interval (built from the user's signup/error state runs)
    # covering its timestamp — "what state was this user in when they
    # bought". The [from, to) half-open intervals partition each user's
    # timeline, so every fact matches at most one version; facts before
    # the first state event stay NULL (LEFT semantics).
    #
    # Scale: the join is an equi hash join on user_id with the interval
    # containment as a residual filter — per-key fan is (facts_per_user ×
    # versions_per_user), fine for dimension-like churn; for keys whose
    # version count is unbounded (sensor state every second) use the
    # as-of union-window form instead (q_join_asof — one window, no
    # fan). The dimension build is the q_scd2_history gaps-and-islands
    # single shuffle.
    ev = T(spark, sf, "events")
    st = ev.filter(F.col("event_type").isin(*_PIT_STATES)).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    wo = Window.partitionBy("user_id").orderBy("us", "event_id")
    seg = st.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(wo).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    ).withColumn(
        "seg_id", F.sum("chg").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id").orderBy("seg_id")
    dim = (
        seg.groupBy("user_id", "seg_id")
        .agg(
            F.min("event_type").alias("state_type"),
            F.min("us").cast("bigint").alias("valid_from_us"),
        )
        .select(
            "user_id",
            "state_type",
            "valid_from_us",
            F.lead("valid_from_us").over(ws).alias("valid_to_us"),
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_us"),
    )
    d = dim.alias("d")
    f_ = fact.alias("f")
    return f_.join(
        d,
        (F.col("f.user_id") == F.col("d.user_id"))
        & (F.col("f.purchase_us") >= F.col("d.valid_from_us"))
        & (
            F.col("d.valid_to_us").isNull()
            | (F.col("f.purchase_us") < F.col("d.valid_to_us"))
        ),
        "left",
    ).select(
        "f.event_id",
        "f.user_id",
        "f.purchase_us",
        "d.state_type",
        F.col("d.valid_from_us").alias("state_from_us"),
    )


@q(
    "q_mix_draw",
    f"""
    WITH avail AS (
        SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS avail_tokens
        FROM documents GROUP BY source
    ),
    w (source, weight) AS (
        VALUES {", ".join(f"('{s}', CAST({w} AS DOUBLE))" for s, w in _MIX_WEIGHTS)}
    ),
    caps AS (
        SELECT source, weight,
               CAST(FLOOR(avail_tokens / weight) AS BIGINT) AS cap_total
        FROM avail JOIN w USING (source)
    ),
    t AS (SELECT MIN(cap_total) AS t_max FROM caps),
    quota AS (
        SELECT source, CAST(FLOOR(weight * t_max) AS BIGINT) AS quota_tokens
        FROM caps CROSS JOIN t
    ),
    docs AS (
        SELECT d.source, d.doc_id, q.quota_tokens,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
               md5(concat('mix:', CAST(d.doc_id AS VARCHAR))) AS ord_key
        FROM documents d JOIN quota q ON d.source = q.source
    ),
    run AS (
        SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY ord_key, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM docs
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_drawn,
           quota_tokens
    FROM run WHERE cum <= quota_tokens
    GROUP BY source, quota_tokens
    """,
)
def q_mix_draw(spark, sf):
    # EXECUTE the mixture plan: greedily draw documents per source in
    # content-addressed order (md5 of doc_id — the q_split_train
    # discipline: no RNG state, re-runs and backfills select the same
    # docs) until the q_mix_plan quota is filled; report drawn docs and
    # tokens against quota. Together with q_mix_plan this is the
    # plan→draw loop a pretraining data team runs per mixture revision.
    #
    # Scale: quotas are |sources| broadcast rows; the draw is ONE
    # source-partitioned running-sum window over the candidate docs —
    # the same single-shuffle shape as q_text_pack, selection stays
    # deterministic under any partitioning because the order key is
    # content-addressed.
    d = T(spark, sf, "documents")
    avail = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("avail_tokens")
    )
    w = spark.createDataFrame(list(_MIX_WEIGHTS), "source string, weight double")
    caps = avail.join(F.broadcast(w), "source").withColumn(
        "cap_total", F.floor(F.col("avail_tokens") / F.col("weight")).cast("bigint")
    )
    t = caps.agg(F.min("cap_total").alias("t_max"))
    quota = caps.crossJoin(F.broadcast(t)).select(
        "source",
        F.floor(F.col("weight") * F.col("t_max")).cast("bigint").alias("quota_tokens"),
    )
    docs = d.join(F.broadcast(quota), "source").select(
        "source",
        "doc_id",
        "quota_tokens",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))).alias(
            "ord_key"
        ),
    )
    wr = (
        Window.partitionBy("source")
        .orderBy(F.col("ord_key").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = docs.withColumn("cum", F.sum("n_tokens").over(wr))
    return (
        run.filter(F.col("cum") <= F.col("quota_tokens"))
        .groupBy("source", "quota_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_drawn"),
        )
        .select("source", "n_docs", "tokens_drawn", "quota_tokens")
    )


# ------------------------------------------- star-contraction CC, chains ---
@q(
    "q_graph_cc_chain",
    """
    SELECT CAST(event_id AS BIGINT) AS node,
           CAST(MIN(event_id) OVER (PARTITION BY user_id) AS BIGINT) AS comp
    FROM events
    """,
)
def q_graph_cc_chain(spark, sf):
    # connected components on genuinely CHAIN-shaped data, through the
    # oracle gate: consecutive events of each user (by ts, id) are edges,
    # so every user is one path-graph component with diameter = their
    # event count (up to ~860 at sf0.1). Min-label propagation is
    # O(diameter) and CANNOT finish inside its round budget here — this
    # query runs connected_components_star (large-star/small-star,
    # O(log n) rounds, operators/dedup.py) and is exactly why that
    # algorithm exists. The oracle is the semantic ground truth: a
    # user's component is labeled by their minimum event id (one window,
    # no iteration) — the iterative algorithm must reproduce it exactly.
    # Singleton users (one event, no edge) coalesce to themselves.
    from mongo_to_parquet_spark.operators.dedup import connected_components_star

    e = T(spark, sf, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select("user_id", "event_id", F.lead("event_id").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("event_id").alias("doc1"), F.col("nxt").alias("doc2"))
    )
    cc = connected_components_star(edges)
    return (
        e.select(F.col("event_id").alias("node"))
        .join(cc, "node", "left")
        .select("node", F.coalesce("comp", F.col("node")).alias("comp"))
    )


# ------------------------------------------------------- k-means clusters --
_KM_SCALE = "1099511627776.0"  # 2^40, the operators/similarity._D2_SCALE twin
_KM_DIST = (
    "SUM(CAST(FLOOR((d.val - c.cval) * (d.val - c.cval) * " + _KM_SCALE + ") "
    "AS BIGINT))"
)


@q(
    "q_embed_kmeans",
    f"""
    WITH dims AS (
        SELECT vec_id AS id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    init AS (
        SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT) AS cid
        FROM (SELECT vec_id AS id FROM embeddings ORDER BY vec_id LIMIT 4)
    ),
    c0 AS (SELECT cid, pos, val AS cval
           FROM dims JOIN init USING (id)),
    d0 AS (
        SELECT d.id, c.cid, {_KM_DIST} AS d2
        FROM dims d JOIN c0 c ON d.pos = c.pos
        GROUP BY d.id, c.cid
    ),
    a0 AS (
        SELECT id, cid FROM (
            SELECT id, cid,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY d2 ASC, cid ASC) AS rn
            FROM d0) WHERE rn = 1
    ),
    c1 AS (
        SELECT a.cid, d.pos,
               CAST(SUM(CAST(d.val AS DECIMAL(38, 12))) AS DOUBLE) / COUNT(*)
                   AS cval
        FROM dims d JOIN a0 a USING (id)
        GROUP BY a.cid, d.pos
    ),
    d1 AS (
        SELECT d.id, c.cid, {_KM_DIST} AS d2
        FROM dims d JOIN c1 c ON d.pos = c.pos
        GROUP BY d.id, c.cid
    ),
    a1 AS (
        SELECT id, cid, d2 FROM (
            SELECT id, cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY d2 ASC, cid ASC) AS rn
            FROM d1) WHERE rn = 1
    )
    SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(CAST(SUM(CAST(d2 AS DECIMAL(38, 0))) AS DOUBLE)
                 / {_KM_SCALE}, 4) AS inertia
    FROM a1 GROUP BY cid
    """,
)
def q_embed_kmeans(spark, sf):
    # Lloyd's k-means over the embedding corpus (k=4, two assignment
    # rounds), oracle-exact end to end: deterministic lowest-id init,
    # integer-quantized distances, DECIMAL-exact centroid means
    # (operators/similarity.kmeans_lloyd — docstring has the full
    # determinism + scale contract). The report is per-cluster size +
    # inertia — the convergence/balance readout a curation pipeline
    # checks before using clusters for mixture design, SemDeDup cell
    # assignment (q_dedup_semantic), or IVF cell seeding (the Lloyd
    # refinement the deterministic IVF seeds deliberately skip).
    # The oracle replays both rounds as unrolled CTEs — the same
    # iterative-op discipline as q_graph_pagerank/q_embed_pca: fixed
    # rounds, exact arithmetic, bit-identical fixpoint.
    from mongo_to_parquet_spark.operators.similarity import kmeans_lloyd

    assigned, _cents = kmeans_lloyd(T(spark, sf, "embeddings"), k=4, rounds=2)
    return _kmeans_report(assigned)


def _kmeans_report(assigned):
    """The per-cluster size/inertia report over an (id, cid, d2)
    assignment — shared by the inline trainer and the artifact serve."""
    from mongo_to_parquet_spark.operators.similarity import _D2_SCALE

    return assigned.groupBy(F.col("cid").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            F.sum(F.col("d2").cast("decimal(38,0)")).cast("double")
            / F.lit(_D2_SCALE),
            4,
        ).alias("inertia"),
    )


@q("q_kmeans_apply_artifact", ORACLE["q_embed_kmeans"])
def q_kmeans_apply_artifact(spark, sf):
    # k-means ASSIGNMENT served from stored centroids (round-9 verdict
    # item 1): training (kmeans_lloyd's assign→update→assign) runs once
    # and persists the FINAL k×d centroid means; the serve loads them
    # (k×d rows — a bounded driver pick, same exception as the IVF
    # centroid table) and runs ONE map-only assignment pass through the
    # IDENTICAL kmeans_assign_expr + report, so train and serve cannot
    # drift. Centroid means are decimal-exact doubles; parquet doubles
    # round-trip bit-exactly, so the stored table reproduces the
    # trainer's assignment decision for every vector. Oracle = the full
    # two-round training SQL: store→load→assign ≡ train→assign.
    #
    # Scale: the serve is the production shape — centroids ride the plan
    # as a k×d literal (no join, no shuffle beyond the k-row report
    # agg), so assigning 100 TB of embeddings to a FIXED clustering
    # (mixture design, SemDeDup cells, IVF seeding) runs at scan speed
    # with training nowhere in the path.
    from mongo_to_parquet_spark.operators.similarity import (
        kmeans_assign_expr,
        kmeans_lloyd,
    )

    art = tokenizer.artifact_dir(sf, "kmeans")
    want = {"k": 4, "rounds": 2, "dist": "d2_fixed_2e40"}
    emb = T(spark, sf, "embeddings")
    if not tokenizer.artifact_current(art, "kmeans", want):
        _assigned, cents = kmeans_lloyd(emb, k=4, rounds=2)
        rows = [
            (int(cid), int(pos), float(v))
            for cid, vec in cents
            for pos, v in enumerate(vec)
        ]
        tokenizer.save_artifact(spark, rows, art, "kmeans", meta=want)
    stored = tokenizer.load_artifact(spark, art, "kmeans").collect()
    by: dict = {}
    for r in stored:
        by.setdefault(r["cid"], {})[r["pos"]] = r["cval"]
    cents = [(cid, [by[cid][p] for p in sorted(by[cid])]) for cid in sorted(by)]
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("x"),
    )
    best = kmeans_assign_expr(F.col("x"), cents)
    assigned = vecs.select(
        "id", F.explode(F.array(best)).alias("b")
    ).select("id", F.col("b.cid").alias("cid"), F.col("b.d").alias("d2"))
    return _kmeans_report(assigned)


# ------------------------------------------------------- k-core peel -------
@q(
    "q_graph_kcore",
    """
    WITH g AS MATERIALIZED (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
               greatest(a.l_partkey, b.l_partkey) AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    d0 AS MATERIALIZED (SELECT x, COUNT(*) AS c
           FROM (SELECT u AS x FROM g UNION ALL SELECT v AS x FROM g)
           GROUP BY x),
    kk AS MATERIALIZED (SELECT CAST(FLOOR(quantile_cont(c, 0.5) * 0.8) AS BIGINT) AS k
           FROM d0),
    k0 AS MATERIALIZED (SELECT x FROM d0, kk WHERE c >= k),
    e1 AS MATERIALIZED (SELECT g.u, g.v FROM g
           JOIN k0 a ON g.u = a.x JOIN k0 b ON g.v = b.x),
    d1 AS MATERIALIZED (SELECT x, COUNT(*) AS c
           FROM (SELECT u AS x FROM e1 UNION ALL SELECT v AS x FROM e1)
           GROUP BY x),
    k1 AS MATERIALIZED (SELECT x FROM d1, kk WHERE c >= k),
    e2 AS MATERIALIZED (SELECT e1.u, e1.v FROM e1
           JOIN k1 a ON e1.u = a.x JOIN k1 b ON e1.v = b.x),
    d2 AS MATERIALIZED (SELECT x, COUNT(*) AS c
           FROM (SELECT u AS x FROM e2 UNION ALL SELECT v AS x FROM e2)
           GROUP BY x),
    k2 AS MATERIALIZED (SELECT x FROM d2, kk WHERE c >= k),
    e3 AS MATERIALIZED (SELECT e2.u, e2.v FROM e2
           JOIN k2 a ON e2.u = a.x JOIN k2 b ON e2.v = b.x),
    d3 AS MATERIALIZED (SELECT x, COUNT(*) AS c
           FROM (SELECT u AS x FROM e3 UNION ALL SELECT v AS x FROM e3)
           GROUP BY x)
    SELECT x AS node, CAST(c AS BIGINT) AS degree,
           (SELECT k FROM kk) AS k
    FROM d3
    """,
)
def q_graph_kcore(spark, sf):
    # k-CORE PEELING over the part co-occurrence graph — the density
    # filter behind "keep only strongly cross-linked items" curation
    # (spam subgraphs, weakly-attached entities drop out). k is data-
    # relative — ⌊0.8 × exact median degree⌋, a driver-collected scalar
    # (the kmeans-centroid exception) so the same query bites at every
    # sf — and the declared semantics are THREE peel rounds, unrolled by
    # the oracle as CTE stages (the fixed-rounds discipline of pagerank/
    # kmeans); survivors below k prove rounds≠fixpoint — the exact-core
    # mode (operators/dedup.kcore_peel rounds=None, checksum+exceptAll
    # fixpoint) is unit-tested on graphs with known cores. Each round is
    # one map-combined degree aggregate + two node-keyed semi joins over
    # a monotonically shrinking edge set.
    from mongo_to_parquet_spark.operators.dedup import kcore_peel

    li = T(spark, sf, "lineitem")
    g = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    e = (
        g.select(F.posexplode("ps").alias("i", "u"), "ps")
        .select(
            "u",
            F.explode(
                F.slice(F.col("ps"), F.col("i") + F.lit(2), F.size("ps"))
            ).alias("v"),
        )
        .distinct()
        # materialize ONCE: the expensive collect_set/explode edge build
        # otherwise runs twice — for the median-k probe AND inside
        # kcore_peel's first round (SURVEY retro item 9)
        .localCheckpoint()
    )
    # persisted: the median-k probe and peel round 1 both read this
    # node-sized degree table — without the persist, round 1 re-aggregates
    # the full edge set (the probe is its own action, so exchange reuse
    # cannot span it). Round-12 A/B: median 2.79 -> 2.58s.
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    med = deg.agg(F.floor(F.percentile("d", 0.5) * 0.8)).collect()[0][0]
    k = int(med) if med is not None else 1  # empty graph → empty result
    # canonical=True: e is already (u<v)-oriented (sorted per-order part
    # arrays), self-loop-free, distinct and checkpointed — kcore_peel's
    # normalize+distinct re-shuffle and round-0 re-materialization of the
    # SAME edge set are skipped (round-12: one edge-sized exchange +
    # checkpoint write saved per invocation)
    return kcore_peel(
        e, k=k, rounds=3, src="u", dst="v", canonical=True, degrees0=deg
    ).withColumn("k", F.lit(k).cast("bigint"))


# ------------------------------------------------- recency decay score -----
@q(
    "q_score_recency_decay",
    """
    SELECT l_partkey,
           CAST(SUM(CAST(1 AS BIGINT) <<
                    (15 - least(CAST(date_diff('day',
                                     CAST(l_shipdate AS DATE),
                                     DATE '1998-08-01') // 90 AS INT), 15))
               ) AS DOUBLE) / 32768.0 AS score,
           CAST(COUNT(*) AS BIGINT) AS n_ships
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-08-01'
    GROUP BY l_partkey
    """,
)
def q_score_recency_decay(spark, sf):
    # exponential-decay recency scoring — the half-life popularity signal
    # behind recency-weighted sampling and freshness-aware mixing: each
    # shipment contributes 2^(-age/90d epochs), so activity 90 days ago
    # counts half of today's. Cross-engine exactness by construction:
    # the whole computation stays in INTEGER fixed-point: each term is
    # 1 << (15 − min(k, 15)) — i.e. 2^(−k) scaled by 2^15 — summed as
    # BIGINT (exact, order-free), divided by 32768.0 only at the end
    # (int ≤2^53 → double exact; /2^15 shifts the exponent, exact).
    # Anything float-side drifts: POWER() differs from the JVM in the
    # final ulp even for base 2, and DuckDB's DECIMAL(38,18)→DOUBLE
    # conversion itself double-rounds via unscaled/10^18 — integer
    # fixed-point sidesteps both. Epochs cap at 15 (≥45 months old ⇒
    # the minimum weight 2^-15), bounding the shift. The anchor is a FIXED literal (deterministic replays; never
    # wall-clock). Scale: one map-combinable aggregate over a pushed-down
    # date filter — the cheapest possible shape; refreshing the score
    # daily re-weights by a constant factor per epoch boundary, which the
    # incremental-MV state fold (operators/incremental.py) can absorb.
    li = T(spark, sf, "lineitem")
    age_epochs = F.floor(
        F.datediff(F.lit("1998-08-01").cast("date"), F.col("l_shipdate").cast("date"))
        / 90
    ).cast("int")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-08-01").cast("timestamp_ntz"))
        .withColumn("__k", F.least(age_epochs, F.lit(15)))
        # expression form: DataFrame F.shiftleft only takes a LITERAL bit
        # count; the SQL function accepts a column
        .withColumn("__term", F.expr("shiftleft(CAST(1 AS BIGINT), 15 - __k)"))
        .groupBy("l_partkey")
        .agg(
            (F.sum("__term").cast("double") / F.lit(32768.0)).alias("score"),
            F.count(F.lit(1)).alias("n_ships"),
        )
    )


# ------------------------------------------------- robust MAD anomalies ----
@q(
    "q_anomaly_mad",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS ad
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(ad, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(d.med, 4) AS med,
           ROUND(m.mad, 4) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN m.mad > 0
                          AND ABS(0.6745 * (d.value - d.med) / m.mad) > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, d.med, m.mad
    """,
)
def q_anomaly_mad(spark, sf):
    # ROBUST anomaly detection: modified z-score from the median and the
    # median absolute deviation (0.6745·(v−med)/MAD, |·| > 3.5 — the
    # Iglewicz–Hoaglin rule). Complements q_anomaly_zscore: mean/stddev
    # break down exactly when outliers are present (the outliers inflate
    # σ and mask themselves); median/MAD have a 50% breakdown point.
    # Exactness: both medians are interpolated exact percentiles
    # (F.percentile ≡ quantile_cont, the q_agg_stats equivalence), the
    # 0.6745/3.5 constants and the |v−med|/MAD arithmetic are identical
    # double expressions, and a zero MAD (>50% identical values)
    # disables flagging via the same guarded CASE in both engines.
    #
    # Scale: two grouped EXACT percentiles (ObjectHashAggregate buffers
    # per group — the oracle-checkable baseline; swap approx_percentile
    # at 100 TB, the q_agg_stats split) + two broadcast joins of
    # |types|-row stats back onto the fact, one counting aggregate.
    ev = T(spark, sf, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("ad", 0.5).alias("mad"))
    flagged = F.when(
        (F.col("mad") > 0)
        & (
            F.abs(F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"))
            > 3.5
        ),
        1,
    ).otherwise(0)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(flagged).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n",
            "n_outliers",
        )
    )


# -------------------------------------------- kNN-graph link prediction ----
@q(
    "q_graph_linkpred",
    """
    WITH s AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
    w AS (
        SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS w
        FROM s a JOIN s b ON a.ok = b.ok AND a.p < b.p
        GROUP BY a.p, b.p
    ),
    adj AS (
        SELECT u AS x, v AS y, w FROM w
        UNION ALL SELECT v AS x, u AS y, w FROM w
    ),
    knn AS (
        SELECT x, y FROM (
            SELECT x, y, row_number() OVER (
                PARTITION BY x ORDER BY w DESC, y ASC) AS rk
            FROM adj) WHERE rk <= 8
    ),
    und AS (
        SELECT DISTINCT LEAST(x, y) AS u, GREATEST(x, y) AS v FROM knn
    ),
    adj2 AS (SELECT u AS x, v AS y FROM und
             UNION ALL SELECT v AS x, u AS y FROM und),
    deg2 AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM adj2 GROUP BY x),
    cn AS (
        SELECT a1.y AS a, a2.y AS b, CAST(COUNT(*) AS BIGINT) AS cn
        FROM adj2 a1 JOIN adj2 a2 ON a1.x = a2.x AND a1.y < a2.y
        GROUP BY a1.y, a2.y
    ),
    pred AS (
        SELECT cn.a, cn.b, cn.cn, da.d AS da, db.d AS db,
               cn.cn * 10000 // (da.d + db.d - cn.cn) AS jacc_x10000
        FROM cn JOIN deg2 da ON da.x = cn.a JOIN deg2 db ON db.x = cn.b
        WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.u = cn.a AND und.v = cn.b)
    )
    SELECT * FROM pred
    ORDER BY jacc_x10000 DESC, cn DESC, a ASC, b ASC LIMIT 20
    """,
)
def q_graph_linkpred(spark, sf):
    # Link prediction by neighborhood Jaccard over the part co-occurrence
    # graph — "parts likely to co-occur next" — with the one design move
    # that makes common-neighbor scoring survive scale: kNN-GRAPH
    # SPARSIFICATION first. The raw co-occurrence graph is dense (median
    # degree ~115 at sf0.01, growing with corpus size), so enumerating
    # common-neighbor pairs on it is Σd² — quadratic in the hot tail.
    # Keeping only each node's 8 STRONGEST edges (co-occurrence weight
    # desc, id tiebreak — fully deterministic) bounds degree by ~2·8
    # (out-edges + reciprocated in-edges), so wedge generation is O(n)
    # with a small constant, independent of raw density. Scores are
    # integer: cn and ⌊cn·10⁴/(da+db−cn)⌋; the anti-join keeps only
    # NON-adjacent pairs (that's the prediction). Total order under the
    # LIMIT includes (a, b) so ties can't split engines.
    #
    # Scale: weighted edges come from per-order sorted part arrays with
    # MAP-SIDE pair generation (one groupBy(ok) shuffle — the
    # q_graph_triangles build; no self-join). kNN selection is one
    # row_number window Spark executes as WindowGroupLimit (top-8 kept
    # per partition before the sort spills). Wedges are again map-side
    # pairs from per-node ≤16-element adjacency arrays — never a
    # wedge JOIN. In-degree hubs (a node in everyone's top-8) are the
    # residual risk; bound it by a second top-k pass on adj2 if a real
    # corpus shows them (degree census: q_graph_degree_stats).
    li = T(spark, sf, "lineitem")
    s = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    ps = s.groupBy("ok").agg(F.sort_array(F.collect_set("p")).alias("ps"))
    pairs = ps.select(
        F.posexplode("ps").alias("i", "u"), "ps"
    ).select("u", F.explode(F.expr("slice(ps, i + 2, size(ps))")).alias("v"))
    w = pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
    adj = w.select(F.col("u").alias("x"), F.col("v").alias("y"), "w").unionByName(
        w.select(F.col("v").alias("x"), F.col("u").alias("y"), "w")
    )
    rk = Window.partitionBy("x").orderBy(F.col("w").desc(), F.col("y").asc())
    knn = (
        adj.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 8)
        .select("x", "y")
    )
    # persist the two NODE-SCALE intermediates: und (≤8n edges) and nbrs
    # (n rows, ≤16-element arrays). Unlike q_graph_triangles' branches —
    # identical subtrees AQE's ReuseExchange already dedupes — these feed
    # consumers through DIFFERENT projections/unions (adj2's two sides,
    # the anti-join, deg2, wedges), so without the cache the fact-sized
    # edge build re-executes per branch (static plan: Exchange×46).
    # Measured at sf0.1 warm: 7.7s → 4.2s with the persists. Both tables
    # stay node-scale at any corpus size — this is not caching the fact.
    und = knn.select(
        F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
    ).distinct().persist()
    adj2 = und.select(F.col("u").alias("x"), F.col("v").alias("y")).unionByName(
        und.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    nbrs = adj2.groupBy("x").agg(
        F.sort_array(F.collect_set("y")).alias("ns")
    ).persist()
    deg2 = nbrs.select("x", F.size("ns").cast("bigint").alias("d"))
    wedges = nbrs.select(
        F.posexplode("ns").alias("i", "a"), "ns"
    ).select("a", F.explode(F.expr("slice(ns, i + 2, size(ns))")).alias("b"))
    cn = wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cn"))
    pred = (
        cn.join(und, (cn.a == und.u) & (cn.b == und.v), "left_anti")
        .join(deg2.select(F.col("x").alias("a"), F.col("d").alias("da")), "a")
        .join(deg2.select(F.col("x").alias("b"), F.col("d").alias("db")), "b")
        .withColumn(
            "jacc_x10000",
            F.expr("div(cn * 10000, da + db - cn)").cast("bigint"),
        )
    )
    return (
        pred.select("a", "b", "cn", "da", "db", "jacc_x10000")
        .orderBy(
            F.col("jacc_x10000").desc(),
            F.col("cn").desc(),
            F.col("a").asc(),
            F.col("b").asc(),
        )
        .limit(20)
    )


# ------------------------------------------- chi-square independence -------
@q(
    "q_stats_chi2",
    """
    WITH cells AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2),
    m AS (
      SELECT pri, st, o,
             SUM(o) OVER (PARTITION BY pri) AS r,
             SUM(o) OVER (PARTITION BY st) AS c,
             SUM(o) OVER () AS n
      FROM cells)
    SELECT pri, st, o,
           CAST(r * c AS BIGINT) AS expected_xn,
           CAST(CAST(o * n - r * c AS HUGEINT) * CAST(o * n - r * c AS HUGEINT)
                // CAST(r * c AS HUGEINT) AS BIGINT) AS contrib_xn
    FROM m
    """,
)
def q_stats_chi2(spark, sf):
    # Chi-square test of independence between two categoricals (order
    # priority × status) — the drift/bias gate for categorical columns
    # ("did the label mix shift between snapshots / across a split?")
    # that PSI (q_drift_psi) answers for binned continuous values. The
    # whole statistic stays INTEGER: expected·N = r·c exactly, and each
    # cell's contribution is ⌊(o·N − r·c)²/(r·c)⌋ — N·χ² after summing
    # contrib_xn/N offline — so there is no float division to drift at
    # cell boundaries (the "scale fractions to integers" rule; floor is
    # identical `div`/`//` semantics in both engines for the
    # non-negative operands here). The SQUARE is taken in 128-bit
    # arithmetic (DECIMAL(38,0) / HUGEINT): o·N − r·c fits int64 up to
    # N ≈ 3·10⁹ rows but its square does not — squaring in int64 wraps
    # silently under Spark's div. Domain bound: the QUOTIENT (≈ N·χ²
    # per cell) must fit int64 — safe for any real contingency table.
    # Per-cell contributions are the DIAGNOSTIC output: the offending
    # cells, not just the scalar.
    #
    # Scale: ONE map-combined aggregate over the fact produces the
    # R×C contingency cells; margins come from window sums OVER THE
    # CELLS (R·C rows — constant), never a second fact scan. Any pair
    # of bounded-cardinality categoricals fits the identical plan.
    o = T(spark, sf, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = (
        cells.withColumn("r", F.sum("o").over(Window.partitionBy("pri")))
        .withColumn("c", F.sum("o").over(Window.partitionBy("st")))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
    )
    return m.select(
        "pri",
        "st",
        "o",
        (F.col("r") * F.col("c")).cast("bigint").alias("expected_xn"),
        F.expr(
            "div(cast(o * n - r * c as decimal(38,0)) * "
            "cast(o * n - r * c as decimal(38,0)), "
            "cast(r * c as decimal(38,0)))"
        )
        .cast("bigint")
        .alias("contrib_xn"),
    )


# ----------------------------------------- sortless exact quantiles --------
@q(
    "q_agg_quantile_histogram",
    """
    WITH v AS (SELECT CAST(l_extendedprice * 100 AS BIGINT) AS c
               FROM lineitem WHERE l_extendedprice IS NOT NULL),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST((COUNT(*) + 1) // 2 AS BIGINT) AS k50,
                 CAST((COUNT(*) * 9 + 9) // 10 AS BIGINT) AS k90
          FROM v)
    SELECT n.n, n.k50, n.k90,
           (SELECT c FROM v ORDER BY c LIMIT 1 OFFSET (SELECT k50 - 1 FROM n))
               AS median_cents,
           (SELECT c FROM v ORDER BY c LIMIT 1 OFFSET (SELECT k90 - 1 FROM n))
               AS p90_cents
    FROM n
    """,
)
def q_agg_quantile_histogram(spark, sf):
    # EXACT median and p90 of a 100 TB-sized numeric column with NO
    # global sort and NO value buffering: iterative histogram refinement
    # (operators/validate.exact_kth_smallest) — each round one
    # map-combined ≤1024-cell bucket census, ⌈log₁₀₂₄(range)⌉ ≈ 3 full
    # scans per quantile for a 32-bit integer domain, driver state one
    # census. Contrast the exact alternatives that DON'T scale: Spark's
    # `percentile` buffers every value in the aggregation state, and a
    # sort-based rank select shuffles the entire fact. The decimal
    # column pre-scales to integer cents, so ranks and the recovered
    # value are exact in both engines (the oracle ranks by OFFSET).
    #
    # Scale: rounds are sequential but each is an embarrassingly
    # parallel scan; the between-filter prunes with column min/max
    # statistics as the range narrows (later rounds read a shrinking
    # row-group subset under parquet zone maps).
    from mongo_to_parquet_spark.operators.validate import exact_kth_smallest

    li = T(spark, sf, "lineitem")
    v = li.filter(F.col("l_extendedprice").isNotNull()).select(
        (F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    n = v.count()
    k50, k90 = (n + 1) // 2, (n * 9 + 9) // 10
    med = exact_kth_smallest(v, "c", k50)
    p90 = exact_kth_smallest(v, "c", k90)
    return spark.createDataFrame(
        [(n, k50, k90, med, p90)],
        "n bigint, k50 bigint, k90 bigint, median_cents bigint, p90_cents bigint",
    )


# -------------------------------------------------- DSIR data selection ----
from mongo_to_parquet_spark.functions.sketch import kmv_hash_sql  # noqa: E402

_DSIR_B = 256       # hashed-feature buckets (2-gram space folded to B)
_DSIR_TOP = 50      # selected subset size


@q(
    "q_select_dsir",
    f"""
    WITH base AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
                  FROM documents),
    bg AS (
        SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS bg
        FROM base, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS t(i)
        UNION ALL
        SELECT doc_id, lang, text FROM base WHERE len(toks) < 2
    ),
    feat AS (
        SELECT doc_id, lang,
               {kmv_hash_sql('bg', salt='dsir:')} % {_DSIR_B} AS f
        FROM bg
    ),
    doc_feat AS (
        SELECT doc_id, lang, f, CAST(COUNT(*) AS BIGINT) AS n
        FROM feat GROUP BY doc_id, lang, f
    ),
    fstats AS (
        SELECT f,
               CAST(SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT) AS ct,
               CAST(SUM(n) AS BIGINT) AS cr
        FROM doc_feat GROUP BY f
    ),
    tots AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
                    CAST(SUM(cr) AS BIGINT) AS tr FROM fstats),
    w AS (
        SELECT f,
               LN(CAST(ct + 1 AS DOUBLE) / (tt + {_DSIR_B}))
             - LN(CAST(cr + 1 AS DOUBLE) / (tr + {_DSIR_B})) AS wf
        FROM fstats CROSS JOIN tots
    )
    SELECT doc_id,
           ROUND(CAST(SUM(CAST(n * wf AS DECIMAL(38,18))) AS DOUBLE), 4)
               AS dsir_weight
    FROM doc_feat JOIN w USING (f)
    GROUP BY doc_id
    ORDER BY dsir_weight DESC, doc_id ASC
    LIMIT {_DSIR_TOP}
    """,
)
def q_select_dsir(spark, sf):
    # DSIR-style data selection (Xie et al. 2023, "Data Selection for
    # Language Models via Importance Resampling"): rank every document by
    # its importance weight under hashed n-gram feature distributions —
    # w(doc) = Σ_f n_f(doc)·[ln p_target(f) − ln p_raw(f)] with Laplace
    # smoothing — here target = the 'en' slice, raw = the whole corpus,
    # bigram features folded into B=256 md5 buckets. The top-m selection
    # is the "what to train on" cut a 100 TB pretraining pipeline makes
    # against a small high-quality target domain.
    #
    # Scale: ONE corpus scan builds (doc, lang, feature, n) with map-side
    # partial counts; target AND raw feature distributions come from a
    # SINGLE ≤B-row conditional aggregate of that relation — both
    # consumers (the f-level stats and the final scoring join) read the
    # SAME doc_feat exchange, so AQE's ReuseExchange materializes it once
    # (splitting target into its own filtered branch let Catalyst push
    # the lang filter below the aggregate and cost an extra corpus scan —
    # caught in PLANS.md review); weights broadcast back; selection is
    # TakeOrdered(m). Cross-engine exactness: integer counts → the same
    # double ratios → LN (bm25 precedent) → per-term DECIMAL(38,18)
    # accumulation → ROUND 4dp, ties broken by doc_id.
    from mongo_to_parquet_spark.functions.sketch import kmv_hash
    from mongo_to_parquet_spark.functions.textfns import shingles
    from mongo_to_parquet_spark.operators.parallel import fan_out

    d = fan_out(T(spark, sf, "documents").select("doc_id", "lang", "text"))
    feats = d.select(
        "doc_id", "lang", F.explode(shingles(F.col("text"), 2)).alias("bg")
    ).select(
        "doc_id", "lang", (kmv_hash(F.col("bg"), salt="dsir:") % _DSIR_B).alias("f")
    )
    # persisted: two consumers (f-level stats; the scoring join) prune
    # doc_feat to DIFFERENT columns, so their exchange subtrees are not
    # canonically equal and ReuseExchange cannot dedupe them — the
    # q_graph_linkpred case (perf-lessons), where persist() is the
    # measured win. Bounded: ≤ min(doc_tokens, B)=256 rows per doc.
    # Caller (bench.py / parity) clearCache()s afterwards, like
    # q_stats_spearman.
    doc_feat = (
        feats.groupBy("doc_id", "lang", "f")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    fstats = doc_feat.groupBy("f").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("ct"),
        F.sum("n").cast("bigint").alias("cr"),
    )
    tots = fstats.agg(
        F.sum("ct").cast("bigint").alias("tt"),
        F.sum("cr").cast("bigint").alias("tr"),
    )
    w = fstats.crossJoin(F.broadcast(tots)).select(
        "f",
        (
            F.log((F.col("ct") + 1).cast("double") / (F.col("tt") + _DSIR_B))
            - F.log((F.col("cr") + 1).cast("double") / (F.col("tr") + _DSIR_B))
        ).alias("wf"),
    )
    return (
        doc_feat.join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum((F.col("n") * F.col("wf")).cast("decimal(38,18)")).cast(
                    "double"
                ),
                4,
            ).alias("dsir_weight")
        )
        .orderBy(F.col("dsir_weight").desc(), F.col("doc_id").asc())
        .limit(_DSIR_TOP)
    )


# ------------------------------------- Fellegi-Sunter record linkage -------
_FS_M = "0.95"      # assumed per-field m-probability (agreement | match)
_FS_TOP = 20

#: shared FS weight CTE (q_link_fs + q_link_fs_snm — ONE definition so the
#: twins' scores cannot drift). m literals forced to DOUBLE: DuckDB parses
#: bare 0.95 as DECIMAL and decimal division rounds differently from
#: Spark's double arithmetic. The u-numerators are CLAMPED into
#: [1, C(n,2)−1] (round-7 self-review): a CONSTANT field (num = den) or an
#: all-distinct field (num = 0) otherwise hits LN(0) / x÷0 where the
#: engines DIVERGE (DuckDB errors on LN(0) and NULLs double-division-by-
#: zero; Spark NULLs LN(0) and runs IEEE ÷0 to ±Inf) — the clamp is the
#: standard practical FS safeguard (finite weights at the extremes) and is
#: a no-op on any field with 0 < u < 1, so existing results are unchanged.
_FS_W_CTE = f"""
    w AS (
        SELECT LN(CAST({_FS_M} AS DOUBLE) * (n * (n - 1) / 2)
                  / LEAST(GREATEST(num1, 1), n * (n - 1) // 2 - 1)) AS wa1,
               LN((1 - CAST({_FS_M} AS DOUBLE)) * (n * (n - 1) / 2)
                  / (n * (n - 1) / 2
                     - LEAST(GREATEST(num1, 1), n * (n - 1) // 2 - 1))) AS wd1,
               LN(CAST({_FS_M} AS DOUBLE) * (n * (n - 1) / 2)
                  / LEAST(GREATEST(num2, 1), n * (n - 1) // 2 - 1)) AS wa2,
               LN((1 - CAST({_FS_M} AS DOUBLE)) * (n * (n - 1) / 2)
                  / (n * (n - 1) / 2
                     - LEAST(GREATEST(num2, 1), n * (n - 1) // 2 - 1))) AS wd2
        FROM stats
    )"""


def _fs_weights(stats):
    """Spark twin of :data:`_FS_W_CTE` — identical expression tree so both
    engines take LN of identical doubles (bm25 precedent)."""
    m = F.lit(float(_FS_M))
    den = F.col("n") * (F.col("n") - 1) / 2
    dmax = F.expr("div(n * (n - 1), 2) - 1")

    def clamp(num):
        return F.least(F.greatest(F.col(num), F.lit(1).cast("bigint")), dmax)

    c1, c2 = clamp("num1"), clamp("num2")
    return stats.select(
        F.log(m * den / c1).alias("wa1"),
        F.log((1 - m) * den / (den - c1)).alias("wd1"),
        F.log(m * den / c2).alias("wa2"),
        F.log((1 - m) * den / (den - c2)).alias("wd2"),
    )


@q(
    "q_link_fs",
    f"""
    WITH feats AS (
        SELECT c_custkey AS id, c_nationkey AS blk, c_mktsegment AS f1,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS f2
        FROM customer
    ),
    -- ONE stacked value-frequency pass estimates BOTH fields' chance-
    -- agreement numerators (and the pair denominator) — no per-field
    -- aggregation jobs chained through nested 1-row cross joins
    vf AS (
        SELECT fld, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(['1:' || f1, '2:' || CAST(f2 AS VARCHAR)]) AS fld
              FROM feats)
        GROUP BY fld
    ),
    stats AS (
        SELECT CAST(SUM(CASE WHEN fld LIKE '1:%' THEN c * (c - 1) / 2 END)
                    AS BIGINT) AS num1,
               CAST(SUM(CASE WHEN fld LIKE '2:%' THEN c * (c - 1) / 2 END)
                    AS BIGINT) AS num2,
               CAST(SUM(CASE WHEN fld LIKE '1:%' THEN c END) AS BIGINT) AS n
        FROM vf
    ),
    {_FS_W_CTE},
    pairs AS (
        SELECT a.id AS id1, b.id AS id2,
               CAST(a.f1 = b.f1 AS BIGINT) AS agree_seg,
               CAST(a.f2 = b.f2 AS BIGINT) AS agree_bal,
               ROUND(CASE WHEN a.f1 = b.f1 THEN wa1 ELSE wd1 END
                   + CASE WHEN a.f2 = b.f2 THEN wa2 ELSE wd2 END, 4) AS fs_score
        FROM feats a JOIN feats b ON a.blk = b.blk AND a.id < b.id
        CROSS JOIN w
    )
    SELECT id1, id2, agree_seg, agree_bal, fs_score FROM pairs
    ORDER BY fs_score DESC, id1 ASC, id2 ASC
    LIMIT {_FS_TOP}
    """,
)
def q_link_fs(spark, sf):
    # Fellegi-Sunter probabilistic record linkage (the 1969 model every
    # production entity-resolution system still scores with): candidate
    # pairs BLOCKED on nation, each field comparison contributing
    # ln(m/u) when it agrees and ln((1−m)/(1−u)) when it disagrees.
    # u-probabilities (chance agreement between NON-matches) are estimated
    # from the data itself as Σ_v C(n_v,2)/C(n,2) — exact integer
    # numerator/denominator, so both engines take LN of identical doubles
    # (bm25 precedent); m is the conventional 0.95 prior. Fields: market
    # segment and account-balance band.
    #
    # Scale: the u-estimation is two value-frequency aggregates (map-side
    # combined, ≤|domain| rows); weights are a 1-row broadcast; scoring is
    # the blocked equi-join (never a cross join — per-block fan-out is the
    # standard linkage knob) with a codegen'd per-pair expression;
    # selection is TakeOrdered. Rounded score + (id1, id2) tiebreak keeps
    # the cut engine-exact.
    c = T(spark, sf, "customer")
    feats = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("f1"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("f2"),
    )
    # one stacked value-frequency pass for BOTH fields' u-numerators and
    # the row count — replaces three aggregate jobs chained through nested
    # 1-row cross joins (their sequential stage latency dominated locally;
    # at scale it's also simply fewer passes)
    vf = (
        feats.select(
            F.explode(
                F.array(
                    F.concat(F.lit("1:"), F.col("f1")),
                    F.concat(F.lit("2:"), F.col("f2").cast("string")),
                )
            ).alias("fld")
        )
        .groupBy("fld")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pairs_of = F.col("c") * (F.col("c") - 1) / 2
    is1 = F.col("fld").startswith("1:")
    stats = vf.agg(
        F.sum(F.when(is1, pairs_of)).cast("bigint").alias("num1"),
        F.sum(F.when(~is1, pairs_of)).cast("bigint").alias("num2"),
        F.sum(F.when(is1, F.col("c"))).cast("bigint").alias("n"),
    )
    w = _fs_weights(stats)
    from mongo_to_parquet_spark.operators.parallel import fan_out

    # stream side fanned out (pairwise_cosine precedent): the blocked
    # self-join's quadratic per-block pair loop otherwise runs at the
    # single-file scan's parallelism
    a, b = fan_out(feats).alias("a"), feats.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .crossJoin(F.broadcast(w))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            (F.col("a.f1") == F.col("b.f1")).cast("bigint").alias("agree_seg"),
            (F.col("a.f2") == F.col("b.f2")).cast("bigint").alias("agree_bal"),
            F.round(
                F.when(F.col("a.f1") == F.col("b.f1"), F.col("wa1")).otherwise(
                    F.col("wd1")
                )
                + F.when(F.col("a.f2") == F.col("b.f2"), F.col("wa2")).otherwise(
                    F.col("wd2")
                ),
                4,
            ).alias("fs_score"),
        )
        .orderBy(F.col("fs_score").desc(), F.col("id1").asc(), F.col("id2").asc())
        .limit(_FS_TOP)
    )


# ---------------------------------------------- greedy coverage selection --
_COVER_K = 5


def _cover_oracle() -> str:
    """Greedy max-coverage unrolled as chained argmax CTEs (the MMR
    pattern, SURVEY §7 lesson 27): step t picks the doc adding the most
    not-yet-covered bigrams, doc_id tiebreak."""
    steps, unions = [], [
        "SELECT CAST(1 AS BIGINT) AS rk, doc_id, gain FROM s1"
    ]
    for t in range(2, _COVER_K + 1):
        p = t - 1
        steps.append(f"""
    s{t} AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM u
        WHERE doc_id NOT IN (SELECT doc_id FROM d{p})
          AND u NOT IN (SELECT u FROM c{p})
        GROUP BY doc_id ORDER BY gain DESC, doc_id ASC LIMIT 1
    ),
    c{t} AS (SELECT u FROM c{p} UNION SELECT u.u FROM u JOIN s{t} USING (doc_id)),
    d{t} AS (SELECT doc_id FROM d{p} UNION ALL SELECT doc_id FROM s{t})""")
        unions.append(f"SELECT CAST({t} AS BIGINT), doc_id, gain FROM s{t}")
    return f"""
    WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                  FROM documents),
    u AS (
        SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] AS u
        FROM base, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS t(i)
        UNION
        SELECT doc_id, text FROM base WHERE len(toks) < 2
    ),
    s1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM u
           GROUP BY doc_id ORDER BY gain DESC, doc_id ASC LIMIT 1),
    c1 AS (SELECT u.u FROM u JOIN s1 USING (doc_id)),
    d1 AS (SELECT doc_id FROM s1),{",".join(steps)}
    {" UNION ALL ".join(unions)}
    """


@q("q_select_cover", _cover_oracle())
def q_select_cover(spark, sf):
    # Greedy maximum-coverage data selection (the submodular
    # facility-location family — Nemhauser et al.'s (1−1/e) greedy, the
    # standard "pick a maximally diverse subset" primitive in training-
    # data curation): step t selects the document adding the most
    # not-yet-covered word bigrams. Inherently sequential in k, so the
    # engine shape is k distributed marginal-gain passes — each ONE
    # anti-join + aggregate over the persisted (doc, unit) relation with
    # the covered set broadcast — and a 1-row argmax collect per step
    # (the kmeans/census exception). The covered set stays a DataFrame
    # (never a driver set), so its size is bounded by broadcast limits,
    # not driver memory; at 100 TB one would swap the broadcast anti-join
    # for a shuffle anti-join past ~100M covered units — same plan
    # skeleton. Oracle replays the greedy as unrolled chained CTEs.
    from mongo_to_parquet_spark.functions.textfns import shingles
    from mongo_to_parquet_spark.operators.parallel import fan_out

    d = fan_out(T(spark, sf, "documents").select("doc_id", "text"))
    units = (
        d.select("doc_id", F.explode(shingles(F.col("text"), 2)).alias("u"))
        .distinct()
        .persist()  # k marginal-gain passes; caller clearCache()s after
    )
    covered = None
    selected: list[int] = []
    picked: list[tuple[int, int, int]] = []
    for t in range(1, _COVER_K + 1):
        cand = units
        if selected:
            cand = cand.filter(~F.col("doc_id").isin(selected))
        if covered is not None:
            cand = cand.join(F.broadcast(covered), "u", "left_anti")
        row = (
            cand.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("doc_id").asc())
            .limit(1)
            .collect()
        )
        if not row:
            break  # every remaining doc adds zero coverage
        doc, gain = row[0]["doc_id"], row[0]["gain"]
        picked.append((t, doc, gain))
        selected.append(doc)
        new_cov = units.filter(F.col("doc_id") == doc).select("u")
        covered = (
            new_cov if covered is None
            else covered.unionByName(new_cov).distinct()
        )
    return spark.createDataFrame(picked, "rk bigint, doc_id bigint, gain bigint")


_SNM_W = 10   # sorted-neighborhood window width


@q(
    "q_link_fs_snm",
    f"""
    WITH feats AS (
        SELECT c_custkey AS id, c_nationkey AS blk, c_mktsegment AS f1,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS f2, c_acctbal
        FROM customer
    ),
    vf AS (
        SELECT fld, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(['1:' || f1, '2:' || CAST(f2 AS VARCHAR)]) AS fld
              FROM feats)
        GROUP BY fld
    ),
    stats AS (
        SELECT CAST(SUM(CASE WHEN fld LIKE '1:%' THEN c * (c - 1) / 2 END)
                    AS BIGINT) AS num1,
               CAST(SUM(CASE WHEN fld LIKE '2:%' THEN c * (c - 1) / 2 END)
                    AS BIGINT) AS num2,
               CAST(SUM(CASE WHEN fld LIKE '1:%' THEN c END) AS BIGINT) AS n
        FROM vf
    ),
    {_FS_W_CTE},
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY blk
                                     ORDER BY c_acctbal ASC, id ASC) AS rn
        FROM feats
    ),
    pairs AS (
        SELECT a.id AS ida, b.id AS idb,
               CAST(a.f1 = b.f1 AS BIGINT) AS agree_seg,
               CAST(a.f2 = b.f2 AS BIGINT) AS agree_bal,
               ROUND(CASE WHEN a.f1 = b.f1 THEN wa1 ELSE wd1 END
                   + CASE WHEN a.f2 = b.f2 THEN wa2 ELSE wd2 END, 4) AS fs_score
        FROM ranked a
        JOIN UNNEST(generate_series(1, {_SNM_W})) AS t(j) ON true
        JOIN ranked b ON b.blk = a.blk AND b.rn = a.rn + j
        CROSS JOIN w
    )
    SELECT LEAST(ida, idb) AS id1, GREATEST(ida, idb) AS id2,
           agree_seg, agree_bal, fs_score
    FROM pairs
    ORDER BY fs_score DESC, id1 ASC, id2 ASC
    LIMIT {_FS_TOP}
    """,
)
def q_link_fs_snm(spark, sf):
    # the BOUNDED-candidates linkage route: q_link_fs scores every pair
    # inside a nation block, and the round-6 scaling run measured exactly
    # what that means — block cardinality is FIXED (25 nations), so
    # per-block density grows linearly with the corpus and pair counts
    # QUADRATICALLY (×100 pairs, wall ×19 at ×10 growth;
    # tools/scaletest_results_r6_newops.json). Sorted-neighborhood (SNM,
    # Hernández & Stolfo 1995) is the standard fix: order each block by a
    # proximity key (acctbal — near-duplicates have similar balances),
    # compare each record only to its next w=10 neighbors → candidates
    # are EXACTLY n·w, linear forever. The window offsets become an
    # EQUI-join — explode j∈[1,w], join on (blk, rn+j) — so no range
    # join, no skew beyond the block key itself; same FS weights as
    # q_link_fs (one stacked u-estimation pass).
    from mongo_to_parquet_spark.operators.parallel import fan_out

    c = T(spark, sf, "customer")
    feats = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("f1"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("f2"),
        "c_acctbal",
    )
    vf = (
        feats.select(
            F.explode(
                F.array(
                    F.concat(F.lit("1:"), F.col("f1")),
                    F.concat(F.lit("2:"), F.col("f2").cast("string")),
                )
            ).alias("fld")
        )
        .groupBy("fld")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pairs_of = F.col("c") * (F.col("c") - 1) / 2
    is1 = F.col("fld").startswith("1:")
    stats = vf.agg(
        F.sum(F.when(is1, pairs_of)).cast("bigint").alias("num1"),
        F.sum(F.when(~is1, pairs_of)).cast("bigint").alias("num2"),
        F.sum(F.when(is1, F.col("c"))).cast("bigint").alias("n"),
    )
    w = _fs_weights(stats)
    rn = F.row_number().over(
        Window.partitionBy("blk").orderBy(F.col("c_acctbal").asc(), F.col("id").asc())
    )
    ranked = fan_out(feats).withColumn("rn", rn)
    a = ranked.select(
        F.col("blk"), F.col("rn"),
        F.col("id").alias("ida"), F.col("f1").alias("af1"), F.col("f2").alias("af2"),
    ).withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(_SNM_W)))).select(
        "blk", (F.col("rn") + F.col("j")).alias("rn"), "ida", "af1", "af2"
    )
    b = ranked.select(
        "blk", "rn",
        F.col("id").alias("idb"), F.col("f1").alias("bf1"), F.col("f2").alias("bf2"),
    )
    scored = (
        a.join(b, ["blk", "rn"])
        .crossJoin(F.broadcast(w))
        .select(
            F.least("ida", "idb").alias("id1"),
            F.greatest("ida", "idb").alias("id2"),
            (F.col("af1") == F.col("bf1")).cast("bigint").alias("agree_seg"),
            (F.col("af2") == F.col("bf2")).cast("bigint").alias("agree_bal"),
            F.round(
                F.when(F.col("af1") == F.col("bf1"), F.col("wa1")).otherwise(
                    F.col("wd1")
                )
                + F.when(F.col("af2") == F.col("bf2"), F.col("wa2")).otherwise(
                    F.col("wd2")
                ),
                4,
            ).alias("fs_score"),
        )
    )
    return scored.orderBy(
        F.col("fs_score").desc(), F.col("id1").asc(), F.col("id2").asc()
    ).limit(_FS_TOP)


def _bpe_curve_sql(k: int = _BPE_TRAIN_K) -> str:
    """The merge-value curve: the training chain already materializes the
    census AFTER every merge (w_0..w_k), so each curve point is one
    aggregate over an existing CTE. Generated with k+1 so w_k exists;
    the dangling p/m CTEs of the extra step are never referenced and
    DuckDB does not evaluate unreferenced CTEs."""
    # COALESCE: a census with no multi-char words sums to NULL, but the
    # honest total is the single-char constant alone; HAVING: point i
    # exists only if merge i actually happened (m_i non-empty) — training
    # can run dry before k, and the Spark loop stops there too (the
    # degenerate-corpus review caught both: Spark crashed on int(None)
    # while DuckDB emitted k+1 NULL rows)
    counts = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS n_merges,"
        f" COALESCE(CAST(SUM(wc * len(list_filter(string_split(sym, '·'),"
        f" x -> x <> ''))) AS BIGINT), 0) + (SELECT o FROM ones)"
        f" AS total_subwords FROM w{i}"
        + (f"\n    HAVING (SELECT COUNT(*) FROM m{i}) = 1" if i > 0 else "")
        for i in range(0, k + 1)
    )
    return (
        _bpe_train_ctes(k + 1)
        + f""",
    ones AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS o
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) = 1
    )
    SELECT * FROM ({counts}) ORDER BY n_merges ASC
    """
    )


@q("q_bpe_curve", _bpe_curve_sql())
def q_bpe_curve(spark, sf):
    # the MERGE-VALUE curve — corpus subword count after 0..k BPE merges,
    # the marginal-compression report a vocab-size decision reads (each
    # row's delta = tokens saved by that merge; the knee is where you
    # stop growing the vocabulary). Point 0 = character count. Single-
    # char words ride as a constant (they never merge). The oracle reads
    # each count off the training chain's OWN intermediate censuses
    # (w_0..w_k already exist as CTEs); the Spark side replays the
    # trained merges progressively over the persisted census with one
    # census-sized aggregate per point.
    #
    # Scale: training cost as q_bpe_train (census loop); the curve adds
    # k+1 census-sized aggregates — nothing corpus-sized beyond the one
    # census scan.
    merges = _bpe_train_merges(spark, sf)
    d = T(spark, sf, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w"))
    ones = words.filter(F.length("w") == 1).count()
    spelled = F.expr(
        "array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), '·')"
    )
    census = (
        words.filter(F.length("w") >= 2)
        .select(spelled.alias("sym"))
        .groupBy("sym")
        .agg(F.count(F.lit(1)).alias("wc"))
        .persist()  # k+1 curve aggregates; tail unpersisted in finally
    )

    def total(cdf):
        n = cdf.select(
            F.sum(
                F.col("wc")
                * F.size(F.filter(F.split("sym", "·"), lambda t: t != ""))
            ).alias("t")
        ).collect()[0]["t"]
        # empty census (no multi-char words) sums to NULL — the total is
        # the single-char constant alone
        return int(n or 0) + ones

    # try/finally: the tail census must not outlive the call — every
    # curve point is collected eagerly (total()), so nothing returned
    # depends on the cache (round-7 verdict finding #1)
    try:
        rows = [(0, total(census))]
        for rank, x, y, _, _ in merges:
            s = F.split("sym", "·")
            fold = F.aggregate(
                F.slice(s, F.lit(2), F.size(s) - 1),
                F.element_at(s, 1),
                lambda acc, el: F.when(
                    (F.regexp_extract(acc, "[^·]*$", 0) == F.lit(x))
                    & (el == F.lit(y)),
                    F.concat(acc, F.lit(y)),
                ).otherwise(F.concat(acc, F.lit("·"), el)),
            )
            # persist-chain like _bpe_train_merges: each curve point's
            # aggregate must not replay every earlier fold from the base
            prev = census
            census = prev.select(fold.alias("sym"), "wc").persist()
            rows.append((rank, total(census)))
            prev.unpersist()
    finally:
        census.unpersist()
    return spark.createDataFrame(
        rows, "n_merges bigint, total_subwords bigint"
    ).orderBy("n_merges")


# ------------------------------------------- unigram-LM tokenizer (Kudo) ---
#: max piece length, seed/keep sizes for multi-char pieces, EM rounds
_UNI_LMAX = 4
_UNI_SEED = 60
_UNI_KEEP = 40
_UNI_ITERS = 2
#: word-length cap: words longer than this are excluded from the census
#: AND from the apply-side accounting in BOTH engines (fixture max ~20)
_UNI_WMAX = 32
#: score base: a segmentation's score is k·BIG − Σ(cnt_i + 1) over its k
#: pieces, so minimizing = (fewest pieces, then highest total piece
#: frequency) in ONE integer — the engine-exact Viterbi objective. BIG is
#: a power of two so score/BIG stays exact under double division; the +1
#: Laplace term keeps Σ(cnt_i+1) ≥ 1 so the piece count recovers as
#: ceil(score/BIG) with no boundary ambiguity. Bounds: len ≤ 32 pieces ×
#: 2^36 ≈ 2^41 ≪ 2^52 (exact-double range); needs Σ(cnt+1) < 2^36, i.e.
#: piece counts ≲ 2^31 — raise BIG (headroom to ~2^46) for larger corpora.
_UNI_BIG = 1 << 36


def _uni_dp_sql(word: str, vm: str) -> str:
    """DuckDB Viterbi DP fold: returns a BIGINT list dp where dp[p+1] is
    the best segmentation score of word[1..p] (dp[1] = 0). Candidate at
    position i, piece length L: dp[i−L] + BIG − (cnt(piece)+1); absent
    pieces give NULL (null-skipped by least in both engines). The fold's
    init list rides as the prepended first element (list_reduce has no
    init parameter)."""
    cands = ", ".join(
        f"CASE WHEN el[1] >= {L} THEN acc[CAST(el[1] AS INT) - {L - 1}]"
        f" + {_UNI_BIG} - (map_extract({vm}, substr({word},"
        f" CAST(el[1] AS INT) - {L - 1}, {L}))[1] + 1) END"
        for L in range(1, _UNI_LMAX + 1)
    )
    return (
        "list_reduce(list_prepend(CAST([0] AS BIGINT[]),"
        f" list_transform(generate_series(1, len({word})),"
        " x -> [CAST(x AS BIGINT)])),"
        f" (acc, el) -> list_append(acc, least({cands})))"
    )


def _uni_match_sql(word: str, vm: str, dp: str, L: int) -> str:
    p = "CAST(acc[1] AS BIGINT)"
    return (
        f"{p} >= {L} AND {dp}[CAST({p} AS INT) + 1]"
        f" = {dp}[CAST({p} AS INT) - {L} + 1] + {_UNI_BIG}"
        f" - (map_extract({vm}, substr({word},"
        f" CAST({p} AS INT) - {L} + 1, {L}))[1] + 1)"
    )


def _uni_pieces_sql(word: str, vm: str, dp: str) -> str:
    """DuckDB backtrace fold: walks the DP table end→start, recomputing
    the candidate equality at each position and taking the SMALLEST
    matching piece length (the deterministic tie rule both engines
    share), accumulating pieces left-to-right. The accumulator is a
    VARCHAR list whose first slot carries the current position.

    The fold runs EXACTLY k times, where k = ceil(dp_n/BIG) is the piece
    count recovered from the DP score — never length-of-word times with
    an identity branch for the exhausted tail: DuckDB 1.0.0's
    list_reduce reuses the FIRST row's result for later rows in the same
    vector when the lambda can return ``acc`` unchanged (reproduced in
    tests/test_adversarial_r8.py), so every iteration must build a fresh
    list. The Spark twin iterates k times too (_uni_pieces_col)."""
    p = "CAST(acc[1] AS BIGINT)"
    lsel = " ".join(
        f"WHEN {_uni_match_sql(word, vm, dp, L)} THEN {L}"
        for L in range(1, _UNI_LMAX + 1)
    )
    piece = " ".join(
        f"WHEN {_uni_match_sql(word, vm, dp, L)}"
        f" THEN substr({word}, CAST({p} AS INT) - {L} + 1, {L})"
        for L in range(1, _UNI_LMAX + 1)
    )
    k = f"({dp}[CAST(len({word}) AS INT) + 1] + {_UNI_BIG - 1}) // {_UNI_BIG}"
    return (
        f"list_reduce(list_prepend([CAST(len({word}) AS VARCHAR)],"
        f" list_transform(generate_series(1, {k}),"
        " x -> [CAST(x AS VARCHAR)])),"
        f" (acc, el) -> list_concat("
        f"[CAST({p} - (CASE {lsel} END) AS VARCHAR), CASE {piece} END],"
        " acc[2:]))[2:]"
    )


def _unigram_ctes(iters: int = _UNI_ITERS) -> str:
    """Chained-CTE WITH block for the full unigram trainer (lesson 27):
    w0 = word census; sing/seed = character + top-substring seed vocab;
    then per EM round t: m_t (vocab as a 1-row MAP) → d_t (per-census-
    word Viterbi DP) → seg_t (backtraced pieces) → u_t (usage counts) →
    v_t (all single chars + top multis by usage). Shared by
    q_unigram_train (emits v_T) and q_unigram_pipeline (applies v_T to
    the corpus)."""
    lens = ", ".join(str(L) for L in range(2, _UNI_LMAX + 1))
    sql = f"""
    WITH w0 AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' AND len(w) <= {_UNI_WMAX} GROUP BY w
    ),
    sing AS (
        SELECT substr(w, CAST(i AS INT), 1) AS piece,
               CAST(SUM(wc) AS BIGINT) AS cnt
        FROM w0, UNNEST(generate_series(1, len(w))) AS ti(i)
        GROUP BY piece
    ),
    seed AS (
        SELECT piece, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
            SELECT substr(w, CAST(i AS INT), CAST(L AS INT)) AS piece, wc
            FROM w0, UNNEST([{lens}]) AS tl(L),
                 UNNEST(generate_series(1, len(w) - L + 1)) AS ti(i)
            WHERE len(w) >= L
        ) GROUP BY piece
        ORDER BY cnt DESC, piece ASC LIMIT {_UNI_SEED}
    ),
    v0 AS (SELECT * FROM sing UNION ALL SELECT * FROM seed)"""
    for t in range(1, iters + 1):
        sql += f""",
    m{t} AS (SELECT MAP(list(piece ORDER BY piece),
                        list(cnt ORDER BY piece)) AS vm FROM v{t - 1}),
    d{t} AS (SELECT w, wc, vm, {_uni_dp_sql("w", "vm")} AS dp
             FROM w0 CROSS JOIN m{t}),
    seg{t} AS (SELECT unnest({_uni_pieces_sql("w", "vm", "dp")}) AS piece,
                      wc
               FROM d{t}),
    u{t} AS (SELECT piece, CAST(SUM(wc) AS BIGINT) AS cnt
             FROM seg{t} GROUP BY piece),
    v{t} AS (
        SELECT s.piece, COALESCE(u.cnt, 0) AS cnt
        FROM sing s LEFT JOIN u{t} u ON s.piece = u.piece
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM u{t} WHERE len(piece) >= 2
            ORDER BY cnt DESC, piece ASC LIMIT {_UNI_KEEP})
    )"""
    return sql


def _uni_cost_col(word, vm, start, L: int):
    """Spark twin of the oracle's cost term: BIG − (cnt(piece)+1);
    NULL when the piece is not in the vocab map."""
    return F.lit(_UNI_BIG) - (
        F.element_at(vm, word.substr(start.cast("int"), F.lit(L).cast("int")))
        + F.lit(1)
    )


def _uni_dp_col(word, vm):
    def step(acc, i):
        cands = [
            F.when(
                i >= L,
                F.element_at(acc, (i - (L - 1)).cast("int"))
                + _uni_cost_col(word, vm, i - (L - 1), L),
            )
            for L in range(1, _UNI_LMAX + 1)
        ]
        return F.concat(acc, F.array(F.least(*cands)))

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0).cast("long")),
        step,
    )


def _uni_pieces_col(word, vm, dp):
    def match(p, L: int):
        return (p >= L) & (
            F.element_at(dp, (p + 1).cast("int"))
            == F.element_at(dp, (p - L + 1).cast("int"))
            + _uni_cost_col(word, vm, p - L + 1, L)
        )

    def step(acc, _):
        p = F.element_at(acc, 1).cast("long")
        l = F.when(match(p, 1), 1)
        for L in range(2, _UNI_LMAX + 1):
            l = l.when(match(p, L), L)
        l = l.cast("long")
        piece = word.substr((p - l + 1).cast("int"), l.cast("int"))
        return F.concat(
            F.array((p - l).cast("string"), piece),
            F.slice(acc, F.lit(2), F.size(acc) - 1),
        )

    # exactly k iterations (k = piece count from the DP score), matching
    # the oracle fold step for step — see _uni_pieces_sql on why neither
    # side may carry an identity branch
    k = F.floor(
        (
            F.element_at(dp, (F.length(word) + 1).cast("int"))
            + F.lit(_UNI_BIG - 1)
        )
        / F.lit(_UNI_BIG)
    ).cast("long")
    bt = F.aggregate(
        F.sequence(F.lit(1), k),
        F.array(F.length(word).cast("string")),
        step,
    )
    return F.slice(bt, F.lit(2), F.size(bt) - 1)


def _uni_census(spark, sf):
    d = T(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") <= _UNI_WMAX))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )


def _uni_vm_lit(vocab: dict[str, int]):
    """The trained vocab as a LITERAL map column (the kmeans
    bind-as-driver-literals discipline): pieces are data but enter the
    plan through F.lit, never string interpolation (lesson 32). An empty
    vocab (token-less corpus) yields a NULL map — every lookup NULLs and
    downstream stages emit zero rows, matching the oracle."""
    if not vocab:
        return F.lit(None).cast("map<string,bigint>")
    return F.create_map(
        *[F.lit(x) for p, c in sorted(vocab.items()) for x in (p, c)]
    )


def _unigram_train_vocab(spark, sf) -> tuple[dict[str, int], list[str]]:
    return _unigram_train_from_census(_uni_census(spark, sf))


def _unigram_train_from_census(census) -> tuple[dict[str, int], list[str]]:
    """The iterative trainer: census → seed collect → EM rounds of
    (Viterbi-segment the census under the current vocab → usage count →
    prune). Returns (final vocab, single-char pieces). Takes the (w, wc)
    census as an explicit input — the swappable-census entry point
    (q_bpe_retrain_incremental's pattern), so an incrementally
    maintained word-count state can retrain this family without a
    corpus rescan (note the unigram census keys on the RAW word, not
    the spelled symbols, and caps length at _UNI_WMAX).

    Every collect is VOCABULARY-bounded (≤ alphabet + SEED rows — the
    q_bpe_train bounded-driver-pick discipline), and each round's vocab
    re-enters the plan as literals, so round t's plan never replays
    round t−1's segmentation through lazy lineage — the first cut of
    this trainer was one static unrolled DAG and planned 34 corpus scans
    at 2 rounds (~5^N subtree growth, lesson 9). The census persists for
    the duration of the call (try/finally, the round-7 leak rule)."""
    census = census.persist()
    try:
        sing_rows = (
            census.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
                    )
                ).alias("piece"),
                "wc",
            )
            .groupBy("piece")
            .agg(F.sum("wc").cast("long").alias("cnt"))
            .collect()
        )
        seed_rows = (
            census.select(
                F.explode(
                    F.expr(
                        f"flatten(transform(sequence(2, {_UNI_LMAX}), L ->"
                        " CASE WHEN length(w) >= L THEN transform("
                        "sequence(1, length(w) - L + 1), i -> substring(w, i, L))"
                        " ELSE cast(array() AS array<string>) END))"
                    )
                ).alias("piece"),
                "wc",
            )
            .groupBy("piece")
            .agg(F.sum("wc").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(_UNI_SEED)
            .collect()
        )
        sing = [r["piece"] for r in sing_rows]
        vocab = {r["piece"]: r["cnt"] for r in sing_rows}
        vocab.update({r["piece"]: r["cnt"] for r in seed_rows})
        # EM rounds under the pinned loop conf (the _merge_loop_env
        # discipline): every round is one vocabulary-bounded aggregate
        # over the CACHED census — width follows the cache (the seed
        # collects above materialized it), and AQE has nothing to
        # re-plan per round. Round-12 A/B in _merge_loop_env's note.
        with _loop_conf(census.sparkSession, census.rdd.getNumPartitions()):
            for _ in range(_UNI_ITERS):
                vm = _uni_vm_lit(vocab)
                # vm bound ONCE as a column, dp built over the column ref —
                # the inline form put one copy of the vocab-map literal at
                # every DP cost site (4 per step), quadrupling the plan tree
                # per round (round-11; same staging rule as _eval_family_stats)
                d = census.select("w", "wc", vm.alias("vm")).select(
                    "w",
                    "wc",
                    "vm",
                    _uni_dp_col(F.col("w"), F.col("vm")).alias("dp"),
                )
                usage_rows = (
                    d.select(
                        F.explode(
                            _uni_pieces_col(F.col("w"), F.col("vm"), F.col("dp"))
                        ).alias("piece"),
                        "wc",
                    )
                    .groupBy("piece")
                    .agg(F.sum("wc").cast("long").alias("cnt"))
                    .collect()
                )
                usage = {r["piece"]: r["cnt"] for r in usage_rows}
                vocab = {ch: usage.get(ch, 0) for ch in sing}
                vocab.update(
                    dict(
                        sorted(
                            ((p, c) for p, c in usage.items() if len(p) >= 2),
                            key=lambda kv: (-kv[1], kv[0]),
                        )[:_UNI_KEEP]
                    )
                )
    finally:
        census.unpersist()
    return vocab, sing


@q(
    "q_unigram_train",
    _unigram_ctes() + f"\n    SELECT piece, cnt FROM v{_UNI_ITERS}",
)
def q_unigram_train(spark, sf):
    # unigram-LM (SentencePiece-style) tokenizer TRAINING (Kudo 2018) —
    # the tokenizer family beside BPE (q_bpe_train): seed a substring
    # vocabulary from the word census, then EM rounds of (Viterbi-segment
    # every census word under the current vocab → recount piece usage →
    # prune to the top pieces), emitting the final (piece, cnt) table
    # that q_unigram_pipeline applies. Deviation from Kudo's soft-EM,
    # documented: the E-step is VITERBI (hard) assignment and the
    # objective is the integer lexicographic pair (fewest pieces, then
    # highest total piece frequency) encoded as k·BIG − Σ(cnt+1) — real-
    # valued log-likelihoods would make every argmax engine-divergent
    # (lesson 17/29: the hazard is divergence), while this trainer's
    # every decision — DP minima, backtrace tie-breaks (smallest piece
    # length), seed/prune top-k cuts — is exact integer arithmetic both
    # engines replay bit-identically. Oracle = the same seed→EM chain as
    # unrolled CTEs with the vocab riding as a 1-row MAP and the DP /
    # backtrace as list_reduce folds (_unigram_ctes), the q_bpe_train
    # discipline applied to a DP-shaped trainer.
    #
    # Scale: ONE corpus scan builds the census (persisted for the call,
    # released in finally); every EM round is census-sized (distinct
    # words × frequency — the same trick that makes q_bpe_train
    # corpus-scale: iterations never touch the corpus), the vocab rides
    # as ~100 plan literals, and the only shuffles are vocabulary-sized
    # usage counts. Driver picks are vocabulary-BOUNDED collects per
    # round (the q_bpe_train discipline) — binding each round's vocab as
    # literals is also what keeps the plan linear in rounds (lesson 9:
    # the static unrolled DAG planned 34 corpus scans at 2 rounds).
    vocab, _ = _unigram_train_vocab(spark, sf)
    return spark.createDataFrame(
        sorted(vocab.items()), "piece string, cnt bigint"
    )


@q(
    "q_unigram_pipeline",
    _unigram_ctes()
    + f""",
    mf AS (SELECT MAP(list(piece ORDER BY piece),
                      list(cnt ORDER BY piece)) AS vm FROM v{_UNI_ITERS}),
    words AS (
        SELECT lang, doc_id, w FROM (
            SELECT lang, doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
        WHERE w <> '' AND len(w) <= {_UNI_WMAX}
    ),
    app AS (
        SELECT lang, doc_id,
               (dp[CAST(len(w) AS INT) + 1] + {_UNI_BIG - 1}) // {_UNI_BIG}
                   AS k
        FROM (SELECT lang, doc_id, w, {_uni_dp_sql("w", "vm")} AS dp
              FROM words CROSS JOIN mf)
    )
    SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(k) AS BIGINT) AS n_subwords
    FROM app GROUP BY lang
    """,
)
def q_unigram_pipeline(spark, sf):
    # the COMPOSED unigram pipeline — train on the corpus, then Viterbi-
    # tokenize the SAME corpus with the trained vocab, reporting
    # per-language word vs subword counts (q_bpe_pipeline's report for
    # the second tokenizer family, so the two are directly comparable).
    # The subword count per word falls out of the DP score WITHOUT a
    # backtrace: score = k·BIG − Σ(cnt+1) with 1 ≤ Σ(cnt+1) < BIG, so
    # k = ceil(score/BIG) exactly — the apply side is a map-only DP fold
    # per word occurrence plus one aggregation. Docs whose every word is
    # empty or over the length cap drop out of the accounting in BOTH
    # engines (n_docs counts docs with ≥ 1 counted word).
    #
    # Scale: training as in q_unigram_train (census-sized); apply is one
    # corpus scan with the final vocab broadcast as a map — no backtrace
    # allocation, no shuffle before the per-language rollup. Precondition
    # shared by both engines: apply text is the training corpus (or a
    # subset), so every character is in the vocab and no DP cell is NULL.
    vocab, _ = _unigram_train_vocab(spark, sf)
    vm = _uni_vm_lit(vocab)
    d = T(spark, sf, "documents")
    words = d.select(
        "lang", "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter((F.col("w") != "") & (F.length("w") <= _UNI_WMAX))
    # the DP fold is an interpreted HOF (lesson 25/41): run it once per
    # DISTINCT word — the same census trick every trainer here uses —
    # and join the piece counts back onto the occurrences (AQE
    # broadcasts the word→k table when it is small; at open-vocabulary
    # scale it degrades to a keyed join, still ∝ distinct words, never
    # per-occurrence fold work). Measured 9.0s → per-distinct at sf0.1.
    wk = words.select("w").distinct().select(
        "w",
        F.floor(
            (
                F.element_at(
                    _uni_dp_col(F.col("w"), vm),
                    (F.length("w") + 1).cast("int"),
                )
                + F.lit(_UNI_BIG - 1)
            )
            / F.lit(_UNI_BIG)
        )
        .cast("long")
        .alias("k"),
    )
    scored = words.join(wk, "w")
    return scored.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("k").cast("bigint").alias("n_subwords"),
    )


# ------------------------------------------ WordPiece tokenizer training ---
_WP_TRAIN_K = 8
#: integer score scale: WordPiece picks the pair maximizing
#: cnt(xy)/(cnt(x)·cnt(y)); both engines compare cnt_xy·SCALE // (cx·cy)
#: — exact floor-div, no rationals. Bounds (lesson 17): cnt_xy·SCALE needs
#: cnt ≤ 9.2e9 and cx·cy ≤ 9.2e18 — fine to ~10^9 total symbols; promote
#: to DECIMAL(38) beyond that.
_WP_SCALE = 10**9


def _wp_train_ctes(k: int = _WP_TRAIN_K) -> str:
    """Chained-CTE WITH block for k unrolled WordPiece merge iterations —
    the q_bpe_train chain with the argmax swapped to the likelihood score:
    per iteration u_i (symbol counts with multiplicity) + p_i (pair
    counts) → m_i (argmax of cnt·SCALE // (cx·cy), ties (x, y)) → w_i
    (the same left-to-right non-overlapping rewrite fold). Every CTE
    is AS MATERIALIZED: DuckDB inlines CTEs by default (lesson 9), and
    this chain references w_{i-1} THREE times per iteration (u, p, w),
    so the inlined expansion is 3^k document scans — the first run died
    on fd exhaustion before it could be slow."""
    sql = """
    WITH w0 AS MATERIALIZED (
        SELECT array_to_string(list_transform(generate_series(1, len(w)),
                   i -> substr(w, CAST(i AS INT), 1)), '·') AS sym,
               CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 2 GROUP BY sym
    )"""
    for i in range(1, k + 1):
        sql += f""",
    u{i} AS MATERIALIZED (
        SELECT t AS s1, CAST(SUM(wc) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(sym, '·')) AS t, wc FROM w{i - 1})
        GROUP BY t
    ),
    p{i} AS MATERIALIZED (
        SELECT s[CAST(i AS INT)] AS x, s[CAST(i AS INT) + 1] AS y,
               CAST(SUM(wc) AS BIGINT) AS cnt
        FROM (SELECT string_split(sym, '·') AS s, wc FROM w{i - 1}),
             UNNEST(generate_series(1, len(s) - 1)) AS t(i)
        GROUP BY x, y
    ),
    m{i} AS MATERIALIZED (
        SELECT x, y, cnt, cnt * {_WP_SCALE} // (ux.c * uy.c) AS score_x1e9
        FROM p{i} JOIN u{i} ux ON ux.s1 = p{i}.x
                  JOIN u{i} uy ON uy.s1 = p{i}.y
        ORDER BY score_x1e9 DESC, x ASC, y ASC LIMIT 1
    )"""
        if i < k:
            sql += f""",
    w{i} AS MATERIALIZED (
        SELECT list_reduce(string_split(w{i - 1}.sym, '·'), (acc, s) ->
                   CASE WHEN regexp_extract(acc, '[^·]*$') = m{i}.x
                             AND s = m{i}.y
                        THEN acc || m{i}.y ELSE acc || '·' || s END) AS sym,
               wc
        FROM w{i - 1} CROSS JOIN m{i}
    )"""
    return sql


def _wp_train_sql(k: int = _WP_TRAIN_K) -> str:
    union = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, x, y, x || y AS merged,"
        f" cnt, score_x1e9 FROM m{i}"
        for i in range(1, k + 1)
    )
    return _wp_train_ctes(k) + f"\n    SELECT * FROM ({union}) ORDER BY rank ASC"


def _wp_train_merges(spark, sf, k: int = _WP_TRAIN_K):
    """The iterative WordPiece loop (census → k × [symbol count + pair
    count → 1-row score argmax collect → fold rewrite]); returns
    [(rank, x, y, merged, cnt, score_x1e9)]. Shared by q_wordpiece_train
    and q_wordpiece_pipeline. Same persist-chain + try/finally shape as
    _bpe_train_merges (lesson 36 / round-7 leak rule)."""
    return _wp_train_from_census(_bpe_census(spark, sf), k)


#: the WordPiece per-iteration statement: pair counts scored by
#: likelihood gain cnt/(cx·cy) against the per-symbol counts, all from
#: ONE census pass composed in one statement (the symbol-count side
#: broadcasts — it is alphabet+merges-sized at any corpus scale)
_WP_ARGMAX_SQL = """
WITH syms AS (
  SELECT s1, SUM(wc) AS c FROM (
    SELECT explode(split(sym, '·')) AS s1, wc FROM {view}) GROUP BY s1
), pairs AS (
  SELECT p.x AS x, p.y AS y, SUM(wc) AS cnt FROM (
    SELECT explode(transform(sequence(1, size(split(sym, '·')) - 1),
        i -> struct(split(sym, '·')[i-1] AS x, split(sym, '·')[i] AS y))) AS p, wc
    FROM {view} WHERE size(split(sym, '·')) >= 2) GROUP BY p.x, p.y
)
SELECT /*+ BROADCAST(sx), BROADCAST(sy) */ pairs.x, pairs.y, cnt,
       (cnt * {scale}) div (sx.c * sy.c) AS score_x1e9
FROM pairs JOIN syms sx ON pairs.x = sx.s1 JOIN syms sy ON pairs.y = sy.s1
ORDER BY score_x1e9 DESC, pairs.x ASC, pairs.y ASC LIMIT 1
"""


def _wp_train_from_census(census, k: int = _WP_TRAIN_K):
    """WordPiece training FROM an explicit (sym, wc) census — the same
    swappable-census entry point as _bpe_train_from_census (both merge
    families share ONE census definition, _bpe_census), so an
    incrementally-maintained census state retrains this family too.
    Same one-statement-per-iteration / deferred-unpersist loop shape as
    _bpe_train_from_census (round-11)."""
    merges: list[tuple[int, str, str, str, int, int]] = []
    with _merge_loop_env(census) as (spark, st, view):
        for rank in range(1, k + 1):
            top = spark.sql(
                _WP_ARGMAX_SQL.format(view=view, scale=_WP_SCALE)
            ).collect()
            if st.pending is not None:
                st.pending.unpersist()
                st.pending = None
            if not top:
                break
            x, y = top[0]["x"], top[0]["y"]
            merges.append(
                (rank, x, y, x + y, int(top[0]["cnt"]), int(top[0]["score_x1e9"]))
            )
            if rank == k:
                break
            s = F.split("sym", "·")
            fold = F.aggregate(
                F.slice(s, F.lit(2), F.size(s) - 1),
                F.element_at(s, 1),
                lambda acc, el: F.when(
                    (F.regexp_extract(acc, "[^·]*$", 0) == F.lit(x))
                    & (el == F.lit(y)),
                    F.concat(acc, F.lit(y)),
                ).otherwise(F.concat(acc, F.lit("·"), el)),
            )
            st.pending = st.census
            st.census = st.pending.select(fold.alias("sym"), "wc").persist()
            st.census.createOrReplaceTempView(view)
    return merges


@q("q_wordpiece_train", _wp_train_sql())
def q_wordpiece_train(spark, sf):
    # WordPiece tokenizer training (Schuster & Nakajima 2012 — the BERT
    # tokenizer family), completing the trainer TRIAD beside q_bpe_train
    # and q_unigram_train: the loop is BPE's (census → k × [pair stats →
    # argmax merge → rewrite]) but the merge choice maximizes the
    # unigram-LM LIKELIHOOD GAIN cnt(xy)/(cnt(x)·cnt(y)) instead of raw
    # frequency — rare-but-strongly-associated pairs merge first. Both
    # engines compare the integer cnt·1e9 // (cx·cy) (floor-div exact;
    # ties (score desc, x, y)) so the argmax sequence is engine-exact
    # (lesson 17: a rational or float score would diverge). Oracle = k
    # unrolled chained CTEs with per-iteration symbol-count relations.
    #
    # Scale: identical to q_bpe_train — ONE corpus scan builds the word
    # census, every iteration is census-sized (pair count ≤ alphabet²
    # shuffle keys + an alphabet-sized symbol count that BROADCASTS into
    # the score join) + a 1-row argmax collect; persist-chain keeps fold
    # work linear in k.
    merges = _wp_train_merges(spark, sf)
    return spark.createDataFrame(
        merges,
        "rank bigint, x string, y string, merged string,"
        " cnt bigint, score_x1e9 bigint",
    ).orderBy("rank")


@q("q_wordpiece_pipeline", _wp_train_ctes() + _merge_apply_sql(_WP_TRAIN_K))
def q_wordpiece_pipeline(spark, sf):
    # the COMPOSED WordPiece pipeline — train on the corpus, tokenize the
    # SAME corpus with the trained merges, per-language word vs subword
    # counts: the q_bpe_pipeline report for the third tokenizer family,
    # so all three (BPE / unigram / WordPiece) are directly comparable on
    # one corpus. Spark feeds _wp_train_merges into the SAME expression
    # builder BPE applies with (bpe_apply_cols — merge folding is
    # family-agnostic); the oracle appends the SAME apply tail
    # (_merge_apply_sql) to the WordPiece train CTEs — one apply
    # definition gates both families (the shared-CTE discipline).
    #
    # Scale: training as in q_wordpiece_train; apply is one map-only
    # corpus pass with the merge table folded in as expression literals.
    merges = _wp_train_merges(spark, sf)
    n_words, n_subwords = bpe_apply_cols([(x, y) for _, x, y, _, _, _ in merges])
    d = T(spark, sf, "documents")
    return (
        d.select("lang", n_words.alias("nw"), n_subwords.alias("ns"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nw").cast("bigint").alias("n_words"),
            F.sum("ns").cast("bigint").alias("n_subwords"),
        )
    )


#: vocab-size curve points: number of multi-char pieces kept at each point
_UNI_CURVE_MS = (0, 10, 20, 40)


def _unigram_curve_sql() -> str:
    """Oracle for q_unigram_curve: the trained vocab v_T restricted to
    its top-m multi-char pieces per point (singles always kept — the
    fallback alphabet), the census re-segmented under each restricted
    map, total subwords from the DP score. Chained onto _unigram_ctes."""
    import re

    pts = []
    # the curve references v_T from 3 CTEs per point (lesson 39: DuckDB
    # inlines CTEs by default, so each reference re-runs the whole EM
    # chain — 51s → ~7s measured at sf0.001): materialize every CTE of
    # the training chain for this consumer
    sql = re.sub(
        r"(\n    (?:w0|sing|seed|v\d+|m\d+|d\d+|seg\d+|u\d+) AS) \(",
        r"\1 MATERIALIZED (",
        _unigram_ctes(),
    ).replace("WITH w0 AS (", "WITH w0 AS MATERIALIZED (")
    for m in _UNI_CURVE_MS:
        sql += f""",
    vc{m} AS (
        SELECT piece, cnt FROM v{_UNI_ITERS} WHERE len(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM v{_UNI_ITERS} WHERE len(piece) >= 2
            ORDER BY cnt DESC, piece ASC LIMIT {m})
    ),
    mm{m} AS (SELECT MAP(list(piece ORDER BY piece),
                         list(cnt ORDER BY piece)) AS vm FROM vc{m}),
    pt{m} AS (
        SELECT CAST({m} AS BIGINT) AS n_multi_pieces,
               CAST(COALESCE(SUM(wc * ((dp[CAST(len(w) AS INT) + 1]
                    + {_UNI_BIG - 1}) // {_UNI_BIG})), 0) AS BIGINT)
                   AS total_subwords
        FROM (SELECT w, wc, vm, {_uni_dp_sql("w", "vm")} AS dp
              FROM w0 CROSS JOIN mm{m})
    )"""
        pts.append(f"SELECT * FROM pt{m}")
    return sql + "\n    " + "\n    UNION ALL ".join(pts)


@q("q_unigram_curve", _unigram_curve_sql())
def q_unigram_curve(spark, sf):
    # the unigram VOCAB-SIZE curve — corpus total subword count with the
    # trained vocabulary restricted to its top-m multi-char pieces
    # (m = 0 is the character baseline; singles always remain, so every
    # word stays segmentable): the marginal-compression report a
    # vocab-budget decision reads for the unigram family, exactly what
    # q_bpe_curve is for BPE — each point's delta is the tokens the next
    # block of pieces buys, and the knee says where to stop growing the
    # vocabulary. The piece count per word falls out of the DP score
    # (no backtrace), and each point's restricted vocab is a literal map
    # over the ALREADY-trained v_T — deterministic (cnt desc, piece)
    # cuts, so both engines pick identical sub-vocabularies.
    #
    # Scale: train as q_unigram_train (census-sized EM); then ONE
    # persisted census re-aggregated once per point (|points| DP passes
    # over distinct words × frequency, never the corpus); output is
    # |points| rows. Monotone: total_subwords is non-increasing in m
    # (a superset vocab can only improve the DP minimum) — pinned in
    # tests/test_curation.py.
    vocab, sing = _unigram_train_vocab(spark, sf)
    multis = sorted(
        ((p, c) for p, c in vocab.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )
    census = _uni_census(spark, sf).persist()
    try:
        rows = []
        for m in _UNI_CURVE_MS:
            vm = _uni_vm_lit(
                {p: vocab[p] for p in sing} | dict(multis[:m])
            )
            k = F.floor(
                (
                    F.element_at(
                        _uni_dp_col(F.col("w"), vm),
                        (F.length("w") + 1).cast("int"),
                    )
                    + F.lit(_UNI_BIG - 1)
                )
                / F.lit(_UNI_BIG)
            ).cast("long")
            [r] = census.agg(
                F.coalesce(F.sum(F.col("wc") * k), F.lit(0))
                .cast("long")
                .alias("t")
            ).collect()
            rows.append((m, int(r["t"])))
    finally:
        census.unpersist()
    return spark.createDataFrame(
        rows, "n_multi_pieces bigint, total_subwords bigint"
    ).orderBy("n_multi_pieces")


# ------------------------------- tokenizer artifacts (train once, serve) ---
# store-location and staleness policy live in operators/tokenizer.py
# (shared with the langid artifact key in queries/llm.py)
_tok_art_dir = tokenizer.artifact_dir
_tok_artifact_current = tokenizer.artifact_current


def _merge_family_apply(spark, sf, merges):
    """The shared apply tail for the merge families (BPE / WordPiece)
    once the rank-ordered merge list is in hand — identical to the
    inline pipelines' aggregation so artifact and inline paths cannot
    drift in accounting."""
    n_words, n_subwords = bpe_apply_cols(merges)
    d = T(spark, sf, "documents")
    return (
        d.select("lang", n_words.alias("nw"), n_subwords.alias("ns"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nw").cast("bigint").alias("n_words"),
            F.sum("ns").cast("bigint").alias("n_subwords"),
        )
    )



def _bpe_merges_artifact(spark, sf) -> list[tuple[str, str]]:
    """Ensure-then-load for the BPE artifact: train+persist iff the
    stored version is missing or trained under a different k, then
    return the rank-ordered merge pairs from the STORE (never from the
    in-memory trainer — the serving path is the only path)."""
    art = _tok_art_dir(sf, "bpe")
    if not _tok_artifact_current(art, "bpe", {"k": _BPE_TRAIN_K}):
        tokenizer.save_artifact(
            spark,
            _bpe_train_merges(spark, sf),
            art,
            "bpe",
            meta={"k": _BPE_TRAIN_K},
        )
    return tokenizer.load_merges(spark, art, "bpe")


def _wp_merges_artifact(spark, sf) -> list[tuple[str, str]]:
    art = _tok_art_dir(sf, "wordpiece")
    if not _tok_artifact_current(art, "wordpiece", {"k": _WP_TRAIN_K}):
        tokenizer.save_artifact(
            spark,
            _wp_train_merges(spark, sf),
            art,
            "wordpiece",
            meta={"k": _WP_TRAIN_K},
        )
    return tokenizer.load_merges(spark, art, "wordpiece")


_UNI_ART_META = {
    "iters": _UNI_ITERS,
    "seed": _UNI_SEED,
    "keep": _UNI_KEEP,
    "lmax": _UNI_LMAX,
}


def _uni_vocab_artifact(spark, sf) -> dict[str, int]:
    art = _tok_art_dir(sf, "unigram")
    if not _tok_artifact_current(art, "unigram", _UNI_ART_META):
        vocab, _ = _unigram_train_vocab(spark, sf)
        tokenizer.save_artifact(
            spark, sorted(vocab.items()), art, "unigram", meta=_UNI_ART_META
        )
    return tokenizer.load_vocab(spark, art)


@q("q_bpe_apply_artifact", _bpe_pipeline_sql())
def q_bpe_apply_artifact(spark, sf):
    # the SERVING shape for the BPE family (round-8 verdict #1 — the ANN
    # build_ivf_layout→serve discipline applied to tokenizers): train
    # ONCE, persist the merge table as a versioned commit-marked parquet
    # artifact (operators/tokenizer.py, reusing incremental.py's
    # durability contract), then tokenize by LOADING the artifact — the
    # apply path never retrains. On a cold store this key trains and
    # persists (honest accounting, like q_sim_topk_ivfpq's build+write);
    # every later run is apply-only: read ≤ k rows from parquet, fold
    # them into bpe_apply_cols literals, one map-only corpus pass.
    # Oracle = the full train+apply SQL (_bpe_pipeline_sql), so the hash
    # match proves store→load→apply ≡ train→apply end to end — including
    # that the parquet round-trip preserved every merge pair byte-exact.
    #
    # Scale: at 100 TB the artifact is trained on one corpus snapshot
    # and applied on every ingest; per-ingest cost is ONE scan at
    # tokenizer-literal speed, training amortized to zero. Staleness is
    # explicit: the commit marker records (family, k), and a
    # configuration change retrains instead of serving a stale table.
    return _merge_family_apply(spark, sf, _bpe_merges_artifact(spark, sf))


@q(
    "q_wordpiece_apply_artifact",
    _wp_train_ctes() + _merge_apply_sql(_WP_TRAIN_K),
)
def q_wordpiece_apply_artifact(spark, sf):
    # q_bpe_apply_artifact's WordPiece sibling: the likelihood-trained
    # merge table persists once (with its score column — the audit trail
    # of WHY each merge won), and apply loads it through the SAME
    # bpe_apply_cols builder the inline pipeline uses (merge folding is
    # family-agnostic; one apply definition gates both families). The
    # loader verifies the artifact's family from the commit marker — a
    # BPE table served as WordPiece would tokenize plausibly and
    # silently wrong.
    return _merge_family_apply(spark, sf, _wp_merges_artifact(spark, sf))


@q("q_unigram_apply_artifact", ORACLE["q_unigram_pipeline"])
def q_unigram_apply_artifact(spark, sf):
    # the unigram family's serving shape: the trained (piece, cnt)
    # vocabulary persists as the artifact, and apply loads it into the
    # literal map (_uni_vm_lit) feeding the once-per-DISTINCT-word DP +
    # join-back — the exact apply plan q_unigram_pipeline runs after
    # training, minus the training. The artifact IS the vocabulary the
    # EM trainer converged to, so the oracle (train+apply in one
    # statement) hash-matches iff the parquet round-trip preserved every
    # (piece, cnt) pair and the loaded map reproduces the inline DP.
    #
    # Scale: the EM loop (census-sized but iterative) leaves the
    # per-ingest path entirely; serving cost is one corpus scan + a
    # distinct-word DP with the vocab broadcast by value (~100 literals).
    vm = _uni_vm_lit(_uni_vocab_artifact(spark, sf))
    d = T(spark, sf, "documents")
    words = d.select(
        "lang", "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter((F.col("w") != "") & (F.length("w") <= _UNI_WMAX))
    wk = words.select("w").distinct().select(
        "w",
        F.floor(
            (
                F.element_at(
                    _uni_dp_col(F.col("w"), vm),
                    (F.length("w") + 1).cast("int"),
                )
                + F.lit(_UNI_BIG - 1)
            )
            / F.lit(_UNI_BIG)
        )
        .cast("long")
        .alias("k"),
    )
    return words.join(wk, "w").groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("k").cast("bigint").alias("n_subwords"),
    )


# ------------------------------------------- tokenizer quality comparison --
def _prefix_ctes(sql: str, prefix: str, pattern: str) -> str:
    """Rename a chain's CTE names with a family prefix so the three
    trainer chains can coexist in ONE composed WITH block (their internal
    names — w0, p1, m1, u1... — collide otherwise)."""
    import re

    return re.sub(pattern, lambda m: prefix + m.group(0), sql)


def _strip_with(sql: str) -> str:
    i = sql.index("WITH")
    return sql[:i] + sql[i + len("WITH") :]


def _eval_merge_seg_sql(pfx: str, k: int) -> str:
    """Segment every DISTINCT census word through a renamed merge chain
    (m-relations ``{pfx}m1..{pfx}mk``): piece count and the characters
    covered by multi-char pieces, per word. Same LEFT-JOIN + chr(1)
    sentinel dry-training shape as _merge_apply_sql."""
    merged = "regexp_replace(w, '(.)', '\\1·', 'g')"
    for i in range(1, k + 1):
        merged = (
            f"replace({merged}, COALESCE({pfx}m{i}.x || '·' || {pfx}m{i}.y,"
            f" chr(1)), COALESCE({pfx}m{i}.x || {pfx}m{i}.y, chr(1)))"
        )
    crosses = " ".join(f"LEFT JOIN {pfx}m{i} ON TRUE" for i in range(1, k + 1))
    return f"""
    {pfx}seg AS MATERIALIZED (
        SELECT w,
               CAST(len(list_filter(ps, x -> x <> '')) AS BIGINT) AS k,
               CAST(COALESCE(list_sum(list_transform(
                   list_filter(ps, x -> len(x) >= 2), x -> len(x))), 0)
                   AS BIGINT) AS cov
        FROM (SELECT w, string_split({merged}, '·') AS ps
              FROM (SELECT DISTINCT w FROM cen) {crosses})
    )"""


def _eval_stats_sql(family: str, pfx: str, where: str = "") -> str:
    return f"""
    {pfx}stats AS (
        SELECT CAST('{family}' AS VARCHAR) AS family, c.lang,
               CAST(SUM(c.wc) AS BIGINT) AS n_words,
               CAST(SUM(c.wc * s.k) AS BIGINT) AS n_subwords,
               CAST(SUM(c.wc * s.cov) AS BIGINT) AS covered_chars,
               CAST(SUM(c.wc * len(c.w)) AS BIGINT) AS total_chars
        FROM cen c JOIN {pfx}seg s USING (w){where}
        GROUP BY c.lang
    )"""


def _tokenizer_eval_sql() -> str:
    import re

    bp = _prefix_ctes(_bpe_train_ctes(), "bp_", r"\b[wpm]\d+\b")
    wp = _prefix_ctes(_wp_train_ctes(), "wp_", r"\b[wpmu]\d+\b")
    un = _prefix_ctes(
        _unigram_ctes(),
        "un_",
        r"\b(?:w0|sing|seed|v\d+|m\d+|d\d+|seg\d+|u\d+)\b",
    )
    sql = bp + "," + _strip_with(wp) + "," + _strip_with(un)
    # every multiply-referenced CTE of the composed statement must be
    # MATERIALIZED (lesson 39: default inlining is exponential in the
    # chain depth and dies on fd exhaustion before it is slow)
    sql = re.sub(r"\b((?:bp_|wp_|un_)\w+ AS) \(", r"\1 MATERIALIZED (", sql)
    sql += f""",
    cen AS MATERIALIZED (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> '' GROUP BY lang, w
    ),{_eval_merge_seg_sql("bp_", _BPE_TRAIN_K)},{
        _eval_merge_seg_sql("wp_", _WP_TRAIN_K)},
    un_mf AS (SELECT MAP(list(piece ORDER BY piece),
                         list(cnt ORDER BY piece)) AS vm
              FROM un_v{_UNI_ITERS}),
    un_seg AS MATERIALIZED (
        SELECT w,
               CAST((dp[CAST(len(w) AS INT) + 1] + {_UNI_BIG - 1})
                    // {_UNI_BIG} AS BIGINT) AS k,
               CAST(COALESCE(list_sum(list_transform(list_filter(
                   {_uni_pieces_sql("w", "vm", "dp")},
                   x -> len(x) >= 2), x -> len(x))), 0) AS BIGINT) AS cov
        FROM (SELECT w, vm, {_uni_dp_sql("w", "vm")} AS dp
              FROM (SELECT DISTINCT w FROM cen WHERE len(w) <= {_UNI_WMAX})
                   CROSS JOIN un_mf)
    ),{_eval_stats_sql("bpe", "bp_")},{
        _eval_stats_sql("wordpiece", "wp_")},{
        _eval_stats_sql("unigram", "un_", f" WHERE len(c.w) <= {_UNI_WMAX}")}
    SELECT family, lang, n_words, n_subwords,
           CAST(CASE WHEN n_words > 0
                     THEN n_subwords * 10000 // n_words ELSE 0 END
                AS BIGINT) AS fertility_bp,
           covered_chars, total_chars,
           CAST(CASE WHEN total_chars > 0
                     THEN covered_chars * 10000 // total_chars ELSE 0 END
                AS BIGINT) AS coverage_bp
    FROM (SELECT * FROM bp_stats UNION ALL
          SELECT * FROM wp_stats UNION ALL
          SELECT * FROM un_stats)
    """
    return sql


def _merge_segment_col(merges, w):
    """The segmented ('·'-separated) form of word column ``w`` under a
    rank-ordered merge list — the string q_bpe_apply's counter folds
    over, exposed so the eval can also measure WHICH characters ended up
    inside multi-char pieces. Merge pairs enter as F.lit (lesson 32)."""
    spelled = F.regexp_replace(w, "(.)", "$1·")
    for x, y in merges:
        spelled = F.replace(spelled, F.lit(f"{x}·{y}"), F.lit(f"{x}{y}"))
    return spelled


def _eval_family_stats(spark, cen, family, k_col, cov_col, wmax=None, stages=None):
    """Per-language rollup of one family's distinct-word (k, cov) table
    against the shared census: n_words, n_subwords, covered/total chars.

    ``stages`` — optional [(name, col)] bindings materialized as real
    columns on the distinct-word frame before k/cov evaluate (each may
    reference earlier bindings by name). The unigram family binds vm/dp
    /pieces this way so the DP aggregate appears ONCE in the plan as an
    attribute instead of being inlined at every reference — the inline
    form put ~9 copies of the DP tree (each with its own vocab-map
    literal) into the plan and spent ~2.5s in analysis/codegen for 155
    rows of data (round-11; same staging discipline as
    q_unigram_pipeline's vm/dp columns)."""
    base = cen if wmax is None else cen.filter(F.length("w") <= wmax)
    dw = base.select("w").distinct()
    for name, col in stages or []:
        dw = dw.withColumn(name, col)
    dw = dw.select("w", k_col.alias("k"), cov_col.alias("cov"))
    return (
        base.join(dw, "w")
        .groupBy("lang")
        .agg(
            F.sum("wc").cast("bigint").alias("n_words"),
            F.sum(F.col("wc") * F.col("k")).cast("bigint").alias("n_subwords"),
            F.sum(F.col("wc") * F.col("cov"))
            .cast("bigint")
            .alias("covered_chars"),
            F.sum(F.col("wc") * F.length("w"))
            .cast("bigint")
            .alias("total_chars"),
        )
        .select(F.lit(family).alias("family"), "*")
    )


@q("q_tokenizer_eval", _tokenizer_eval_sql())
def q_tokenizer_eval(spark, sf):
    # the TOKENIZER QUALITY REPORT across the triad (round-8 verdict
    # #5): per-language FERTILITY (subwords per word, basis points) and
    # CHARACTER COVERAGE (fraction of characters that land inside
    # multi-char pieces rather than falling back to single characters)
    # for BPE vs WordPiece vs unigram — from ONE shared word-census
    # pass. This is the table that decides which trained artifact ships:
    # lower fertility = fewer tokens per word (cheaper training data),
    # higher coverage = the learned vocabulary actually absorbs the
    # corpus's character mass. n_words/n_subwords RECONCILE with each
    # family's own q_*_pipeline totals (pinned in tests), so the report
    # cannot drift from the pipelines it summarizes.
    #
    # Spark: the three trained tables come from the artifact store
    # (_*_artifact ensure-then-load — train once, evaluated from the
    # same stored tables the serving path uses); ONE census pass
    # (lang, word, count) feeds all three families; each family
    # segments/DPs every DISTINCT word once (lesson 25/41) and joins
    # back. Oracle: the three training chains composed into one WITH
    # block (CTE names family-prefixed; everything MATERIALIZED —
    # lesson 39) + the same census/segment/rollup tail.
    #
    # Scale: census is one corpus scan (vocabulary-sized result);
    # per-family work is ∝ distinct words × merge-table literals; the
    # rollup shuffles ≤ |langs| × |families| keys. Nothing here rescans
    # the corpus per family.
    merges_bp = _bpe_merges_artifact(spark, sf)
    merges_wp = _wp_merges_artifact(spark, sf)
    vm = _uni_vm_lit(_uni_vocab_artifact(spark, sf))
    d = T(spark, sf, "documents")
    cen = (
        d.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
        .persist()
    )
    try:

        def merge_cols(merges):
            seg = _merge_segment_col(merges, F.col("w"))
            ps = F.filter(F.split(seg, "·"), lambda x: x != "")
            k = F.size(ps).cast("long")
            cov = F.aggregate(
                ps,
                F.lit(0).cast("long"),
                lambda acc, x: acc
                + F.when(F.length(x) >= 2, F.length(x)).otherwise(F.lit(0)),
            )
            return k, cov

        kb, cb = merge_cols(merges_bp)
        kw, cw = merge_cols(merges_wp)
        # vm / dp / pieces bound as STAGED COLUMNS (not inlined exprs):
        # see _eval_family_stats's ``stages`` note — attribute references
        # keep the plan tree linear in the DP size
        uni_stages = [
            ("vm", vm),
            ("dp", _uni_dp_col(F.col("w"), F.col("vm"))),
            (
                "up",
                F.filter(
                    _uni_pieces_col(F.col("w"), F.col("vm"), F.col("dp")),
                    lambda x: F.length(x) >= 2,
                ),
            ),
        ]
        ku = F.floor(
            (
                F.element_at(F.col("dp"), (F.length("w") + 1).cast("int"))
                + F.lit(_UNI_BIG - 1)
            )
            / F.lit(_UNI_BIG)
        ).cast("long")
        cu = F.aggregate(
            F.col("up"), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        out = (
            _eval_family_stats(spark, cen, "bpe", kb, cb)
            .unionByName(_eval_family_stats(spark, cen, "wordpiece", kw, cw))
            .unionByName(
                _eval_family_stats(
                    spark, cen, "unigram", ku, cu, _UNI_WMAX, stages=uni_stages
                )
            )
            .withColumn(
                "fertility_bp",
                F.when(
                    F.col("n_words") > 0,
                    F.expr("n_subwords * 10000 DIV n_words"),
                )
                .otherwise(F.lit(0))
                .cast("bigint"),
            )
            .withColumn(
                "coverage_bp",
                F.when(
                    F.col("total_chars") > 0,
                    F.expr("covered_chars * 10000 DIV total_chars"),
                )
                .otherwise(F.lit(0))
                .cast("bigint"),
            )
            .select(
                "family",
                "lang",
                "n_words",
                "n_subwords",
                "fertility_bp",
                "covered_chars",
                "total_chars",
                "coverage_bp",
            )
        )
        # materialize before releasing the census: the result is BOUNDED
        # (|families| × |langs| rows), and returning the lazy plan would
        # re-scan the corpus once per family after the unpersist (the
        # round-7 leak rule forbids leaving the census cached instead)
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        cen.unpersist()
    return out


# ------------------------------- incremental tokenizer retraining ----------
@q("q_bpe_retrain_incremental", _bpe_train_sql())
def q_bpe_retrain_incremental(spark, sf):
    # tokenizer RETRAINING at O(new data), not O(history) — the third
    # leg of the serving lifecycle after train-once (q_bpe_train) and
    # apply-from-artifact (q_bpe_apply_artifact): when the corpus grows,
    # the expensive input to retraining is the word CENSUS, and the
    # census is an ALGEBRAIC aggregate — so it lives as persisted
    # incremental state (operators/incremental.py: versioned,
    # commit-marked, merge-by-key) that each ingest slice folds into at
    # O(slice + touched words). Retraining then runs the IDENTICAL
    # census-sized loop (_bpe_train_from_census — one entry point, the
    # two keys cannot drift) WITHOUT rescanning a byte of history.
    #
    # This query exercises the full shape on the fixture's incremental
    # convention (base = doc_id % 4 != 0, delta = % 4 == 0): build the
    # state from the base slice, fold the delta in, train from the
    # state. Oracle = the full-corpus training SQL, so the hash match
    # proves merge(census(base), census(delta)) ≡ census(base ∪ delta)
    # exactly (integer counts — the algebraic-decomposition guarantee)
    # and therefore an identical merge sequence. State is rebuilt per
    # run (rmtree — the q_sim_topk_ivf_incremental discipline) so
    # repeated invocations cannot double-fold the delta.
    #
    # Scale: at 100 TB/day the census state updates from each day's
    # slice alone (one shuffle keyed by word over the DELTA), retraining
    # reads the vocabulary-sized state, and the unigram/WordPiece
    # trainers inherit the same shape through their own census entry
    # points. The same state also powers stream-fed retraining via
    # incremental.apply_stream_batch (batch-id replay guard).
    import os
    import shutil

    from mongo_to_parquet_spark.operators import incremental

    d = T(spark, sf, "documents")

    def spelled_words(df):
        return (
            df.select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.length("w") >= 2)
            .select(_bpe_spelled().alias("sym"))
        )

    tag = os.path.basename(sf.rstrip("/"))
    sd = os.path.abspath(
        os.path.join(
            os.path.dirname(__file__), "..", "..", "_scratch", "census_state", tag
        )
    )
    shutil.rmtree(sd, ignore_errors=True)
    incremental.refresh_agg_state(
        spark, sd, spelled_words(d.filter(F.col("doc_id") % 4 != 0)), ["sym"], []
    )
    st = incremental.refresh_agg_state(
        spark, sd, spelled_words(d.filter(F.col("doc_id") % 4 == 0)), ["sym"], []
    )
    census = st.select("sym", F.col("n_rows").cast("long").alias("wc"))
    merges = _bpe_train_from_census(census)
    return spark.createDataFrame(
        merges, "rank bigint, x string, y string, merged string, cnt bigint"
    ).orderBy("rank")


def _dsir_doc_feat(spark, sf):
    """(doc_id, lang, hashed-bigram feature, count) — the ONE corpus
    featurization shared by training and serving (so the two paths
    cannot drift), persisted because two consumers prune it to different
    columns (see q_select_dsir's plan note)."""
    return dsir_feats_of(
        T(spark, sf, "documents").select("doc_id", "lang", "text")
    ).persist()


def dsir_feats_of(d):
    """The same featurization over an arbitrary (doc_id, lang, text)
    relation — what a STREAM batch folds through when the DSIR integer
    sufficient statistics are maintained incrementally
    (tests/test_streaming.py pins stream-fed state ≡ batch artifact)."""
    from mongo_to_parquet_spark.functions.sketch import kmv_hash
    from mongo_to_parquet_spark.functions.textfns import shingles
    from mongo_to_parquet_spark.operators.parallel import fan_out

    feats = fan_out(d).select(
        "doc_id", "lang", F.explode(shingles(F.col("text"), 2)).alias("bg")
    ).select(
        "doc_id", "lang", (kmv_hash(F.col("bg"), salt="dsir:") % _DSIR_B).alias("f")
    )
    return feats.groupBy("doc_id", "lang", "f").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def _dsir_score_top(doc_feat, fstats):
    """Weights from the integer feature stats + the scoring join + the
    top-m cut — q_select_dsir's tail, shared with the artifact serve."""
    tots = fstats.agg(
        F.sum("ct").cast("bigint").alias("tt"),
        F.sum("cr").cast("bigint").alias("tr"),
    )
    w = fstats.crossJoin(F.broadcast(tots)).select(
        "f",
        (
            F.log((F.col("ct") + 1).cast("double") / (F.col("tt") + _DSIR_B))
            - F.log((F.col("cr") + 1).cast("double") / (F.col("tr") + _DSIR_B))
        ).alias("wf"),
    )
    return (
        doc_feat.join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum((F.col("n") * F.col("wf")).cast("decimal(38,18)")).cast(
                    "double"
                ),
                4,
            ).alias("dsir_weight")
        )
        .orderBy(F.col("dsir_weight").desc(), F.col("doc_id").asc())
        .limit(_DSIR_TOP)
    )


@q("q_dsir_apply_artifact", ORACLE["q_select_dsir"])
def q_dsir_apply_artifact(spark, sf):
    # DSIR importance selection SERVED from a stored model (the round-9
    # artifact discipline applied to the last inline-trained table): the
    # persisted artifact is the ≤B-row INTEGER sufficient-statistics
    # table (per-feature target/raw counts) — never the float
    # log-ratios, so the round-trip has no float-serialization surface;
    # the serve recomputes the weights from integers with the SAME
    # expression tree (bm25's LN discipline) and scores the corpus in
    # one featurization pass. Totals derive by summing the stored table
    # (exact integers), so the artifact is self-contained. Oracle = the
    # full train+select SQL: store→load→score ≡ train→score, hash-gated.
    #
    # Scale: training's corpus-sized half (the feature distribution
    # aggregation) leaves the per-ingest path; serving = one corpus
    # featurization + a ≤B-row broadcast — the selection a 100 TB
    # pretraining ingest runs against a FIXED target-domain model.
    art = tokenizer.artifact_dir(sf, "dsir")
    want = {"buckets": _DSIR_B, "target": "en"}
    doc_feat = _dsir_doc_feat(spark, sf)
    try:
        if not tokenizer.artifact_current(art, "dsir", want):
            fstats = doc_feat.groupBy("f").agg(
                F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0))
                .cast("bigint")
                .alias("ct"),
                F.sum("n").cast("bigint").alias("cr"),
            )
            tokenizer.save_artifact(spark, fstats, art, "dsir", meta=want)
        stored = tokenizer.load_artifact(spark, art, "dsir").select(
            "f", "ct", "cr"
        )
        out = _dsir_score_top(doc_feat, stored)
        # bounded (top-m rows): materialize before releasing doc_feat
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        doc_feat.unpersist()
    return out
