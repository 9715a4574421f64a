"""Text / vector retrieval queries, round 3.

The serving-side counterparts of the curation ops: an inverted index and
BM25 ranking over the documents corpus (what the dedup/quality pipeline
feeds), and product-quantization codes over the embedding corpus (what the
IVF layout serves). Same contract discipline: declarative plans,
oracle-exact determinism, a 100 TB scale note per query.

Float-parity notes (queries/__init__ rules applied):
  - BM25 per-term scores are doubles computed by an identical expression
    tree in both engines, then cast DECIMAL(38,18) BEFORE the per-doc sum
    so the aggregation is exact and order-independent.
  - PQ distances are INTEGER arithmetic over SQ8-quantized components
    (operators/similarity.sq8_dims) — argmin is exactly reproducible,
    no float tie ambiguity.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


# -------------------------------------------------------- inverted index ---
@q(
    "q_inverted_index",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT tok,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(COUNT(*) AS BIGINT) AS cf,
           array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
    FROM toks WHERE tok <> '' GROUP BY tok
    """,
)
def q_inverted_index(spark, sf):
    # the inverted index: token → (document frequency, collection
    # frequency, sorted posting list). The core serving structure for
    # lexical retrieval AND the statistics table BM25 consumes.
    #
    # Scale: one explode + one hash aggregation keyed by token;
    # collect_set holds doc ids (postings), sorted per group — state per
    # token is its posting list, the index's own size, nothing larger.
    # At 100 TB the long-tail tokens partial-combine to almost nothing
    # map-side; the few hot tokens are exactly the rows a serving system
    # would shard (or stop-list) — and they're visible in df. Postings
    # serialize to a comma string so both engines hash identically.
    d = T(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    return toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("cf"),
        F.array_join(F.sort_array(F.collect_set("doc_id")), ",").alias("postings"),
    )


# ------------------------------------------------------------------ BM25 ---
_BM25_TERMS = ("spark", "join", "filter")
_BM25_K1, _BM25_B = 1.2, 0.75


@q(
    "q_bm25",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        WHERE tok IN {_BM25_TERMS!r} GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT tf.doc_id,
               CAST(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * ({_BM25_K1} + 1.0))
                   / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               AS DECIMAL(38, 18)) AS s
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
    )
    SELECT doc_id, ROUND(CAST(SUM(s) AS DOUBLE), 4) AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
)
def q_bm25(spark, sf):
    # BM25 ranking for a fixed 3-term query over the corpus (Okapi
    # k1=1.2, b=0.75): idf·tf saturation·length normalization. Every input
    # to the float expression is an INTEGER aggregate (tf, df, dl, N, and
    # avgdl = exact-int-sum / count), and the expression tree is identical
    # in both engines, so per-term doubles match bit-for-bit; the per-doc
    # sum runs over DECIMAL(38,18) casts to stay order-independent.
    #
    # Scale: term filter BEFORE the tf aggregate (only query terms leave
    # the scan), df is a tiny agg over tf, dl/avgdl are corpus stats a
    # serving system precomputes (q_inverted_index's table); final is a
    # TakeOrdered top-20. No window, no join wider than the query's terms.
    d = T(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    s = (
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * (F.col("tf") * (k1 + F.lit(1.0)))
        / (
            F.col("tf")
            + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl"))
        )
    ).cast("decimal(38,18)")
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s.alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("s").cast("double"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# ------------------------------------------------- product quantization ----
#: shared quantize→codebook→assign CTE prefix (q_embed_pq, q_sim_topk_pq)
_PQ_CTES = """
    WITH dims AS (
        SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    rng AS (SELECT pos, MIN(val) AS mn, MAX(val) AS mx FROM dims GROUP BY pos),
    qv AS (
        SELECT vec_id, pos,
               CAST(CASE WHEN mx = mn THEN 0
                         ELSE LEAST(255, FLOOR((val - mn) * 256.0 / (mx - mn)))
                    END AS INT) AS qv
        FROM dims JOIN rng USING (pos)
    ),
    h AS (SELECT CAST((MAX(pos) + 1) // 2 AS INT) AS half FROM qv),
    qs AS (SELECT vec_id, pos, qv,
                  CASE WHEN pos >= half THEN 1 ELSE 0 END AS sub
           FROM qv CROSS JOIN h),
    cb AS (SELECT vec_id AS cid, pos, qv AS cqv, sub FROM qs WHERE vec_id < 16),
    dist AS (
        SELECT d.vec_id, d.sub, c.cid,
               SUM(CAST((d.qv - c.cqv) * (d.qv - c.cqv) AS BIGINT)) AS dist
        FROM qs d JOIN cb c USING (pos)
        GROUP BY d.vec_id, d.sub, c.cid
    ),
    best AS (
        SELECT vec_id, sub, cid, dist,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, cid) AS rn
        FROM dist
    )
"""


@q(
    "q_embed_pq",
    _PQ_CTES
    + """
    SELECT vec_id,
           CAST(MIN(CASE WHEN sub = 0 THEN cid END) AS BIGINT) AS code0,
           CAST(MIN(CASE WHEN sub = 1 THEN cid END) AS BIGINT) AS code1,
           MIN(CASE WHEN sub = 0 THEN dist END) AS dist0,
           MIN(CASE WHEN sub = 1 THEN dist END) AS dist1
    FROM best WHERE rn = 1 GROUP BY vec_id
    """,
)
def q_embed_pq(spark, sf):
    # product quantization (PQ) encode: split each vector into two
    # subspaces, assign each half to its nearest codebook centroid
    # (deterministic codebook = the first 16 vectors by id — a real system
    # trains k-means; the ENCODE dataflow is identical), emit the 2-byte
    # code per vector. Runs on SQ8-quantized components so distances are
    # INTEGER sums — exact cross-engine argmin, cid tiebreak.
    #
    # Scale: the codebook is 16 rows/subspace → broadcast; distance
    # computation is a map-side join + hash aggregation keyed by
    # (vector, subspace, centroid) — 32 partials per vector, partial-
    # combined; argmin is a min(struct) aggregate, no window over data.
    # This is the compression step that turns a 100 TB fp32 corpus into a
    # ~1.5 TB code table the IVF layout (operators/similarity) serves.
    from mongo_to_parquet_spark.operators.similarity import sq8_dims

    e = T(spark, sf, "embeddings")
    qv = sq8_dims(e)
    half = e.select(F.floor(F.size("embedding") / 2).cast("int").alias("h")).first()[
        "h"
    ]
    qs = qv.withColumn("sub", (F.col("pos") >= half).cast("int"))
    cb = qs.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "pos", F.col("qv").alias("cqv")
    )
    diff = F.col("qv") - F.col("cqv")
    dist = (
        qs.join(F.broadcast(cb), "pos")
        .groupBy("vec_id", "sub", "cid")
        .agg(F.sum((diff * diff).cast("bigint")).alias("dist"))
    )
    best = dist.groupBy("vec_id", "sub").agg(
        F.min(F.struct("dist", "cid")).alias("b")
    )
    return best.groupBy("vec_id").agg(
        F.min(F.when(F.col("sub") == 0, F.col("b.cid"))).cast("bigint").alias("code0"),
        F.min(F.when(F.col("sub") == 1, F.col("b.cid"))).cast("bigint").alias("code1"),
        F.min(F.when(F.col("sub") == 0, F.col("b.dist"))).alias("dist0"),
        F.min(F.when(F.col("sub") == 1, F.col("b.dist"))).alias("dist1"),
    )


# ----------------------------------------------------- frequency sketch ----
# geometry + bucket hash live in functions/sketch.py, SHARED with the
# streaming fold (stream_multi_sketch) so a retune cannot de-twin them
from mongo_to_parquet_spark.functions.sketch import (  # noqa: E402
    CMS_D as _CMS_D,
    CMS_W as _CMS_W,
    cms_bucket as _cms_bucket,
    cms_bucket_sql as _cms_bucket_sql,
)

_CMS_PROBES = ("join", "hash", "spark", "scan", "zzz_absent_token")


@q(
    "q_sketch_cms",
    f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    ii AS (SELECT unnest(range({_CMS_D})) AS i),
    cells AS (
        SELECT i, {_cms_bucket_sql("tok", "i")} AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM toks CROSS JOIN ii GROUP BY i, b
    ),
    probes AS (SELECT unnest({list(_CMS_PROBES)!r}) AS tok),
    pb AS (SELECT tok, i, {_cms_bucket_sql("tok", "i")} AS b
           FROM probes CROSS JOIN ii),
    est AS (SELECT tok, MIN(c) AS est FROM pb JOIN cells USING (i, b)
            GROUP BY tok),
    exact AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
              FROM toks GROUP BY tok)
    SELECT tok, est, COALESCE(exact_n, CAST(0 AS BIGINT)) AS exact_n
    FROM est LEFT JOIN exact USING (tok)
    """,
)
def q_sketch_cms(spark, sf):
    # count-min sketch, EXACTLY reproduced in both engines: d=4 md5-derived
    # hash rows × w=64 buckets (md5 exists in both, so unlike xxhash
    # sketches this one is hash-checkable, not rows-only). Probe tokens
    # (incl. one absent) read back est = min over rows — the CMS guarantee
    # est ≥ exact is visible in the output columns.
    #
    # Scale: the sketch is a FIXED d×w cell table regardless of corpus
    # size — the shuffle after map-side partial aggregation carries at
    # most d·w·partitions rows. This is the frequency oracle you consult
    # before q_text_vocab-style exact top-k: heavy hitters at 100 TB for
    # the cost of a constant-size aggregate.
    d = T(spark, sf, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    ii = F.array(*[F.lit(i) for i in range(_CMS_D)])
    bucket = _cms_bucket
    cells = (
        toks.select("tok", F.explode(ii).alias("i"))
        .groupBy("i", bucket(F.col("tok"), F.col("i")).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = spark.createDataFrame([(t,) for t in _CMS_PROBES], "tok string")
    pb = probes.select("tok", F.explode(ii).alias("i")).select(
        "tok", "i", bucket(F.col("tok"), F.col("i")).alias("b")
    )
    est = (
        pb.join(cells, ["i", "b"]).groupBy("tok").agg(F.min("c").alias("est"))
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    return est.join(exact, "tok", "left").select(
        "tok",
        "est",
        F.coalesce("exact_n", F.lit(0).cast("bigint")).alias("exact_n"),
    )


# ----------------------------------------------------- bloom membership ----
_BLOOM_M, _BLOOM_K = 512, 3
_BLOOM_PROBES = ("join", "customer", "spark", "no_such_tok", "zzz_absent_token")


def _bloom_bit_sql(tok_expr: str, i_expr: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('bloom', CAST({i_expr} AS VARCHAR), "
        f"':', {tok_expr})), 1, 8)) AS BIGINT) % {_BLOOM_M}"
    )


@q(
    "q_sketch_bloom",
    f"""
    WITH toks AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    ii AS (SELECT unnest(range({_BLOOM_K})) AS i),
    bits AS (
        SELECT DISTINCT {_bloom_bit_sql("tok", "i")} AS bit
        FROM toks CROSS JOIN ii
    ),
    probes AS (SELECT unnest({list(_BLOOM_PROBES)!r}) AS tok),
    pb AS (SELECT tok, {_bloom_bit_sql("tok", "i")} AS bit
           FROM probes CROSS JOIN ii),
    hits AS (
        SELECT pb.tok, CAST(COUNT(bits.bit) AS BIGINT) AS bits_set
        FROM pb LEFT JOIN bits ON pb.bit = bits.bit GROUP BY pb.tok
    )
    SELECT tok, bits_set,
           bits_set = {_BLOOM_K} AS maybe_present,
           tok IN (SELECT tok FROM toks) AS actually_present
    FROM hits
    """,
)
def q_sketch_bloom(spark, sf):
    # Bloom-filter membership, exactly reproduced in both engines (md5
    # bit positions, m=512, k=3): the corpus vocabulary sets bits; probe
    # tokens test all k. maybe_present=false ⇒ definitely absent (the
    # decontamination precheck: at 100 TB you consult the fixed-size
    # filter before q_decontaminate's exact trigram join); the output
    # pairs the filter's answer with ground truth so false positives are
    # visible when they occur.
    #
    # Scale: the filter is ≤m DISTINCT bit rows — constant state. Setting
    # bits is one distinct-aggregate over the vocabulary; probing is a
    # broadcast join of probe bits against it.
    d = T(spark, sf, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).distinct()
    ii = F.array(*[F.lit(i) for i in range(_BLOOM_K)])

    def bit(tok_col, i_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bloom"), i_col.cast("string"), F.lit(":"), tok_col
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _BLOOM_M
        )

    bits = (
        toks.select(F.explode(ii).alias("i"), "tok")
        .select(bit(F.col("tok"), F.col("i")).alias("bit"))
        .distinct()
    )
    probes = spark.createDataFrame([(t,) for t in _BLOOM_PROBES], "tok string")
    pb = probes.select("tok", F.explode(ii).alias("i")).select(
        "tok", bit(F.col("tok"), F.col("i")).alias("bit")
    )
    hits = (
        pb.join(F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy("tok")
        .agg(F.count("__set").alias("bits_set"))
    )
    return hits.join(
        toks.select(F.col("tok"), F.lit(True).alias("__in")), "tok", "left"
    ).select(
        "tok",
        "bits_set",
        (F.col("bits_set") == _BLOOM_K).alias("maybe_present"),
        F.coalesce("__in", F.lit(False)).alias("actually_present"),
    )


@q(
    "q_sim_topk_pq",
    _PQ_CTES
    + """
    , codes AS (SELECT vec_id, sub, cid FROM best WHERE rn = 1),
    pairdist AS (
        SELECT a.cid AS ca, b.cid AS cb2, a.sub,
               SUM(CAST((a.cqv - b.cqv) * (a.cqv - b.cqv) AS BIGINT)) AS pd
        FROM cb a JOIN cb b ON a.pos = b.pos
        GROUP BY a.cid, b.cid, a.sub
    ),
    probe AS (SELECT sub, cid AS pcid FROM codes WHERE vec_id = 0),
    scored AS (
        SELECT c.vec_id, SUM(pd) AS pq_dist
        FROM codes c
        JOIN probe p ON c.sub = p.sub
        JOIN pairdist d ON d.sub = c.sub AND d.ca = c.cid AND d.cb2 = p.pcid
        GROUP BY c.vec_id
    )
    SELECT vec_id, pq_dist FROM scored WHERE vec_id <> 0
    ORDER BY pq_dist ASC, vec_id ASC LIMIT 10
    """,
)
def q_sim_topk_pq(spark, sf):
    # the PQ SEARCH step completing quantize → encode → serve: symmetric
    # PQ distance between the probe's code and every corpus code via a
    # precomputed 16×16-per-subspace centroid-pair distance table — the
    # classic ADC/SDC lookup. All arithmetic is integer over SQ8
    # components, so ranks are exactly reproducible (no float ties).
    #
    # Scale: the pair table is 2·16² rows and the probe's code is 2 rows —
    # both broadcast; scoring the corpus is a map-side join over the code
    # table (2 rows/vector, NOT the embeddings) + a 2-term sum. This is
    # the memory-bandwidth shape that makes PQ serving fast: the fp32
    # corpus is never touched after encoding. Exact re-rank of the PQ
    # top-k (brute_force_topk over just those ids) is the standard second
    # stage.
    from mongo_to_parquet_spark.operators.similarity import sq8_dims

    e = T(spark, sf, "embeddings")
    qv = sq8_dims(e)
    half = e.select(F.floor(F.size("embedding") / 2).cast("int").alias("h")).first()[
        "h"
    ]
    qs = qv.withColumn("sub", (F.col("pos") >= half).cast("int"))
    cb = qs.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "pos", F.col("qv").alias("cqv"), "sub"
    )
    diff = F.col("qv") - F.col("cqv")
    dist = (
        qs.join(F.broadcast(cb.drop("sub")), "pos")
        .groupBy("vec_id", "sub", "cid")
        .agg(F.sum((diff * diff).cast("bigint")).alias("dist"))
    )
    codes = (
        dist.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("dist", "cid")).alias("b"))
        .select("vec_id", "sub", F.col("b.cid").alias("cid"))
    )
    cdiff = F.col("a_cqv") - F.col("b_cqv")
    pairdist = (
        cb.select(
            F.col("cid").alias("ca"), "pos", F.col("cqv").alias("a_cqv"),
            F.col("sub").alias("psub"),
        )
        .join(
            cb.select(F.col("cid").alias("cb2"), "pos", F.col("cqv").alias("b_cqv")),
            "pos",
        )
        .groupBy("ca", "cb2", "psub")
        .agg(F.sum((cdiff * cdiff).cast("bigint")).alias("pd"))
    )
    probe = codes.filter(F.col("vec_id") == 0).select(
        "sub", F.col("cid").alias("pcid")
    )
    return (
        codes.join(F.broadcast(probe), "sub")
        .join(
            F.broadcast(pairdist),
            (F.col("cid") == F.col("ca"))
            & (F.col("pcid") == F.col("cb2"))
            & (F.col("sub") == F.col("psub")),  # pair table is per-subspace
        )
        .groupBy("vec_id")
        .agg(F.sum("pd").alias("pq_dist"))
        .filter(F.col("vec_id") != 0)
        .orderBy(F.col("pq_dist").asc(), F.col("vec_id").asc())
        .limit(10)
    )


#: IVF CTEs shared by the ivfpq key and its recall twin — identical to the
#: q_sim_topk_ivf oracle's coarse quantizer (first 16 vectors by id,
#: argmax-dot assignment, probe = vec_id 0, n_probe = 4)
_IVF_CTES = """
    , cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding AS cvec
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(c.cvec AS DOUBLE[])) DESC,
                                c.cell ASC) AS rk
            FROM embeddings e CROSS JOIN cents c)
        WHERE rk = 1
    ),
    pvec AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
    cells AS (
        SELECT cell FROM cents, pvec
        ORDER BY list_dot_product(CAST(cvec AS DOUBLE[]), CAST(pv AS DOUBLE[])) DESC,
                 cell ASC
        LIMIT 4
    ),
    codes AS (SELECT vec_id, sub, cid FROM best WHERE rn = 1),
    adc AS (SELECT sub, cid, dist AS pd FROM dist WHERE vec_id = 0),
    pq_scored AS (
        SELECT c.vec_id, CAST(SUM(a.pd) AS BIGINT) AS pq_dist
        FROM codes c
        JOIN assigned s USING (vec_id)
        JOIN cells USING (cell)
        JOIN adc a ON a.sub = c.sub AND a.cid = c.cid
        WHERE c.vec_id <> 0
        GROUP BY c.vec_id
    )
"""


@q(
    "q_sim_topk_ivfpq",
    _PQ_CTES
    + _IVF_CTES
    + """
    SELECT vec_id, pq_dist FROM pq_scored
    ORDER BY pq_dist ASC, vec_id ASC LIMIT 10
    """,
)
def q_sim_topk_ivfpq(spark, sf):
    # IVF × PQ composed into ONE serving layout (operators/similarity.
    # build_ivfpq_layout): cell-partitioned parquet of PQ CODES, probed by
    # partition-pruned cells × integer ADC — the standard IVF-PQ serving
    # shape (Jégou et al. 2011). The query actually WRITES the layout and
    # serves from it (like q_sim_topk_ivf_incremental), so the oracle
    # hash-check covers the full build→write→prune→ADC path: the persisted
    # rng quantizes the probe identically to the corpus encode, cells
    # prune via PartitionFilters (asserted in tests/test_plans.py), and
    # every distance is an integer so ranks are engine-exact. At 100 TB
    # the serve-time read is n_probe/n_cells of a code table ~1500×
    # smaller than the fp32 corpus — the vectors are never read at all.
    import os
    import shutil

    from mongo_to_parquet_spark.operators.similarity import (
        build_ivfpq_layout,
        ivfpq_topk_from_layout,
    )

    emb = T(spark, sf, "embeddings")
    tag = os.path.basename(sf.rstrip("/")).replace(".", "_")
    layout = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "_scratch", "ivfpq", tag)
    )
    shutil.rmtree(layout, ignore_errors=True)
    build_ivfpq_layout(emb, layout)
    pv = _serve_probe_vec(emb, sf)
    return ivfpq_topk_from_layout(spark, layout, pv, k=10, n_probe=4, exclude_id=0)


@q(
    "q_eval_ann_recall_pq",
    _PQ_CTES
    + _IVF_CTES
    + """
    , approx AS (
        SELECT vec_id, row_number() OVER (ORDER BY pq_dist ASC, vec_id ASC) AS rk
        FROM pq_scored QUALIFY rk <= 10
    ),
    exact AS (
        SELECT vec_id, rk FROM (
            SELECT e.vec_id,
                   row_number() OVER (ORDER BY
                       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(pv AS DOUBLE[])), 4) DESC,
                       e.vec_id ASC) AS rk
            FROM embeddings e CROSS JOIN pvec
            WHERE e.vec_id <> 0)
        WHERE rk <= 10
    )
    SELECT CAST(0 AS BIGINT) AS probe_id,
           CAST(COUNT(a.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(a.vec_id) * 10 AS BIGINT) AS recall_pct,
           CAST(COALESCE(MAX(CASE WHEN e.rk = 1 THEN a.rk END), 0) AS BIGINT)
               AS top1_rank
    FROM exact e LEFT JOIN approx a ON a.vec_id = e.vec_id
    """,
)
def q_eval_ann_recall_pq(spark, sf):
    # recall@10 gate for the LOSSY tier: IVF×PQ ranks by quantized
    # integer distance, so unlike IVF-flat (q_eval_ann_recall, exact
    # scoring inside pruned cells) it can miss neighbors through
    # quantization error too — this row measures both losses together
    # against the exact brute-force top-10, same integer output shape as
    # q_eval_ann_recall (hits, recall%, where the true top-1 landed).
    # The approx side recomputes the composed pipeline in-memory — the
    # layout write is pure materialization of the identical dataflow
    # (covered by q_sim_topk_ivfpq's hash check), so this stays a pure
    # query the oracle replays end to end.
    from mongo_to_parquet_spark.operators.similarity import (
        _assign_cells,
        _centroids,
        brute_force_topk,
        pq_codes,
    )

    emb = T(spark, sf, "embeddings")
    cents = _centroids(emb, 16, "vec_id", "embedding")
    assigned = _assign_cells(emb, F.broadcast(cents), "vec_id", "embedding")
    codes, codebook, rng = pq_codes(emb)
    pvec = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__probe"))
    )
    from mongo_to_parquet_spark.functions.vector import dot as _dot

    cells = (
        cents.crossJoin(pvec)
        .select("cell", _dot(F.col("cvec"), F.col("__probe")).alias("ps"))
        .orderBy(F.col("ps").desc(), F.col("cell").asc())
        .limit(4)
        .select("cell")
    )
    # ADC table = the probe's own (sub, cid) SQ8 distances — recompute via
    # pq_codes' dist path by quantizing vec_id 0 like any corpus vector
    qdims = emb.filter(F.col("vec_id") == 0).select(
        F.posexplode("embedding").alias("pos", "val")
    ).select("pos", F.col("val").cast("double").alias("val"))
    from mongo_to_parquet_spark.operators.similarity import _sq8

    pqv = qdims.join(F.broadcast(rng), "pos").select(
        "pos", _sq8(F.col("val")).alias("pqv")
    )
    pdiff = F.col("pqv") - F.col("cqv")
    adc = (
        codebook.join(F.broadcast(pqv), "pos")
        .groupBy("sub", "cid")
        .agg(F.sum((pdiff * pdiff).cast("bigint")).alias("pd"))
    )
    approx = (
        codes.join(assigned.select("vec_id", "cell"), "vec_id")
        .join(F.broadcast(cells), "cell")
        .join(F.broadcast(adc), ["sub", "cid"])
        .filter(F.col("vec_id") != 0)
        .groupBy("vec_id")
        .agg(F.sum("pd").alias("pq_dist"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("pq_dist").asc(), F.col("vec_id").asc())
            ),
        )
        .filter(F.col("rk") <= 10)
        .select(F.col("vec_id").alias("a_vid"), F.col("rk").alias("a_rk"))
    )
    exact = brute_force_topk(emb, probe_id=0, k=10).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        ),
    ).select("vec_id", "rk")
    return (
        exact.join(F.broadcast(approx), exact.vec_id == approx.a_vid, "left")
        .agg(
            F.lit(0).cast("bigint").alias("probe_id"),
            F.count("a_vid").cast("bigint").alias("hits"),
            (F.count("a_vid") * 10).cast("bigint").alias("recall_pct"),
            F.coalesce(
                F.max(F.when(F.col("rk") == 1, F.col("a_rk"))), F.lit(0)
            )
            .cast("bigint")
            .alias("top1_rank"),
        )
    )


@q(
    "q_sim_topk_ivfpq_refine",
    _PQ_CTES
    + _IVF_CTES
    + """
    , shortlist AS (
        SELECT vec_id FROM pq_scored
        ORDER BY pq_dist ASC, vec_id ASC LIMIT 50
    )
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(pv AS DOUBLE[])), 4) AS sim
    FROM embeddings e JOIN shortlist USING (vec_id) CROSS JOIN pvec
    ORDER BY sim DESC, e.vec_id ASC LIMIT 10
    """,
)
def q_sim_topk_ivfpq_refine(spark, sf):
    # two-stage ANN serving (operators/similarity.
    # ivfpq_topk_refined_from_layout): stage 1 = the IVF×PQ layout's
    # integer-ADC shortlist (k′=50, partition-pruned code scan, fp32 never
    # read); stage 2 = EXACT cosine re-rank of ONLY those 50 ids, pushed
    # into the embedding scan as an IN filter (PushedFilters — asserted in
    # tests/test_plans.py, no full fp32 scan anywhere). The standard
    # lossy-then-exact pattern (Jégou et al. 2011 §V): quantization error
    # is confined to shortlist MEMBERSHIP, the final ranking is exact —
    # recall strictly dominates the raw-PQ row (q_eval_ann_recall_pq vs
    # q_eval_ann_recall_pq_refine measure it). At 100 TB stage 2 is 50
    # point lookups; the extra read cost over raw ADC is ~50 vectors.
    import os
    import shutil

    from mongo_to_parquet_spark.operators.similarity import (
        build_ivfpq_layout,
        ivfpq_topk_refined_from_layout,
    )

    emb = T(spark, sf, "embeddings")
    tag = os.path.basename(sf.rstrip("/")).replace(".", "_")
    layout = os.path.abspath(
        os.path.join(
            os.path.dirname(__file__), "..", "..", "_scratch", "ivfpq_refine", tag
        )
    )
    shutil.rmtree(layout, ignore_errors=True)
    build_ivfpq_layout(emb, layout)
    pv = _serve_probe_vec(emb, sf)
    return ivfpq_topk_refined_from_layout(
        spark, layout, emb, pv, k=10, shortlist=50, n_probe=4, exclude_id=0
    )


#: base-frozen quantizer variants of the shared CTEs for the incremental
#: key: rng / codebook / centroids come from the BASE subset only
#: (vec_id % 4 <> 0 — the persisted-layout contract), while quantize /
#: encode / assign run over the FULL corpus. Derived by targeted string
#: replacement so the twins can never drift from the canonical CTEs.
_PQ_CTES_BASEQ = _PQ_CTES.replace(
    "rng AS (SELECT pos, MIN(val) AS mn, MAX(val) AS mx FROM dims GROUP BY pos)",
    "rng AS (SELECT pos, MIN(val) AS mn, MAX(val) AS mx FROM dims"
    " WHERE vec_id % 4 <> 0 GROUP BY pos)",
).replace(
    "cb AS (SELECT vec_id AS cid, pos, qv AS cqv, sub FROM qs WHERE vec_id < 16)",
    "cb AS (SELECT vec_id AS cid, pos, qv AS cqv, sub FROM qs"
    " WHERE vec_id < 16 AND vec_id % 4 <> 0)",
)
if _PQ_CTES_BASEQ.count("vec_id % 4 <> 0") != 2:  # survives `python -O`
    raise RuntimeError("base-quarter oracle rewrite missed a CTE anchor")
_IVF_CTES_BASE = _IVF_CTES.replace(
    "FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)",
    "FROM (SELECT * FROM embeddings WHERE vec_id % 4 <> 0"
    " ORDER BY vec_id LIMIT 16)",
)
if _IVF_CTES_BASE.count("vec_id % 4 <> 0") != 1:  # survives `python -O`
    raise RuntimeError("base-quarter oracle rewrite missed the IVF anchor")


@q(
    "q_sim_topk_ivfpq_incremental",
    _PQ_CTES_BASEQ
    + _IVF_CTES_BASE
    + """
    SELECT vec_id, pq_dist FROM pq_scored
    ORDER BY pq_dist ASC, vec_id ASC LIMIT 10
    """,
)
def q_sim_topk_ivfpq_incremental(spark, sf):
    # incremental IVF×PQ maintenance (operators/similarity.ivfpq_append):
    # the layout is BUILT from the historical corpus (vec_id % 4 != 0),
    # today's vectors are appended through the persisted FROZEN
    # quantizers — cells by the stored centroids, SQ8 by the stored rng,
    # codes by the stored codebook — and the probe (vec_id 0, itself a
    # delta vector) serves off the appended layout with partition pruning
    # intact. The oracle recomputes everything with base-derived
    # quantizers over the FULL corpus, so the hash match proves
    # append ∪ original ≡ re-encode-with-same-quantizers end to end,
    # including that same-day vectors are immediately probeable. Layout
    # rebuilt from scratch each run (rmtree) so appends can't stack.
    import os
    import shutil

    from mongo_to_parquet_spark.operators.similarity import (
        build_ivfpq_layout,
        ivfpq_append,
        ivfpq_topk_from_layout,
    )

    emb = T(spark, sf, "embeddings")
    base = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    tag = os.path.basename(sf.rstrip("/")).replace(".", "_")
    layout = os.path.abspath(
        os.path.join(
            os.path.dirname(__file__), "..", "..", "_scratch", "ivfpq_inc", tag
        )
    )
    shutil.rmtree(layout, ignore_errors=True)
    build_ivfpq_layout(base, layout)
    ivfpq_append(delta, layout)
    pv = _serve_probe_vec(emb, sf)
    return ivfpq_topk_from_layout(spark, layout, pv, k=10, n_probe=4, exclude_id=0)


@q(
    "q_eval_ann_recall_pq_refine",
    _PQ_CTES
    + _IVF_CTES
    + """
    , shortlist AS (
        SELECT vec_id FROM pq_scored
        ORDER BY pq_dist ASC, vec_id ASC LIMIT 50
    ),
    refined AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rk
        FROM (
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                CAST(pv AS DOUBLE[])), 4) AS sim
            FROM embeddings e JOIN shortlist USING (vec_id) CROSS JOIN pvec)
        QUALIFY rk <= 10
    ),
    exact AS (
        SELECT vec_id, rk FROM (
            SELECT e.vec_id,
                   row_number() OVER (ORDER BY
                       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(pv AS DOUBLE[])), 4) DESC,
                       e.vec_id ASC) AS rk
            FROM embeddings e CROSS JOIN pvec
            WHERE e.vec_id <> 0)
        WHERE rk <= 10
    )
    SELECT CAST(0 AS BIGINT) AS probe_id,
           CAST(COUNT(a.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(a.vec_id) * 10 AS BIGINT) AS recall_pct,
           CAST(COALESCE(MAX(CASE WHEN e.rk = 1 THEN a.rk END), 0) AS BIGINT)
               AS top1_rank
    FROM exact e LEFT JOIN refined a ON a.vec_id = e.vec_id
    """,
)
def q_eval_ann_recall_pq_refine(spark, sf):
    # recall@10 of the TWO-STAGE route (ADC shortlist-50 → exact re-rank)
    # vs exact brute force — the row that quantifies what stage 2 buys
    # over q_eval_ann_recall_pq's raw-PQ ranking: quantization error can
    # now only cost recall through shortlist membership, never through
    # rank inversion inside the shortlist, so hits(refine) ≥ hits(raw)
    # row-for-row (pinned in tests/test_operators.py). Recomputes the
    # composed pipeline in-memory like q_eval_ann_recall_pq so this stays
    # a pure query the oracle replays end to end; the shortlist join is a
    # 50-row broadcast (the serving key's IN-pushdown shape is covered by
    # q_sim_topk_ivfpq_refine's own plan test).
    from mongo_to_parquet_spark.functions.vector import cosine as _cos
    from mongo_to_parquet_spark.functions.vector import dot as _dot
    from mongo_to_parquet_spark.operators.similarity import (
        _assign_cells,
        _centroids,
        _sq8,
        brute_force_topk,
        pq_codes,
    )

    emb = T(spark, sf, "embeddings")
    cents = _centroids(emb, 16, "vec_id", "embedding")
    assigned = _assign_cells(emb, F.broadcast(cents), "vec_id", "embedding")
    codes, codebook, rng = pq_codes(emb)
    pvec = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__probe"))
    )
    cells = (
        cents.crossJoin(pvec)
        .select("cell", _dot(F.col("cvec"), F.col("__probe")).alias("ps"))
        .orderBy(F.col("ps").desc(), F.col("cell").asc())
        .limit(4)
        .select("cell")
    )
    qdims = emb.filter(F.col("vec_id") == 0).select(
        F.posexplode("embedding").alias("pos", "val")
    ).select("pos", F.col("val").cast("double").alias("val"))
    pqv = qdims.join(F.broadcast(rng), "pos").select(
        "pos", _sq8(F.col("val")).alias("pqv")
    )
    pdiff = F.col("pqv") - F.col("cqv")
    adc = (
        codebook.join(F.broadcast(pqv), "pos")
        .groupBy("sub", "cid")
        .agg(F.sum((pdiff * pdiff).cast("bigint")).alias("pd"))
    )
    shortlist = (
        codes.join(assigned.select("vec_id", "cell"), "vec_id")
        .join(F.broadcast(cells), "cell")
        .join(F.broadcast(adc), ["sub", "cid"])
        .filter(F.col("vec_id") != 0)
        .groupBy("vec_id")
        .agg(F.sum("pd").alias("pq_dist"))
        .orderBy(F.col("pq_dist").asc(), F.col("vec_id").asc())
        .limit(50)
        .select("vec_id")
    )
    refined = (
        emb.join(F.broadcast(shortlist), "vec_id")
        .crossJoin(pvec)
        .select(
            "vec_id",
            F.round(_cos(F.col("embedding"), F.col("__probe")), 4).alias("sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            ),
        )
        .filter(F.col("rk") <= 10)
        .select(F.col("vec_id").alias("a_vid"), F.col("rk").alias("a_rk"))
    )
    exact = brute_force_topk(emb, probe_id=0, k=10).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        ),
    ).select("vec_id", "rk")
    return (
        exact.join(F.broadcast(refined), exact.vec_id == refined.a_vid, "left")
        .agg(
            F.lit(0).cast("bigint").alias("probe_id"),
            F.count("a_vid").cast("bigint").alias("hits"),
            (F.count("a_vid") * 10).cast("bigint").alias("recall_pct"),
            F.coalesce(
                F.max(F.when(F.col("rk") == 1, F.col("a_rk"))), F.lit(0)
            )
            .cast("bigint")
            .alias("top1_rank"),
        )
    )


# --------------------------------------------------------- hybrid fusion ---
_RRF_K = 60          # standard RRF dampening constant
_RRF_LIST = 50       # depth of each retriever's candidate list


def _bm25_scored(spark, sf):
    """The q_bm25 scoring pipeline up to (doc_id, score) — shared by the
    fusion query so both rankings come from the same scorer."""
    d = T(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    s = (
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * (F.col("tf") * (k1 + F.lit(1.0)))
        / (F.col("tf") + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl")))
    ).cast("decimal(38,18)")
    return (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("s").cast("double"), 4).alias("score"))
    )


#: shared BM25-scoring CTE prefix for the fusion oracle (same CTEs as q_bm25)
_BM25_CTES = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        WHERE tok IN {_BM25_TERMS!r} GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT tf.doc_id,
               CAST(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * ({_BM25_K1} + 1.0))
                   / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               AS DECIMAL(38, 18)) AS s
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    bm25 AS (
        SELECT doc_id, ROUND(CAST(SUM(s) AS DOUBLE), 4) AS score
        FROM scored GROUP BY doc_id
    )
"""


@q(
    "q_hybrid_rrf",
    _BM25_CTES
    + f"""
    , lex AS (
        SELECT doc_id, CAST(row_number() OVER (
                   ORDER BY score DESC, doc_id ASC) AS BIGINT) AS r_lex
        FROM (SELECT * FROM bm25
              ORDER BY score DESC, doc_id ASC LIMIT {_RRF_LIST})
    ),
    probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
    cos AS (
        SELECT vec_id AS doc_id,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST(pv AS DOUBLE[])), 4) AS sim
        FROM embeddings, probe WHERE vec_id <> 0
    ),
    vec AS (
        SELECT doc_id, CAST(row_number() OVER (
                   ORDER BY sim DESC, doc_id ASC) AS BIGINT) AS r_vec
        FROM (SELECT * FROM cos ORDER BY sim DESC, doc_id ASC LIMIT {_RRF_LIST})
    ),
    fused AS (
        SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, r_lex, r_vec,
               COALESCE(1.0 / ({_RRF_K} + r_lex), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + r_vec), 0.0) AS rrf
        FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, r_lex, r_vec, ROUND(rrf, 6) AS rrf
    FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 20
    """,
)
def q_hybrid_rrf(spark, sf):
    # hybrid retrieval by reciprocal-rank fusion: the lexical (BM25) and
    # vector (cosine-to-probe) top-50 lists are fused by
    # Σ 1/(60 + rank) — the standard score-free list-fusion that needs no
    # cross-retriever calibration. Both ranks are integers from totally
    # ordered (rounded score, id) lists, so 1/(60+r) and their fixed-order
    # two-term sum are bit-identical across engines.
    #
    # Scale: each retriever's list is produced by its own scale path
    # (BM25: term-filtered aggregation + TakeOrdered; cosine: one corpus
    # scan + TakeOrdered) and is only _RRF_LIST rows; ranking and fusion
    # happen on those tiny lists (single-partition window over ≤50 rows,
    # broadcast-sized full-outer join). Fusion cost is independent of
    # corpus size — exactly how a serving tier composes retrievers.
    from mongo_to_parquet_spark.functions.vector import cosine

    e = T(spark, sf, "embeddings")
    rrf_k, depth = _RRF_K, _RRF_LIST
    lex = (
        _bm25_scored(spark, sf)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(depth)
        .withColumn(
            "r_lex",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
            .cast("bigint"),
        )
        .select("doc_id", "r_lex")
    )
    probe = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("pv"))
    )
    cos = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(probe)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("pv")), 4).alias("sim"),
        )
    )
    vec = (
        cos.orderBy(F.col("sim").desc(), F.col("doc_id").asc())
        .limit(depth)
        .withColumn(
            "r_vec",
            F.row_number()
            .over(Window.orderBy(F.col("sim").desc(), F.col("doc_id").asc()))
            .cast("bigint"),
        )
        .select("doc_id", "r_vec")
    )
    fused = lex.join(vec, "doc_id", "full").select(
        "doc_id",
        "r_lex",
        "r_vec",
        (
            F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("r_vec")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.select("doc_id", "r_lex", "r_vec", F.round("rrf", 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# ------------------------------------------------------ context assembly ---
_RAG_TOPK = 5
_RAG_BUDGET = 150  # token budget for the assembled context


@q(
    "q_rag_context",
    f"""
    WITH probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
    cos AS (
        SELECT vec_id,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST(pv AS DOUBLE[])), 4) AS sim
        FROM embeddings, probe WHERE vec_id <> 0
    ),
    top AS (
        SELECT vec_id, sim, CAST(row_number() OVER (
                   ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rk
        FROM (SELECT * FROM cos ORDER BY sim DESC, vec_id ASC LIMIT {_RAG_TOPK})
    ),
    ctx AS (
        SELECT t.vec_id AS doc_id, t.rk, t.sim,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        FROM top t JOIN documents d ON d.doc_id = t.vec_id
    ),
    run AS (
        SELECT doc_id, rk, sim, n_tokens,
               SUM(n_tokens) OVER (ORDER BY rk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM ctx
    )
    SELECT doc_id, rk, sim, n_tokens, cum_tokens
    FROM run WHERE cum_tokens <= {_RAG_BUDGET} OR rk = 1
    """,
)
def q_rag_context(spark, sf):
    # RAG context assembly: retrieve the top-5 docs for the probe, then
    # pack them into a fixed token budget in rank order (greedy prefix —
    # the highest-ranked doc always survives, later docs only while the
    # running token total fits). The last step every retrieval pipeline
    # runs before prompting.
    #
    # Scale: retrieval is the one corpus-sized stage (TakeOrdered top-k);
    # everything after — the rank window, the documents join, the running
    # sum — operates on k rows. The documents join is k lookups (Spark
    # broadcasts the k-row side); budget packing is a single-partition
    # window over k rows, not a corpus sort.
    from mongo_to_parquet_spark.functions.vector import cosine
    from mongo_to_parquet_spark.operators.similarity import brute_force_topk

    e = T(spark, sf, "embeddings")
    d = T(spark, sf, "documents")
    top = (
        brute_force_topk(e, probe_id=0, k=_RAG_TOPK)
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc()))
            .cast("bigint"),
        )
    )
    ctx = (
        F.broadcast(top)
        .join(d, top["vec_id"] == d["doc_id"])
        .select(
            "doc_id",
            "rk",
            "sim",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
    )
    w = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = ctx.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return run.filter(
        (F.col("cum_tokens") <= _RAG_BUDGET) | (F.col("rk") == 1)
    ).select("doc_id", "rk", "sim", "n_tokens", "cum_tokens")


# ------------------------------------------------------ MMR diversification
_MMR_CAND = 12   # relevance candidate pool
_MMR_K = 5       # diversified picks
#: greedy step t: score(c) = 0.7·rel(c) − 0.3·max_{s∈selected} sim(c, s),
#: all in DECIMAL so the sequential argmax is engine-exact


def _mmr_oracle() -> str:
    """The MMR greedy unrolled as chained CTEs (k−1 argmax steps after the
    rank-1 seed) — recursion-free SQL DuckDB replays exactly."""
    steps, unions = [], [
        "SELECT CAST(1 AS BIGINT) AS rk, vec_id, CAST(rel AS DOUBLE) AS mmr_score FROM s1"
    ]
    for t in range(2, _MMR_K + 1):
        p = t - 1
        steps.append(f"""
    s{t} AS (
        SELECT c.vec_id, c.rel, m.mx
        FROM cand c JOIN (
            SELECT p.i, MAX(p.s) AS mx FROM pair p
            WHERE p.j IN (SELECT vec_id FROM c{p}) GROUP BY p.i) m
          ON m.i = c.vec_id
        WHERE c.vec_id NOT IN (SELECT vec_id FROM c{p})
        ORDER BY CAST(0.7 AS DECIMAL(2,1)) * c.rel
               - CAST(0.3 AS DECIMAL(2,1)) * m.mx DESC, c.vec_id ASC
        LIMIT 1
    ),
    c{t} AS (SELECT vec_id FROM c{p} UNION ALL SELECT vec_id FROM s{t})""")
        unions.append(
            f"SELECT CAST({t} AS BIGINT), vec_id, CAST(CAST(0.7 AS DECIMAL(2,1)) * rel"
            f" - CAST(0.3 AS DECIMAL(2,1)) * mx AS DOUBLE) FROM s{t}"
        )
    return f"""
    WITH pvec AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
    cand AS (
        SELECT vec_id,
               CAST(ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                 CAST(pv AS DOUBLE[])), 4)
                    AS DECIMAL(9,4)) AS rel
        FROM embeddings CROSS JOIN pvec WHERE vec_id <> 0
        ORDER BY rel DESC, vec_id ASC LIMIT {_MMR_CAND}
    ),
    pair AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
               CAST(ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                                 CAST(eb.embedding AS DOUBLE[])), 4)
                    AS DECIMAL(9,4)) AS s
        FROM cand a JOIN embeddings ea ON ea.vec_id = a.vec_id
             JOIN cand b ON b.vec_id <> a.vec_id
             JOIN embeddings eb ON eb.vec_id = b.vec_id
    ),
    s1 AS (SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1),
    c1 AS (SELECT vec_id FROM s1),{",".join(steps).lstrip(",")}
    {" UNION ALL ".join(unions)}
    """


@q("q_rag_mmr", _mmr_oracle())
def q_rag_mmr(spark, sf):
    # MMR (maximal marginal relevance, Carbonell & Goldstein 1998): the
    # diversified re-rank every RAG pipeline wants when the plain top-k
    # returns five near-copies of the same passage — greedily pick the
    # candidate maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    # selected. Inherently SEQUENTIAL in k, so the engine shape is:
    # corpus-sized work (top-N relevance candidates, one TakeOrdered scan;
    # N×N candidate sims, broadcast joins over N=12 rows) runs in Spark,
    # and the k-step greedy runs over the collected N×N matrix driver-side
    # — the kmeans/census exception (k·N is constant, never corpus-sized).
    # Everything is DECIMAL(9,4)/(2,1) fixed-point, so the argmax sequence
    # — and therefore the whole selection — is engine-exact; the oracle
    # replays the identical greedy as unrolled chained-CTE SQL.
    from decimal import Decimal

    from mongo_to_parquet_spark.functions.vector import cosine
    from mongo_to_parquet_spark.operators.similarity import brute_force_topk

    emb = T(spark, sf, "embeddings")
    cand = brute_force_topk(emb, probe_id=0, k=_MMR_CAND).select(
        "vec_id", F.round(F.col("sim"), 4).cast("decimal(9,4)").alias("rel")
    )
    rows = cand.collect()
    rel = {r["vec_id"]: r["rel"] for r in rows}
    ids = sorted(rel)
    ce = F.broadcast(
        emb.filter(F.col("vec_id").isin(ids)).select("vec_id", "embedding")
    )
    a, b = ce.alias("a"), ce.alias("b")
    sim_rows = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("i"),
            F.col("b.vec_id").alias("j"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 4)
            .cast("decimal(9,4)")
            .alias("s"),
        )
        .collect()
    )
    sim: dict[tuple[int, int], Decimal] = {}
    for r in sim_rows:
        sim[(r["i"], r["j"])] = sim[(r["j"], r["i"])] = r["s"]
    lam, lam1 = Decimal("0.7"), Decimal("0.3")
    first = max(rel, key=lambda v: (rel[v], -v))
    picked = [(1, first, float(rel[first]))]
    chosen = [first]
    while len(chosen) < _MMR_K:
        best = None
        for c in ids:
            if c in chosen:
                continue
            mx = max(sim[(c, s)] for s in chosen)
            score = lam * rel[c] - lam1 * mx
            if best is None or (score, -c) > (best[1], -best[0]):
                best = (c, score)
        picked.append((len(chosen) + 1, best[0], float(best[1])))
        chosen.append(best[0])
    return spark.createDataFrame(
        picked, "rk bigint, vec_id bigint, mmr_score double"
    )


# ------------------------------------------------------------ KMV sketch ---
# one definition of the cross-engine KMV hash contract lives in
# functions/sketch.py (shared with the q_agg_approx_* twins and the
# streaming fold) — thin aliases keep this module's oracle f-strings
# readable without a second copy that could drift
from mongo_to_parquet_spark.functions import sketch as _sk  # noqa: E402

_KMV_K = _sk.DEFAULT_K
_U32 = _sk.U32  # md5-prefix hash space (2^32)
_kmv_h_sql = _sk.kmv_hash_sql


@q(
    "q_sketch_kmv",
    f"""
    WITH a AS (SELECT DISTINCT {_kmv_h_sql('user_id')} AS h
               FROM events
               WHERE event_type = 'error' AND user_id IS NOT NULL),
    b AS (SELECT DISTINCT {_kmv_h_sql('user_id')} AS h
          FROM events WHERE value >= 250.0 AND user_id IS NOT NULL),
    ka AS (SELECT h FROM a ORDER BY h ASC LIMIT {_KMV_K}),
    kb AS (SELECT h FROM b ORDER BY h ASC LIMIT {_KMV_K}),
    ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
           ORDER BY h ASC LIMIT {_KMV_K}),
    su AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS theta FROM ku),
    rho AS (SELECT CAST(COUNT(*) AS BIGINT) AS rho
            FROM ka JOIN kb USING (h) CROSS JOIN su WHERE ka.h <= theta),
    ex AS (
        SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
               CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
               CAST((SELECT COUNT(*) FROM
                     (SELECT h FROM a UNION SELECT h FROM b)) AS BIGINT)
                   AS exact_union,
               CAST((SELECT COUNT(*) FROM a JOIN b USING (h)) AS BIGINT)
                   AS exact_int
    )
    SELECT n_a, n_b, exact_union, exact_int,
           ROUND(CASE WHEN m < {_KMV_K} THEN CAST(exact_union AS DOUBLE)
                      ELSE ({_KMV_K} - 1) * {_U32}.0 / theta END, 4) AS est_union,
           ROUND(CASE WHEN m < {_KMV_K} THEN CAST(exact_int AS DOUBLE)
                      ELSE CAST(rho AS DOUBLE)
                           * (({_KMV_K} - 1) * {_U32}.0 / theta) / {_KMV_K}
                 END, 4) AS est_int
    FROM ex CROSS JOIN su CROSS JOIN rho
    """,
)
def q_sketch_kmv(spark, sf):
    # KMV (k-minimum-values) distinct sketch with md5-derived hashes —
    # hash-checkable like q_sketch_cms/_bloom. Two audiences (users with
    # error events; users with a high-value event) each keep their k=64
    # smallest hash values; the union estimate is (k-1)·2^32/θ with θ the
    # k-th smallest of the merged sketch, and the INTERSECTION estimate is
    # (ρ/k)·est_union with ρ the shared values below θ — the set-overlap
    # capability HLL cannot provide. Exact counts ride alongside so the
    # estimate quality is visible; below k survivors the sketch is exact
    # by construction (both engines take the same CASE branch).
    #
    # Scale: each sketch is a TakeOrdered k-smallest over a distinct-hash
    # set — per-partition top-k then a k·partitions merge, never a global
    # sort; merging sketches is a 2k-row operation, and audience-overlap
    # questions at 100 TB (retention, campaign reach) are answered by
    # intersecting 64-row states instead of joining raw event logs.
    # NULL audience members are excluded on BOTH sides (no-op today: the
    # fixture has no null user_ids) — a NULL hash would sort FIRST in
    # Spark's ASC top-k but LAST in DuckDB's, consuming a sketch slot on
    # one engine only (the q_tpch_q16 defensive-hardening pattern)
    ev = T(spark, sf, "events").filter(F.col("user_id").isNotNull())
    k = _KMV_K
    h = _sk.kmv_hash(F.col("user_id")).alias("h")
    a = ev.filter(F.col("event_type") == "error").select(h).distinct()
    b = ev.filter(F.col("value") >= 250.0).select(h).distinct()
    ka = a.orderBy("h").limit(k)
    kb = b.orderBy("h").limit(k)
    ku = ka.unionAll(kb).distinct().orderBy("h").limit(k)
    su = ku.agg(F.count(F.lit(1)).alias("m"), F.max("h").alias("theta"))
    rho = (
        ka.join(kb, "h")
        .crossJoin(F.broadcast(su))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).alias("rho"))
    )
    ex = (
        a.agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_b")))
        .crossJoin(
            a.unionAll(b).distinct().agg(F.count(F.lit(1)).alias("exact_union"))
        )
        .crossJoin(a.join(b, "h").agg(F.count(F.lit(1)).alias("exact_int")))
    )
    est_u = (F.lit(k - 1) * F.lit(float(_U32))) / F.col("theta")
    return (
        ex.crossJoin(su)
        .crossJoin(rho)
        .select(
            "n_a",
            "n_b",
            "exact_union",
            "exact_int",
            F.round(
                F.when(F.col("m") < k, F.col("exact_union").cast("double")).otherwise(
                    est_u
                ),
                4,
            ).alias("est_union"),
            F.round(
                F.when(F.col("m") < k, F.col("exact_int").cast("double")).otherwise(
                    F.col("rho").cast("double") * est_u / F.lit(k)
                ),
                4,
            ).alias("est_int"),
        )
    )


# ------------------------------------------------- matryoshka truncation ---
_MRL_DIMS = 16   # truncated prefix dimensionality (of 64)
_MRL_K = 10


@q(
    "q_sim_matryoshka",
    f"""
    WITH probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
    full_sim AS (
        SELECT vec_id AS doc_id,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST(pv AS DOUBLE[])), 4) AS sim_full
        FROM embeddings, probe WHERE vec_id <> 0
    ),
    trunc_sim AS (
        SELECT vec_id AS doc_id,
               ROUND(list_cosine_similarity(CAST(embedding[1:{_MRL_DIMS}] AS DOUBLE[]),
                                            CAST(pv[1:{_MRL_DIMS}] AS DOUBLE[])), 4)
                   AS sim_trunc
        FROM embeddings, probe WHERE vec_id <> 0
    ),
    tf AS (
        SELECT doc_id, sim_full, CAST(row_number() OVER (
                   ORDER BY sim_full DESC, doc_id ASC) AS BIGINT) AS r_full
        FROM (SELECT * FROM full_sim ORDER BY sim_full DESC, doc_id ASC
              LIMIT {_MRL_K})
    ),
    tt AS (
        SELECT doc_id, sim_trunc, CAST(row_number() OVER (
                   ORDER BY sim_trunc DESC, doc_id ASC) AS BIGINT) AS r_trunc
        FROM (SELECT * FROM trunc_sim ORDER BY sim_trunc DESC, doc_id ASC
              LIMIT {_MRL_K})
    )
    SELECT COALESCE(tf.doc_id, tt.doc_id) AS doc_id,
           r_full, sim_full, r_trunc, sim_trunc
    FROM tf FULL OUTER JOIN tt ON tf.doc_id = tt.doc_id
    """,
)
def q_sim_matryoshka(spark, sf):
    # Matryoshka-style truncated retrieval audit: the top-10 list by full
    # 64-dim cosine vs the top-10 by the FIRST-16-dims prefix (the MRL
    # deployment pattern — serve a cheap prefix index, re-rank with full
    # vectors). The full-outer join of the two ranked lists shows exactly
    # which neighbors the truncated index keeps, loses, and re-orders —
    # the recall evidence you collect before switching serving to the
    # prefix.
    #
    # Scale: both scoring passes are ONE corpus scan each ending in
    # TakeOrdered (the truncated pass reads 4× less vector data — at
    # serving time it is the only pass, with the full vectors touched
    # just for the k re-rank candidates); the rank windows and the
    # fusion join run on ≤k rows.
    from mongo_to_parquet_spark.functions.vector import cosine

    e = T(spark, sf, "embeddings")
    probe = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("pv"))
    )
    corpus = e.filter(F.col("vec_id") != 0).crossJoin(probe)

    def ranked(sim_col, sim_name, rank_name):
        return (
            corpus.select(
                F.col("vec_id").alias("doc_id"), F.round(sim_col, 4).alias(sim_name)
            )
            .orderBy(F.col(sim_name).desc(), F.col("doc_id").asc())
            .limit(_MRL_K)
            .withColumn(
                rank_name,
                F.row_number()
                .over(Window.orderBy(F.col(sim_name).desc(), F.col("doc_id").asc()))
                .cast("bigint"),
            )
        )

    tf = ranked(cosine(F.col("embedding"), F.col("pv")), "sim_full", "r_full")
    tt = ranked(
        cosine(
            F.slice(F.col("embedding"), 1, _MRL_DIMS),
            F.slice(F.col("pv"), 1, _MRL_DIMS),
        ),
        "sim_trunc",
        "r_trunc",
    )
    return tf.join(tt, "doc_id", "full").select(
        "doc_id", "r_full", "sim_full", "r_trunc", "sim_trunc"
    )


# -------------------------------------------------------------- PCA --------
_PCA_ITERS = 3


_PCA_CTES = f"""
    WITH dims AS (
        SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    n AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM dims),
    mu AS (
        SELECT pos,
               CAST(SUM(CAST(val AS DECIMAL(38, 18))) AS DOUBLE) / COUNT(*) AS mu
        FROM dims GROUP BY pos
    ),
    c AS (SELECT vec_id, pos, val - mu AS v FROM dims JOIN mu USING (pos)),
    cov AS (
        SELECT a.pos AS i, b.pos AS j,
               CAST(SUM(CAST(a.v * b.v AS DECIMAL(38, 18))) AS DOUBLE)
                   / (n - 1) AS cv
        FROM c a JOIN c b USING (vec_id) CROSS JOIN n
        GROUP BY a.pos, b.pos, n
    ),
    v0 AS (SELECT CAST(unnest(range(64)) AS INT) AS j, 0.125 AS v),
    y1 AS (SELECT i, CAST(SUM(CAST(cv * v AS DECIMAL(38, 18))) AS DOUBLE) AS y
           FROM cov JOIN v0 ON cov.j = v0.j GROUP BY i),
    v1 AS (SELECT i AS j, y / sqrt((SELECT CAST(SUM(CAST(y * y AS DECIMAL(38, 18)))
                                              AS DOUBLE) FROM y1)) AS v FROM y1),
    y2 AS (SELECT i, CAST(SUM(CAST(cv * v AS DECIMAL(38, 18))) AS DOUBLE) AS y
           FROM cov JOIN v1 ON cov.j = v1.j GROUP BY i),
    v2 AS (SELECT i AS j, y / sqrt((SELECT CAST(SUM(CAST(y * y AS DECIMAL(38, 18)))
                                              AS DOUBLE) FROM y2)) AS v FROM y2),
    y3 AS (SELECT i, CAST(SUM(CAST(cv * v AS DECIMAL(38, 18))) AS DOUBLE) AS y
           FROM cov JOIN v2 ON cov.j = v2.j GROUP BY i),
    v3 AS (SELECT i AS j, y / sqrt((SELECT CAST(SUM(CAST(y * y AS DECIMAL(38, 18)))
                                              AS DOUBLE) FROM y3)) AS v FROM y3),
    lam AS (
        SELECT CAST(SUM(CAST(cov.cv * a.v * b.v AS DECIMAL(38, 18))) AS DOUBLE)
                   AS lam
        FROM cov JOIN v3 a ON cov.i = a.j JOIN v3 b ON cov.j = b.j
    )
"""


@q(
    "q_embed_pca",
    _PCA_CTES
    + """
    SELECT j AS pos, ROUND(v, 6) AS component,
           ROUND((SELECT lam FROM lam), 4) AS eigenvalue
    FROM v3
    """,
)
def q_embed_pca(spark, sf):
    # NOTE on the (38,18) decimal→double casts in the oracle: DuckDB's
    # INT128-decimal→DOUBLE conversion double-rounds (unscaled/10^s in
    # float; queries/__init__ determinism rules). Harmless HERE because
    # every OUTPUT is ROUND-wrapped (6dp component / 4dp eigenvalue),
    # which absorbs sub-ulp drift in intermediates; an unrounded output
    # must use narrower decimals or fixed-point instead
    # (q_score_recency_decay / the kmeans centroid means at scale 12).
    # top principal component of the embedding corpus by POWER ITERATION
    # (3 fixed steps from a deterministic uniform start): center, exact
    # decimal-summed covariance, then v ← normalize(Cv) three times with
    # every reduction (matrix-vector products, norms, the Rayleigh
    # quotient) summed in DECIMAL(38,18) so the result is bit-identical
    # cross-engine — iterative linear algebra under the same fixed-point
    # discipline as PageRank. The direction every embedding-drift /
    # whitening / debiasing pass needs first.
    #
    # Scale: the covariance build is the one corpus-sized stage — a
    # vec_id-keyed self-join emitting d² partial products that partial-
    # combine to a d×d matrix (d=64 → 4096 rows; state is the matrix,
    # not the corpus). Every iteration is a broadcast join of the d-row
    # vector against the d²-row matrix: iteration cost is INDEPENDENT of
    # corpus size, so 100 iterations on 100 TB cost the same as on 100 MB
    # once the covariance is built.
    e = T(spark, sf, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    )
    mu_rows = (
        dims.groupBy("pos")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mu")
        )
        .orderBy("pos")
        .collect()
    )
    # d-row driver picks (the kmeans-centroid exception): the mean vector
    # and the corpus count ride the plan as LITERALS so the covariance
    # build is a MAP-SIDE outer product — each vector emits its own d²
    # (i, j, vᵢ·vⱼ) partial products, which partial-combine to the d×d
    # matrix before the (tasks × d²-row) shuffle. The round-10 ×10 probe
    # caught the previous vec_id self-join form flipping broadcast→SMJ
    # as the corpus outgrew the broadcast threshold (shuffle ×35, wall
    # ×41 for ×10 data): a strategy cliff in a linear-work operator.
    # This shape has no join to flip — covariance cost is one scan at
    # every corpus size. Python-float round-trip of the collected means
    # is exact (binary64), so the centered products are bit-identical to
    # the joined form and the oracle is unchanged.
    # n is COUNT(DISTINCT vec_id) over the rows that actually produce
    # dims — the oracle's definition — NOT e.count(): on a corpus with
    # duplicate vec_ids or null/empty embedding arrays the two diverge
    # (null/empty vectors unnest to zero dim rows and must not inflate
    # the covariance divisor). Pinned by the degenerate-corpus test in
    # tests/test_adversarial_r11.py.
    n_val = int(dims.select(F.countDistinct("vec_id")).first()[0])
    mu_arr = F.array(*[F.lit(float(r["mu"])) for r in mu_rows])
    centered = e.select(
        "vec_id",
        F.explode(
            F.array(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    mu_arr,
                    lambda x, m: x - m,
                )
            )
        ).alias("cv"),  # bind as a REAL attribute (lambda-VALUE rule)
    )
    pairs = centered.select(
        F.explode(
            F.expr(
                "flatten(transform(cv, (vi, i) ->"
                " transform(cv, (vj, j) ->"
                " struct(i AS i, j AS j, vi * vj AS p))))"
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    cov = (
        pairs.groupBy("i", "j")
        .agg(
            (
                F.sum(F.col("p").cast("decimal(38,18)")).cast("double")
                / F.lit(n_val - 1)
            ).alias("cv")
        )
    )
    v = spark.range(64).select(
        F.col("id").cast("int").alias("j"), F.lit(0.125).alias("v")
    )
    for _ in range(_PCA_ITERS):
        y = (
            cov.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(
                F.sum((F.col("cv") * F.col("v")).cast("decimal(38,18)"))
                .cast("double")
                .alias("y")
            )
        )
        nrm = y.agg(
            F.sqrt(
                F.sum((F.col("y") * F.col("y")).cast("decimal(38,18)")).cast("double")
            ).alias("nrm")
        )
        v = (
            y.crossJoin(F.broadcast(nrm))
            .select(F.col("i").alias("j"), (F.col("y") / F.col("nrm")).alias("v"))
        )
    va = v.select(F.col("j").alias("i"), F.col("v").alias("via"))
    vb = v.select("j", F.col("v").alias("vjb"))
    lam = (
        cov.join(F.broadcast(va), "i")
        .join(F.broadcast(vb), "j")
        .agg(
            F.sum((F.col("cv") * F.col("via") * F.col("vjb")).cast("decimal(38,18)"))
            .cast("double")
            .alias("lam")
        )
    )
    return v.crossJoin(F.broadcast(lam)).select(
        F.col("j").alias("pos"),
        F.round("v", 6).alias("component"),
        F.round("lam", 4).alias("eigenvalue"),
    )


@q(
    "q_pca_apply_artifact",
    _PCA_CTES
    + """
    SELECT d.vec_id,
           ROUND(CAST(SUM(CAST(d.val * ROUND(v3.v, 6) AS DECIMAL(38,18)))
                      AS DOUBLE), 4) AS pca_score
    FROM dims d JOIN v3 ON d.pos = v3.j
    GROUP BY d.vec_id
    """,
)
def q_pca_apply_artifact(spark, sf):
    # PCA PROJECTION served from a stored component (round-9 verdict
    # item 1): power iteration runs once and persists the DECLARED
    # component — the 6-decimal-ROUNDED eigenvector, exactly the values
    # q_embed_pca's own hash gate already proves bit-identical across
    # engines, so the projection consumes a cross-engine-stable model and
    # parquet doubles round-trip it exactly. The serve projects every
    # embedding onto the stored direction (the per-doc score an
    # embedding-drift / whitening / filtering pass reads):
    # pca_score = Σⱼ xⱼ·v₆ⱼ with the sum in DECIMAL(38,18) so it is
    # order-free on both engines, ROUNDed at 4dp. Oracle = the full
    # train CTE chain + the same projection: store→load→project ≡
    # train→project, hash-gated.
    #
    # Scale: the covariance build + iteration leave the per-ingest path;
    # serving is one posexplode + a 64-row broadcast join + a per-vector
    # aggregate — scan-speed scoring at any corpus size. (The projection
    # is deliberately UNcentered: centering shifts every score by the
    # same constant ⟨μ,v⟩, irrelevant for ranking/drift deltas, and
    # keeping μ out of the artifact halves its float surface.)
    from mongo_to_parquet_spark.operators import tokenizer

    art = tokenizer.artifact_dir(sf, "pca")
    want = {"iters": _PCA_ITERS, "dim": 64}
    if not tokenizer.artifact_current(art, "pca", want):
        tokenizer.save_artifact(
            spark, q_embed_pca(spark, sf), art, "pca", meta=want
        )
    comp = tokenizer.load_artifact(spark, art, "pca").select("pos", "component")
    dims = T(spark, sf, "embeddings").select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    return (
        dims.join(F.broadcast(comp), "pos")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(
                    (F.col("val") * F.col("component")).cast("decimal(38,18)")
                ).cast("double"),
                4,
            ).alias("pca_score")
        )
    )


# ----------------------------------------------------------- L2 top-k ------
@q(
    "q_sim_topk_l2",
    """
    WITH probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_distance(CAST(embedding AS DOUBLE[]),
                               CAST(pv AS DOUBLE[])), 4) AS dist
    FROM embeddings, probe
    WHERE vec_id <> 0
    ORDER BY dist ASC, vec_id ASC
    LIMIT 10
    """,
)
def q_sim_topk_l2(spark, sf):
    # nearest neighbors by EUCLIDEAN distance — the metric most ANN
    # indexes (IVF/PQ/HNSW) are built on; completes the metric surface
    # next to cosine (q_sim_topk) and the quantized integer distances
    # (q_sim_topk_pq). Ordered by the rounded distance with id tiebreak,
    # same determinism contract as every top-k here.
    #
    # Scale: identical shape to q_sim_topk — broadcast probe, one corpus
    # scan, TakeOrdered per-partition top-k + driver merge of k×
    # partitions rows; swap in the IVF layout (cells built on the same
    # metric) when one probe per full scan stops being acceptable.
    from mongo_to_parquet_spark.functions.vector import l2_dist

    e = T(spark, sf, "embeddings")
    probe = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("pv"))
    )
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(probe)
        .select(
            "vec_id",
            F.round(l2_dist(F.col("embedding"), F.col("pv")), 4).alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
        .limit(10)
    )


# ------------------------------------------------- retrieval evaluation ----
_EVAL_PROBES = (0, 1, 2, 3)


@q(
    "q_eval_ann_recall",
    """
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding AS cvec
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(c.cvec AS DOUBLE[])) DESC,
                                c.cell ASC) AS rk
            FROM embeddings e CROSS JOIN cents c)
        WHERE rk = 1
    ),
    probes AS (
        SELECT vec_id AS probe_id, embedding AS pv
        FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
    ),
    cells AS (
        SELECT probe_id, cell FROM (
            SELECT p.probe_id, c.cell,
                   row_number() OVER (PARTITION BY p.probe_id
                       ORDER BY list_dot_product(CAST(c.cvec AS DOUBLE[]),
                                                 CAST(p.pv AS DOUBLE[])) DESC,
                                c.cell ASC) AS crk
            FROM cents c CROSS JOIN probes p)
        WHERE crk <= 4
    ),
    approx AS (
        SELECT probe_id, vec_id, rk FROM (
            SELECT cl.probe_id, a.vec_id,
                   row_number() OVER (PARTITION BY cl.probe_id ORDER BY
                       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                    CAST(p.pv AS DOUBLE[])), 4) DESC,
                       a.vec_id ASC) AS rk
            FROM assigned a JOIN cells cl USING (cell)
                 JOIN probes p ON p.probe_id = cl.probe_id
            WHERE a.vec_id <> cl.probe_id)
        WHERE rk <= 10
    ),
    exact AS (
        SELECT probe_id, vec_id, rk FROM (
            SELECT p.probe_id, e.vec_id,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(p.pv AS DOUBLE[])), 4) DESC,
                       e.vec_id ASC) AS rk
            FROM embeddings e CROSS JOIN probes p
            WHERE e.vec_id <> p.probe_id)
        WHERE rk <= 10
    )
    SELECT e.probe_id,
           CAST(COUNT(a.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(a.vec_id) * 10 AS BIGINT) AS recall_pct,
           CAST(COALESCE(MAX(CASE WHEN e.rk = 1 THEN a.rk END), 0) AS BIGINT)
               AS top1_rank
    FROM exact e LEFT JOIN approx a
      ON a.probe_id = e.probe_id AND a.vec_id = e.vec_id
    GROUP BY e.probe_id
    """,
)
def q_eval_ann_recall(spark, sf):
    # ANN index QUALITY GATE: recall@10 of the IVF index against exact
    # brute-force ground truth, per probe — the measurement that must
    # accompany every approximate index before it replaces an exact
    # scan ("the IVF answers in 1/n_cells the scan cost — at what
    # recall?"). Both rankings use the identical (rounded sim, id)
    # total order, so the overlap join is exact; outputs are pure
    # integers (hits, recall%, and where the true top-1 landed in the
    # approx list, 0 = missed entirely). The whole evaluation —
    # ground-truth build included — is oracle-replayed.
    #
    # Scale: ground truth is the batch brute-force (ONE corpus scan for
    # all probes, WindowGroupLimit top-k); the IVF side shares its cell
    # assignment across probes and scans n_probe cells per probe. In
    # production this runs over a SAMPLED probe set (here: 4 fixed ids)
    # against the full corpus — cost is one exact scan total, not per
    # probe, then k-row-per-probe joins. Recall regressions surface as
    # integer deltas, stable under reruns.
    from mongo_to_parquet_spark.operators.similarity import (
        brute_force_topk_batch,
        ivf_topk_batch,
    )

    emb = T(spark, sf, "embeddings")
    probes = list(_EVAL_PROBES)
    exact = brute_force_topk_batch(emb, probes, k=10).select(
        "probe_id", F.col("vec_id"), "rk"
    )
    approx = ivf_topk_batch(emb, probes, k=10, n_cells=16, n_probe=4).select(
        F.col("probe_id").alias("a_pid"),
        F.col("vec_id").alias("a_vid"),
        F.col("rk").alias("a_rk"),
    )
    # both sides are k·|probes| rows; hint broadcast so the overlap join
    # never sorts (Catalyst's stats otherwise pick an SMJ here)
    j = exact.join(
        F.broadcast(approx),
        (F.col("probe_id") == F.col("a_pid")) & (F.col("vec_id") == F.col("a_vid")),
        "left",
    )
    return j.groupBy("probe_id").agg(
        F.count("a_vid").cast("bigint").alias("hits"),
        (F.count("a_vid") * 10).cast("bigint").alias("recall_pct"),
        F.coalesce(
            F.max(F.when(F.col("rk") == 1, F.col("a_rk"))), F.lit(0)
        )
        .cast("bigint")
        .alias("top1_rank"),
    )


@q(
    "q_eval_ranking",
    """
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS pv, label AS plabel
        FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
    ),
    ranked AS (
        SELECT probe_id, vec_id, rk,
               CASE WHEN label = plabel THEN 1 ELSE 0 END AS rel
        FROM (
            SELECT p.probe_id, e.vec_id, e.label, p.plabel,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(p.pv AS DOUBLE[])), 4) DESC,
                       e.vec_id ASC) AS rk
            FROM embeddings e CROSS JOIN probes p
            WHERE e.vec_id <> p.probe_id)
        WHERE rk <= 10
    ),
    m AS (
        SELECT probe_id, rk, rel,
               SUM(rel) OVER (PARTITION BY probe_id ORDER BY rk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrel
        FROM ranked)
    SELECT probe_id,
           CAST(SUM(rel) AS BIGINT) AS rel_at_10,
           CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN rk END), 0) AS BIGINT)
               AS first_rel_rank,
           CAST(COALESCE(SUM(CASE WHEN rel = 1
                                  THEN cumrel * (2520 // rk) END), 0) AS BIGINT)
               AS ap_x2520
    FROM m GROUP BY probe_id
    """,
)
def q_eval_ranking(spark, sf):
    # Label-relevance ranking metrics over the exact cosine top-10:
    # precision@10, rank of the first relevant hit, and AVERAGE
    # PRECISION — the metric that rewards putting relevant items EARLY,
    # not just somewhere in the k. AP's rational arithmetic
    # (Σ precision@hit = Σ cumrel_i / i) is made hash-exact by scaling
    # with lcm(1..10) = 2520: cumrel·(2520/i) is a whole number for
    # every i ≤ 10, so ap_x2520 is an exact BIGINT in both engines —
    # divide by 2520·R offline for the usual [0,1] AP. No float enters
    # any metric.
    #
    # Scale: one corpus scan scores every (candidate, probe) pair for
    # the whole probe batch (WindowGroupLimit keeps k per probe); the
    # metric windows then run over k·|probes| rows — nothing. With
    # labeled eval sets in the millions, the same plan shards by
    # probe_id; relevance labels ride the broadcast probe table.
    from mongo_to_parquet_spark.operators.similarity import brute_force_topk_batch

    emb = T(spark, sf, "embeddings")
    probes = list(_EVAL_PROBES)
    labels = emb.select("vec_id", "label")
    plabels = F.broadcast(
        emb.filter(F.col("vec_id").isin(probes)).select(
            F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
        )
    )
    ranked = (
        brute_force_topk_batch(emb, probes, k=10)
        .join(labels, "vec_id")
        .join(plabels, "probe_id")
        .select(
            "probe_id",
            "rk",
            F.when(F.col("label") == F.col("plabel"), 1).otherwise(0).alias("rel"),
        )
    )
    w = (
        Window.partitionBy("probe_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = ranked.withColumn("cumrel", F.sum("rel").over(w))
    return m.groupBy("probe_id").agg(
        F.sum("rel").cast("bigint").alias("rel_at_10"),
        F.coalesce(F.min(F.when(F.col("rel") == 1, F.col("rk"))), F.lit(0))
        .cast("bigint")
        .alias("first_rel_rank"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.col("cumrel") * F.expr("div(2520, rk)"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("ap_x2520"),
    )


#: nDCG@10 fixed-point weights — the q_stats_benford shared-literal
#: discipline: W[i] = round(10⁶ / log2(i+1)) precomputed ONCE in python
#: and folded into BOTH engines' expressions as integer literals, so no
#: transcendental is ever evaluated by either engine and every metric is
#: exact BIGINT arithmetic. _NDCG_IW[r] = Σ W[1..r] (ideal-DCG prefix).
_NDCG_W = (1000000, 630930, 500000, 430677, 386853,
           356207, 333333, 315465, 301030, 289065)
_NDCG_IW = (1000000, 1630930, 2130930, 2561607, 2948460,
            3304667, 3638000, 3953465, 4254495, 4543560)
_NDCG_W_SQL = " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W))
_NDCG_IW_SQL = " ".join(f"WHEN {r + 1} THEN {s}" for r, s in enumerate(_NDCG_IW))


@q(
    "q_eval_ndcg",
    f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS pv, label AS plabel
        FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
    ),
    nrel AS (
        SELECT p.probe_id, CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM embeddings e JOIN probes p
          ON e.label = p.plabel AND e.vec_id <> p.probe_id
        GROUP BY p.probe_id
    ),
    ranked AS (
        SELECT probe_id, rk,
               CASE WHEN label = plabel THEN 1 ELSE 0 END AS rel
        FROM (
            SELECT p.probe_id, e.label, p.plabel,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(p.pv AS DOUBLE[])), 4) DESC,
                       e.vec_id ASC) AS rk
            FROM embeddings e CROSS JOIN probes p
            WHERE e.vec_id <> p.probe_id)
        WHERE rk <= 10
    ),
    dcg AS (
        SELECT probe_id,
               CAST(SUM(rel * CASE rk {_NDCG_W_SQL} END) AS BIGINT) AS dcg_x1e6
        FROM ranked GROUP BY probe_id
    )
    SELECT d.probe_id, d.dcg_x1e6,
           CAST(CASE LEAST(n.n_rel, 10) {_NDCG_IW_SQL} ELSE 0 END AS BIGINT)
               AS idcg_x1e6,
           CAST(CASE WHEN n.n_rel = 0 THEN 0
                     ELSE d.dcg_x1e6 * 10000
                          // (CASE LEAST(n.n_rel, 10) {_NDCG_IW_SQL} END)
                END AS BIGINT) AS ndcg_bp
    FROM dcg d JOIN nrel n ON d.probe_id = n.probe_id
    """,
)
def q_eval_ndcg(spark, sf):
    # nDCG@10 over the exact cosine top-10 — completes the ranking-metric
    # family beside q_eval_ranking's precision/AP: DCG discounts each
    # relevant hit by 1/log2(rank+1), normalized by the ideal DCG of
    # min(n_relevant, 10) front-loaded hits. ALL arithmetic is integer:
    # the discount weights (×10⁶) and their ideal-prefix sums are shared
    # python-precomputed literals (_NDCG_W/_NDCG_IW — the benford
    # discipline), the final nDCG is basis points by integer floor-div,
    # so both engines agree bit-for-bit with no transcendental in either.
    #
    # Scale: the candidate scan + WindowGroupLimit top-k is the shared
    # batch-eval shape; n_rel per probe is one broadcast-joined count
    # aggregation over (label, probe) — label cardinality keys. Metric
    # arithmetic runs over k·|probes| rows.
    from mongo_to_parquet_spark.operators.similarity import brute_force_topk_batch

    emb = T(spark, sf, "embeddings")
    probes = list(_EVAL_PROBES)
    labels = emb.select("vec_id", "label")
    plabels = F.broadcast(
        emb.filter(F.col("vec_id").isin(probes)).select(
            F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
        )
    )
    nrel = (
        emb.select("vec_id", "label")
        .crossJoin(plabels.withColumnRenamed("probe_id", "p_id"))
        .filter((F.col("label") == F.col("plabel")) & (F.col("vec_id") != F.col("p_id")))
        .groupBy(F.col("p_id").alias("probe_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    )
    w_case = f"CASE rk {_NDCG_W_SQL} END"
    iw_case = f"CASE least(n_rel, 10) {_NDCG_IW_SQL} END"
    dcg = (
        brute_force_topk_batch(emb, probes, k=10)
        .join(labels, "vec_id")
        .join(plabels, "probe_id")
        .select(
            "probe_id",
            F.when(F.col("label") == F.col("plabel"), 1).otherwise(0).alias("rel"),
            F.expr(w_case).alias("w"),
        )
        .groupBy("probe_id")
        .agg(F.sum(F.col("rel") * F.col("w")).cast("bigint").alias("dcg_x1e6"))
    )
    return dcg.join(nrel, "probe_id").select(
        "probe_id",
        "dcg_x1e6",
        F.expr(f"CAST(CASE least(n_rel, 10) {_NDCG_IW_SQL} ELSE 0 END AS BIGINT)").alias(
            "idcg_x1e6"
        ),
        F.expr(
            f"CAST(CASE WHEN n_rel = 0 THEN 0 "
            f"ELSE div(dcg_x1e6 * 10000, {iw_case}) END AS BIGINT)"
        ).alias("ndcg_bp"),
    )


@q(
    "q_eval_mrr",
    """
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS pv, label AS plabel
        FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
    ),
    ranked AS (
        SELECT probe_id, rk,
               CASE WHEN label = plabel THEN 1 ELSE 0 END AS rel
        FROM (
            SELECT p.probe_id, e.label, p.plabel,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(p.pv AS DOUBLE[])), 4) DESC,
                       e.vec_id ASC) AS rk
            FROM embeddings e CROSS JOIN probes p
            WHERE e.vec_id <> p.probe_id)
        WHERE rk <= 10
    ),
    frr AS (
        SELECT probe_id,
               COALESCE(MIN(CASE WHEN rel = 1 THEN rk END), 0) AS first_rk
        FROM ranked GROUP BY probe_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN first_rk > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(SUM(CASE WHEN first_rk > 0 THEN 2520 // first_rk ELSE 0 END)
                AS BIGINT) AS mrr_x2520
    FROM frr
    """,
)
def q_eval_mrr(spark, sf):
    # MRR@10 over the exact cosine top-10 — the one-number eval summary
    # beside q_eval_ranking's per-probe metrics and q_eval_ndcg: mean
    # reciprocal rank of the FIRST relevant hit, zero when none lands in
    # the top-10. Exact integer arithmetic via the lcm(1..10)=2520 scaling
    # (the ap_x2520 discipline): 2520/rk is whole for every rk <= 10, so
    # mrr_x2520 is a plain BIGINT sum — divide by 2520*n_probes offline.
    #
    # Scale: the shared batch-eval shape (one corpus scan scores all
    # probes, WindowGroupLimit keeps 10 per probe), then two tiny
    # aggregates over k*|probes| rows. With labeled eval sets in the
    # millions the same plan shards by probe_id.
    from mongo_to_parquet_spark.operators.similarity import brute_force_topk_batch

    emb = T(spark, sf, "embeddings")
    probes = list(_EVAL_PROBES)
    labels = emb.select("vec_id", "label")
    plabels = F.broadcast(
        emb.filter(F.col("vec_id").isin(probes)).select(
            F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
        )
    )
    frr = (
        brute_force_topk_batch(emb, probes, k=10)
        .join(labels, "vec_id")
        .join(plabels, "probe_id")
        .groupBy("probe_id")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("label") == F.col("plabel"), F.col("rk"))),
                F.lit(0),
            ).alias("first_rk")
        )
    )
    return frr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("first_rk") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hit"),
        F.sum(
            F.when(
                F.col("first_rk") > 0, F.expr("2520 div first_rk")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("mrr_x2520"),
    )


@q(
    "q_eval_kmv_error",
    f"""
    WITH d AS (SELECT DISTINCT event_type, {_sk.kmv_hash_sql('user_id')} AS h
               FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
          FROM d),
    per AS (SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS exact_n,
                   CAST(COUNT(*) FILTER (WHERE rn <= {_sk.DEFAULT_K}) AS BIGINT) AS m,
                   MAX(h) FILTER (WHERE rn <= {_sk.DEFAULT_K}) AS theta
            FROM r GROUP BY event_type),
    est AS (SELECT event_type, exact_n,
                   {_sk.kmv_estimate_long_sql('m', 'theta', _sk.DEFAULT_K)} AS kmv_n
            FROM per)
    SELECT event_type, exact_n, kmv_n,
           kmv_n - exact_n AS err,
           CAST(ABS(kmv_n - exact_n) * 10000 // exact_n AS BIGINT)
               AS abs_err_bp
    FROM est
    """,
)
def q_eval_kmv_error(spark, sf):
    # The third leg of the evaluation pack (ANN recall, ranking metrics,
    # and now SKETCH ACCURACY): per-group KMV distinct estimates audited
    # against the exact distinct count — the measurement that justifies
    # replacing exact distincts with sketches at scale ("k=64 costs this
    # many basis points of error on THIS data"). One distinct shuffle on
    # (group, hash) feeds BOTH sides: the exact count is the group's
    # distinct-hash count, the sketch is the same relation's k-smallest
    # window prefix — no second scan, and the error columns are pure
    # integers (signed err + basis points via floor div).
    #
    # Scale: the audit is exact-side bound (a full distinct), so it runs
    # on samples/slices in production while the sketch runs everywhere —
    # same plan, narrower filter. The estimator and this audit share
    # functions/sketch.py, so a k retune re-validates automatically.
    from pyspark.sql import Window as W

    k = _sk.DEFAULT_K
    w = W.partitionBy("event_type").orderBy("h")
    d = (
        T(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", _sk.kmv_hash(F.col("user_id")).alias("h"))
        .distinct()
    )
    r = d.withColumn("rn", F.row_number().over(w))
    infull = F.col("rn") <= k
    per = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n"),
        F.count(F.when(infull, 1)).cast("bigint").alias("m"),
        F.max(F.when(infull, F.col("h"))).alias("theta"),
    )
    est = per.select(
        "event_type",
        "exact_n",
        _sk.kmv_estimate_long(F.col("m"), F.col("theta"), k).alias("kmv_n"),
    )
    return est.select(
        "event_type",
        "exact_n",
        "kmv_n",
        (F.col("kmv_n") - F.col("exact_n")).alias("err"),
        F.expr("div(abs(kmv_n - exact_n) * 10000, exact_n)")
        .cast("bigint")
        .alias("abs_err_bp"),
    )


# --------------------------------------------------- PR curve (deciles) ----
@q(
    "q_eval_pr_curve",
    """
    WITH e AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS s,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    c AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM e GROUP BY s),
    r AS (SELECT *, 2 * CAST(COALESCE(SUM(cnt) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              + cnt + 1 AS rs2
          FROM c),
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                 CAST(SUM(pos) AS BIGINT) AS total_pos FROM c),
    d AS (SELECT CAST(((rs2 - 1) * 5) // n AS BIGINT) AS decile,
                 pos, cnt - pos AS neg
          FROM r CROSS JOIN n),
    g AS (SELECT decile, CAST(SUM(pos) AS BIGINT) AS pos,
                 CAST(SUM(neg) AS BIGINT) AS neg
          FROM d GROUP BY decile),
    cum AS (SELECT decile,
                   CAST(SUM(pos) OVER (ORDER BY decile DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS tp,
                   CAST(SUM(neg) OVER (ORDER BY decile DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS fp
            FROM g)
    SELECT decile, tp, fp, (total_pos - tp) AS fn,
           CAST((tp * 10000) // (tp + fp) AS BIGINT) AS precision_x10000,
           CAST((tp * 10000) // total_pos AS BIGINT) AS recall_x10000
    FROM cum CROSS JOIN n ORDER BY decile
    """,
)
def q_eval_pr_curve(spark, sf):
    # precision/recall curve for a score (value) against a binary label
    # (click vs view), thresholded at the score's own DECILES — the
    # model-eval table (threshold sweep → confusion counts → P/R) that
    # complements q_eval_ranking's AP and the Mann-Whitney U (which IS
    # the AUC numerator on this same contrast). Deciles come from exact
    # doubled midranks (operators/ranks.doubled_midranks — the two-level
    # distributed rank, no corpus sort), so tied scores always land in
    # ONE decile on both engines; confusion counts are cumulative sums
    # over the 10-row decile census, and P/R are exact ×10⁴ floor-div.
    #
    # Scale: two aggregations over the scored stream (the score census
    # with label sums + the rank census inside the operator), everything
    # after is ≤10-row census math. No per-threshold rescans — one pass
    # yields the whole curve.
    from mongo_to_parquet_spark.operators.ranks import doubled_midranks

    e = T(spark, sf, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("s"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("y"),
    )
    c = e.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    ranked = c.join(doubled_midranks(e, "s"), "s")
    n = c.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("total_pos"),
    )
    d = ranked.crossJoin(n).select(
        F.expr("((rs2 - 1) * 5) div n").cast("bigint").alias("decile"),
        "pos",
        (F.col("cnt") - F.col("pos")).alias("neg"),
    )
    g = d.groupBy("decile").agg(
        F.sum("pos").cast("bigint").alias("pos"),
        F.sum("neg").cast("bigint").alias("neg"),
    )
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.select(
        "decile",
        F.sum("pos").over(w).cast("bigint").alias("tp"),
        F.sum("neg").over(w).cast("bigint").alias("fp"),
    )
    return (
        cum.crossJoin(n)
        .select(
            "decile",
            "tp",
            "fp",
            (F.col("total_pos") - F.col("tp")).cast("bigint").alias("fn"),
            F.expr("(tp * 10000) div (tp + fp)").cast("bigint").alias("precision_x10000"),
            F.expr("(tp * 10000) div total_pos").cast("bigint").alias("recall_x10000"),
        )
        .orderBy("decile")
    )


# ----------------------------------------------------------- exact AUC -----
@q(
    "q_eval_auc",
    """
    WITH e AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS s,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    c AS (SELECT s, CAST(SUM(y) AS BIGINT) AS pos,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM e GROUP BY s),
    r AS (SELECT *, CAST(COALESCE(SUM(cnt) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS cum_prev
          FROM c),
    a AS (SELECT CAST(SUM(pos) AS BIGINT) AS n1,
                 CAST(SUM(neg) AS BIGINT) AS n2,
                 CAST(SUM(pos * (2 * cum_prev + cnt + 1)) AS BIGINT) AS r1x2
          FROM r)
    SELECT n1, n2,
           (r1x2 - n1 * (n1 + 1)) AS u_x2,
           CAST(((r1x2 - n1 * (n1 + 1)) * 10000) // (2 * n1 * n2) AS BIGINT)
               AS auc_x10000
    FROM a
    """,
)
def q_eval_auc(spark, sf):
    # exact ROC-AUC of the score for the click-vs-view label via the
    # rank identity AUC = U / (n1*n2) — the Mann-Whitney U statistic IS
    # the AUC numerator (ties counted half, which the doubled-midrank
    # formulation gets exactly). No threshold sweep, no curve
    # integration error: one census ranking gives the scalar that
    # q_eval_pr_curve's 10-point table approximates by trapezoids.
    # All-integer until the final ×10⁴ floor division.
    #
    # Scale: identical shape to q_stats_mannwhitney — one partial-agg
    # shuffle, a value-census window, a 1-row reduce.
    e = T(spark, sf, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("s"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("y"),
    )
    c = e.groupBy("s").agg(
        F.sum("y").cast("bigint").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("neg"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = c.withColumn(
        "cum_prev", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint")
    )
    a = r.agg(
        F.sum("pos").cast("bigint").alias("n1"),
        F.sum("neg").cast("bigint").alias("n2"),
        F.sum(F.col("pos") * (2 * F.col("cum_prev") + F.col("cnt") + 1))
        .cast("bigint")
        .alias("r1x2"),
    )
    ux2 = F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)
    return a.select(
        "n1",
        "n2",
        ux2.alias("u_x2"),
        F.expr(
            "((r1x2 - n1 * (n1 + 1)) * 10000) div (2 * n1 * n2)"
        ).cast("bigint").alias("auc_x10000"),
    )


#: bench scaffolding, not serving work: a real serving layer RECEIVES the
#: probe vector with the request — fetching vec 0 from the corpus each rep
#: (a filter-pushdown job) priced the harness, not the serve. Memoized per
#: corpus dir.
_SERVE_PROBE_CACHE: dict[str, list[float]] = {}


def _serve_probe_vec(emb, sf: str) -> list[float]:
    pv = _SERVE_PROBE_CACHE.get(sf)
    if pv is None:
        pv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0)
            .select("embedding")
            .head()[0]
        ]
        _SERVE_PROBE_CACHE[sf] = pv
    return pv


def q_sim_topk_ivfpq_serve(spark, sf):
    # bench-only (BENCH_ONLY below): the SERVE path of the IVF×PQ layout
    # in isolation — build once (first call materializes the layout, the
    # declared q_sim_topk_ivfpq rebuilds every run for oracle safety),
    # then each timed rep is what production pays per query: centroid
    # read → partition-pruned code scan → broadcast integer ADC. This is
    # the latency number an ANN serving layer is judged on; the declared
    # key's time is build+write+serve.
    import os

    from mongo_to_parquet_spark.operators.similarity import (
        build_ivfpq_layout,
        ivfpq_topk_from_layout,
    )

    emb = T(spark, sf, "embeddings")
    tag = os.path.basename(sf.rstrip("/")).replace(".", "_")
    layout = os.path.abspath(
        os.path.join(
            os.path.dirname(__file__), "..", "..", "_scratch", "ivfpq_serve", tag
        )
    )
    # the session writes no _SUCCESS markers; "layout exists" = the last
    # artifact build_ivfpq_layout writes (rng/) has parquet files in it
    rng_dir = os.path.join(layout, "rng")
    if not (
        os.path.isdir(rng_dir)
        and any(f.endswith(".parquet") for f in os.listdir(rng_dir))
    ):
        build_ivfpq_layout(emb, layout)
    pv = _serve_probe_vec(emb, sf)
    return ivfpq_topk_from_layout(spark, layout, pv, k=10, n_probe=4, exclude_id=0)


def q_sim_topk_ivfpq_refine_serve(spark, sf):
    # bench-only: the TWO-STAGE serve path in isolation (reuses the same
    # cached layout as q_sim_topk_ivfpq_serve) — what production pays per
    # refined query: ADC shortlist + 50-vector IN-pushdown exact re-rank.
    # The delta over q_sim_topk_ivfpq_serve IS the published price of the
    # recall jump (30→80% at sf0.01).
    import os

    from mongo_to_parquet_spark.operators.similarity import (
        build_ivfpq_layout,
        ivfpq_topk_refined_from_layout,
    )

    emb = T(spark, sf, "embeddings")
    tag = os.path.basename(sf.rstrip("/")).replace(".", "_")
    layout = os.path.abspath(
        os.path.join(
            os.path.dirname(__file__), "..", "..", "_scratch", "ivfpq_serve", tag
        )
    )
    rng_dir = os.path.join(layout, "rng")
    if not (
        os.path.isdir(rng_dir)
        and any(f.endswith(".parquet") for f in os.listdir(rng_dir))
    ):
        build_ivfpq_layout(emb, layout)
    pv = _serve_probe_vec(emb, sf)
    return ivfpq_topk_refined_from_layout(
        spark, layout, emb, pv, k=10, shortlist=50, n_probe=4, exclude_id=0
    )


BENCH_ONLY = {
    "q_sim_topk_ivfpq_serve": q_sim_topk_ivfpq_serve,
    "q_sim_topk_ivfpq_refine_serve": q_sim_topk_ivfpq_refine_serve,
}


# ---------------------------------------------------------- phrase search --
#: the fixed 2-term phrase (adjacent tokens, in order) — present in the
#: fixtures (~7% of docs at sf0.01) so hits are non-trivial
_PHRASE = ("spark", "join")


@q(
    "q_phrase_search",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ),
    t1 AS (SELECT doc_id, pos FROM toks WHERE tok = '{_PHRASE[0]}'),
    t2 AS (SELECT doc_id, pos FROM toks WHERE tok = '{_PHRASE[1]}')
    SELECT t1.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(t1.pos) AS BIGINT) AS first_pos
    FROM t1 JOIN t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    GROUP BY t1.doc_id
    """,
)
def q_phrase_search(spark, sf):
    # exact phrase query over a POSITIONAL index — the retrieval feature
    # the bag-of-words inverted index (q_inverted_index) cannot answer:
    # docs where the phrase's tokens are ADJACENT in order, with hit count
    # and first position (1-based). Each term's posting list is filtered
    # at the scan, then a self-equi-join on (doc_id, pos+1) finds
    # adjacency — the classic positional-index merge, as a join.
    #
    # Scale: the term filters reach the scan, so only the two posting
    # lists (corpus-frequency-sized, not corpus-sized) are ever
    # materialized; the adjacency join keys on (doc_id, pos) — exactly
    # what a positional index shards by. N-term phrases chain N-1 of
    # these joins, each narrowing the candidate set.
    d = T(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    t1 = toks.filter(F.col("tok") == _PHRASE[0]).select("doc_id", "pos")
    t2 = toks.filter(F.col("tok") == _PHRASE[1]).select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("pos2")
    )
    return (
        t1.join(
            t2,
            (t1.doc_id == t2.doc_id2) & (t2.pos2 == t1.pos + 1),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
    )


# ------------------------------------------------ ANN n_probe tuning curve -
#: n_probe sweep points (of _ANN_TUNE_CELLS cells) and the probe-sample
#: size — the content-addressed KMV-style pick (lowest md5 prefixes), so
#: both engines evaluate the IDENTICAL probe set at any corpus size
_ANN_TUNE_PS = (1, 2, 4, 8)
_ANN_TUNE_CELLS = 16
_ANN_TUNE_NPROBES = 16
#: assignment multiplicities swept (1 = classic IVF, 2 = soft/multi
#: assignment — every vector indexed in its 2 nearest cells)
_ANN_TUNE_OVERLAPS = (1, 2)


def _ann_tuning_sql() -> str:
    ps = ", ".join(str(p) for p in _ANN_TUNE_PS)
    ovs = ", ".join(str(o) for o in _ANN_TUNE_OVERLAPS)
    max_p = max(_ANN_TUNE_PS)
    max_ov = max(_ANN_TUNE_OVERLAPS)
    return f"""
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding AS cvec
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_ANN_TUNE_CELLS})
    ),
    assigned AS (
        SELECT vec_id, embedding, cell, CAST(rk AS BIGINT) AS ark FROM (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(c.cvec AS DOUBLE[])) DESC,
                                c.cell ASC) AS rk
            FROM embeddings e CROSS JOIN cents c)
        WHERE rk <= {max_ov}
    ),
    probes AS (
        SELECT probe_id, pv FROM (
            SELECT vec_id AS probe_id, embedding AS pv,
                   row_number() OVER (
                       ORDER BY substr(md5(concat('annt:',
                                        CAST(vec_id AS VARCHAR))), 1, 12) ASC,
                                vec_id ASC) AS prk
            FROM embeddings)
        WHERE prk <= {_ANN_TUNE_NPROBES}
    ),
    cellrk AS (
        SELECT probe_id, cell, crk FROM (
            SELECT p.probe_id, c.cell,
                   row_number() OVER (PARTITION BY p.probe_id
                       ORDER BY list_dot_product(CAST(c.cvec AS DOUBLE[]),
                                                 CAST(p.pv AS DOUBLE[])) DESC,
                                c.cell ASC) AS crk
            FROM cents c CROSS JOIN probes p)
        WHERE crk <= {max_p}
    ),
    scored AS MATERIALIZED (
        SELECT cl.probe_id, a.vec_id, cl.crk, a.ark,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(p.pv AS DOUBLE[])), 4) AS sim
        FROM assigned a JOIN cellrk cl USING (cell)
             JOIN probes p ON p.probe_id = cl.probe_id
        WHERE a.vec_id <> cl.probe_id
    ),
    ps AS (SELECT CAST(unnest([{ps}]) AS BIGINT) AS n_probe),
    ov AS (SELECT CAST(unnest([{ovs}]) AS BIGINT) AS overlap),
    sl AS MATERIALIZED (
        SELECT ov.overlap, ps.n_probe, s.probe_id, s.vec_id, s.sim
        FROM scored s JOIN ps ON s.crk <= ps.n_probe
             JOIN ov ON s.ark <= ov.overlap
    ),
    cand AS (
        SELECT overlap, n_probe, CAST(COUNT(*) AS BIGINT) AS n_cand
        FROM sl GROUP BY overlap, n_probe
    ),
    approx AS (
        SELECT overlap, n_probe, probe_id, vec_id FROM (
            SELECT overlap, n_probe, probe_id, vec_id,
                   row_number() OVER (PARTITION BY overlap, n_probe, probe_id
                       ORDER BY sim DESC, vec_id ASC) AS rk
            FROM (SELECT DISTINCT overlap, n_probe, probe_id, vec_id, sim
                  FROM sl))
        WHERE rk <= 10
    ),
    exact AS (
        SELECT probe_id, vec_id FROM (
            SELECT p.probe_id, e.vec_id,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(p.pv AS DOUBLE[])), 4) DESC,
                       e.vec_id ASC) AS rk
            FROM embeddings e CROSS JOIN probes p
            WHERE e.vec_id <> p.probe_id)
        WHERE rk <= 10
    )
    SELECT ov.overlap, ps.n_probe,
           CAST(COUNT(a.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(a.vec_id) * 10000 // COUNT(*) AS BIGINT) AS recall_bp,
           CAST(COALESCE(MAX(c.n_cand), 0) AS BIGINT) AS n_cand
    FROM ov
    CROSS JOIN ps
    CROSS JOIN exact e
    LEFT JOIN approx a
      ON a.overlap = ov.overlap AND a.n_probe = ps.n_probe
         AND a.probe_id = e.probe_id AND a.vec_id = e.vec_id
    LEFT JOIN cand c
      ON c.overlap = ov.overlap AND c.n_probe = ps.n_probe
    GROUP BY ov.overlap, ps.n_probe
    """


@q("q_ann_tuning", _ann_tuning_sql())
def q_ann_tuning(spark, sf):
    # the ANN N_PROBE × OVERLAP TUNING SURFACE (round-8 verdict #4 +
    # round-9 verdict #3): measured recall@10 AND candidate-scan volume
    # per (overlap, n_probe) over one sweep, so BOTH knobs a 100 TB
    # serving operator turns — how many cells to probe, and whether to
    # index each vector in its 2 nearest cells (soft/multi-assignment,
    # the standard cheap recall lever) — are set from a measured
    # recall/cost trade instead of taken on faith. Measured on the
    # fixture: at MATCHED candidate volume, overlap=2 @ n_probe=p beats
    # overlap=1 @ n_probe=2p (e.g. 71.9% vs 68.8% recall at ~3950
    # candidates), and overlap=2 reaches 90.6% at n_probe=8 where
    # single assignment tops out at 68.8% (sf0.01; pinned ≥ in tests —
    # the fixture's embeddings are near-random, the unfavorable geometry
    # for IVF, so production clustered corpora sit above this floor).
    # n_cand counts layout ROWS scanned (multi-assigned copies included
    # — the serve's true read volume); ranking dedups candidates first.
    # Probes are a CONTENT-ADDRESSED sample — the 16
    # vec_ids with the lowest md5('annt:'||id) prefixes (KMV-style
    # bottom-k: bounded at ANY corpus size, and a pure function of the
    # ids, so both engines evaluate the identical probe set — the
    # q_lsh_tuning sampling rule). Every output is integer-exact: hits,
    # recall in basis points (floor), and n_cand = Σ probed-cell sizes,
    # the exact number of (probe, vector) scores the serve would
    # compute. Monotonicity (recall and n_cand non-decreasing in
    # n_probe) is pinned in tests.
    #
    # Scale: the corpus-sized work is ONE cell assignment + ONE scoring
    # pass shared by every curve point (the n_probe sweep re-slices the
    # same scored candidates by the cell rank crk — no per-point
    # rescans); ground truth is the batch brute-force (one scan for all
    # probes, WindowGroupLimit top-k). The probe sample is a bounded
    # driver pick by construction. At 100 TB this runs over the same
    # IVF layout the serve uses; n_cand is then exactly the rows the
    # pruned `cell=` scans would read.
    from mongo_to_parquet_spark.operators.similarity import (
        _assign_cells,
        _centroids,
        brute_force_topk_batch,
        dot,
    )

    emb = T(spark, sf, "embeddings")
    max_p = max(_ANN_TUNE_PS)
    probe_rows = (
        emb.select(
            "vec_id",
            F.substring(
                F.md5(F.concat(F.lit("annt:"), F.col("vec_id").cast("string"))),
                1,
                12,
            ).alias("hp"),
        )
        .orderBy(F.col("hp").asc(), F.col("vec_id").asc())
        .limit(_ANN_TUNE_NPROBES)
        .collect()
    )
    probe_ids = [r["vec_id"] for r in probe_rows]
    cents = F.broadcast(_centroids(emb, _ANN_TUNE_CELLS, "vec_id", "embedding"))
    assigned = _assign_cells(
        emb, cents, "vec_id", "embedding", overlap=max(_ANN_TUNE_OVERLAPS)
    )
    probes = F.broadcast(
        emb.filter(F.col("vec_id").isin(probe_ids)).select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
        )
    )
    cw = Window.partitionBy("probe_id").orderBy(
        F.col("pscore").desc(), F.col("cell").asc()
    )
    cellrk = (
        cents.crossJoin(probes)
        .withColumn("pscore", dot(F.col("cvec"), F.col("pv")))
        .withColumn("crk", F.row_number().over(cw).cast("long"))
        .filter(F.col("crk") <= max_p)
        .select("probe_id", "cell", "crk")
    )
    from mongo_to_parquet_spark.functions.vector import cosine

    scored = (
        assigned.join(F.broadcast(cellrk), "cell")
        .join(probes, "probe_id")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "crk",
            "ark",
            F.round(cosine(F.col("embedding"), F.col("pv")), 4).alias("sim"),
        )
    )
    ps = spark.createDataFrame(
        [(p,) for p in _ANN_TUNE_PS], "n_probe bigint"
    )
    ov = spark.createDataFrame(
        [(o,) for o in _ANN_TUNE_OVERLAPS], "overlap bigint"
    )
    sliced = scored.join(
        F.broadcast(ps), F.col("crk") <= F.col("n_probe")
    ).join(F.broadcast(ov), F.col("ark") <= F.col("overlap"))
    # n_cand counts the ROWS a multi-assigned layout scan reads (dup
    # copies included — that is the serve's real candidate volume);
    # ranking dedups first: a vector reached via two probed cells is one
    # candidate with one (identical) score
    cand = sliced.groupBy("overlap", "n_probe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand")
    )
    w = Window.partitionBy("overlap", "n_probe", "probe_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    approx = (
        sliced.select("overlap", "n_probe", "probe_id", "vec_id", "sim")
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            F.col("overlap").alias("a_ov"),
            F.col("n_probe").alias("a_np"),
            F.col("probe_id").alias("a_pid"),
            F.col("vec_id").alias("a_vid"),
        )
    )
    exact = brute_force_topk_batch(emb, probe_ids, k=10).select(
        "probe_id", "vec_id"
    )
    # broadcast the sweep tables: a plain crossJoin of two tiny
    # non-broadcast sides plans a CartesianProduct, which the plan gate
    # bans everywhere (tests/test_plans.py) — BNLJ with the literal
    # sweep as build side is the right shape at any scale
    j = (
        exact.crossJoin(F.broadcast(ps))
        .crossJoin(F.broadcast(ov))
        .join(
            F.broadcast(approx),
            (F.col("overlap") == F.col("a_ov"))
            & (F.col("n_probe") == F.col("a_np"))
            & (F.col("probe_id") == F.col("a_pid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
    )
    return (
        j.groupBy("overlap", "n_probe")
        .agg(
            F.count("a_vid").cast("bigint").alias("hits"),
            F.expr("CAST(count(a_vid) * 10000 DIV count(*) AS BIGINT)").alias(
                "recall_bp"
            ),
        )
        # LEFT join + 0 default: a curve point whose probed cells hold NO
        # candidates (tiny corpus, every probe alone in its cell) must
        # report n_cand=0/hits=0, not silently vanish from the curve
        # (found by the tiny-corpus adversarial pin)
        .join(F.broadcast(cand), ["overlap", "n_probe"], "left")
        .select(
            "overlap",
            "n_probe",
            "hits",
            "recall_bp",
            F.coalesce(F.col("n_cand"), F.lit(0)).cast("bigint").alias("n_cand"),
        )
    )


# --------------------------------------------- ANN layout drift gate -------
#: drift-probe knobs: n_probe/cells match the serving defaults; the
#: rebuild threshold is 5pp of recall@10 — the point where probing one
#: more cell (the cheap runtime fix) stops compensating for a stale
#: coarse quantizer (the expensive offline fix)
_DRIFT_NP = 4
_DRIFT_CELLS = 16
_DRIFT_PROBES = 16
_DRIFT_THRESH_BP = 500
#: the fixture's incremental convention: the "build" corpus is the slice
#: vec_id % _DRIFT_BASE_MOD != 0 (shared with the engine leg below)
_DRIFT_BASE_MOD = 4

# one definition feeds BOTH engines (the _ann_tuning_sql() pattern):
# every knob below interpolates from the _DRIFT_* constants so editing a
# constant cannot silently desynchronize the oracle from the engine.
_ANN_DRIFT_SQL = f"""
    WITH bse AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % {_DRIFT_BASE_MOD} <> 0
    ),
    cents AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding AS cvec
        FROM (SELECT * FROM bse ORDER BY vec_id LIMIT {_DRIFT_CELLS})
    ),
    corp AS MATERIALIZED (
        SELECT 'build' AS leg, vec_id, embedding FROM bse
        UNION ALL
        SELECT 'now' AS leg, vec_id, embedding FROM embeddings
    ),
    probes AS MATERIALIZED (
        SELECT leg, probe_id, pv FROM (
            SELECT leg, vec_id AS probe_id, embedding AS pv,
                   row_number() OVER (PARTITION BY leg
                       ORDER BY substr(md5(concat('annd:',
                                        CAST(vec_id AS VARCHAR))), 1, 12) ASC,
                                vec_id ASC) AS prk
            FROM corp)
        WHERE prk <= {_DRIFT_PROBES}
    ),
    assigned AS MATERIALIZED (
        SELECT leg, vec_id, embedding, cell FROM (
            SELECT x.leg, x.vec_id, x.embedding, c.cell,
                   row_number() OVER (PARTITION BY x.leg, x.vec_id
                       ORDER BY list_dot_product(CAST(x.embedding AS DOUBLE[]),
                                                 CAST(c.cvec AS DOUBLE[])) DESC,
                                c.cell ASC) AS rk
            FROM corp x CROSS JOIN cents c)
        WHERE rk = 1
    ),
    cellrk AS MATERIALIZED (
        SELECT leg, probe_id, cell FROM (
            SELECT p.leg, p.probe_id, c.cell,
                   row_number() OVER (PARTITION BY p.leg, p.probe_id
                       ORDER BY list_dot_product(CAST(c.cvec AS DOUBLE[]),
                                                 CAST(p.pv AS DOUBLE[])) DESC,
                                c.cell ASC) AS crk
            FROM cents c CROSS JOIN probes p)
        WHERE crk <= {_DRIFT_NP}
    ),
    approx AS (
        SELECT leg, probe_id, vec_id FROM (
            SELECT cl.leg, cl.probe_id, a.vec_id,
                   row_number() OVER (PARTITION BY cl.leg, cl.probe_id
                       ORDER BY ROUND(list_cosine_similarity(
                                    CAST(a.embedding AS DOUBLE[]),
                                    CAST(p.pv AS DOUBLE[])), 4) DESC,
                                a.vec_id ASC) AS rk
            FROM assigned a
            JOIN cellrk cl ON cl.leg = a.leg AND cl.cell = a.cell
            JOIN probes p ON p.leg = cl.leg AND p.probe_id = cl.probe_id
            WHERE a.vec_id <> cl.probe_id)
        WHERE rk <= 10
    ),
    exact AS (
        SELECT leg, probe_id, vec_id FROM (
            SELECT x.leg, p.probe_id, x.vec_id,
                   row_number() OVER (PARTITION BY x.leg, p.probe_id
                       ORDER BY ROUND(list_cosine_similarity(
                                    CAST(x.embedding AS DOUBLE[]),
                                    CAST(p.pv AS DOUBLE[])), 4) DESC,
                                x.vec_id ASC) AS rk
            FROM corp x JOIN probes p ON p.leg = x.leg
            WHERE x.vec_id <> p.probe_id)
        WHERE rk <= 10
    ),
    m AS (
        SELECT e.leg,
               COUNT(a.vec_id) AS hits,
               COUNT(*) AS tot
        FROM exact e LEFT JOIN approx a
          ON a.leg = e.leg AND a.probe_id = e.probe_id AND a.vec_id = e.vec_id
        GROUP BY e.leg
    )
    SELECT CAST({_DRIFT_NP} AS BIGINT) AS n_probe,
           CAST(b.hits * 10000 // b.tot AS BIGINT) AS recall_build_bp,
           CAST(n.hits * 10000 // n.tot AS BIGINT) AS recall_now_bp,
           CAST(b.hits * 10000 // b.tot
                - n.hits * 10000 // n.tot AS BIGINT) AS drift_bp,
           (b.hits * 10000 // b.tot - n.hits * 10000 // n.tot)
               > {_DRIFT_THRESH_BP} AS rebuild
    FROM m b, m n WHERE b.leg = 'build' AND n.leg = 'now'
"""


@q("q_ann_drift", _ANN_DRIFT_SQL)
def q_ann_drift(spark, sf):
    # ANN LAYOUT STALENESS / DRIFT REPORT (round-9 verdict item 4 — the
    # tokenizer store's staleness discipline applied to layouts): a
    # layout built on yesterday's corpus serves today's appends through
    # FROZEN quantizers (ivf_append / ivfpq_append), and nothing used to
    # measure when quantizer drift had eaten recall. This key is that
    # monitor, oracle-exact end to end: centroids seed from the BASE
    # slice (vec_id % 4 != 0 — the fixture's incremental convention, i.e.
    # the corpus the layout was built on), then recall@10 at the serving
    # operating point (n_probe=4 of 16 cells) is measured twice with the
    # SAME machinery — on the base corpus with base-sampled probes (the
    # build-time recall a builder records into the layout marker) and on
    # the CURRENT corpus with current-sampled probes (what the serve
    # delivers today). One row: both recalls, the signed drift, and the
    # rebuild flag (drift > 5pp). Probes are content-addressed KMV
    # bottom-16 per leg; every output is integer basis points.
    #
    # Scale: each leg is ONE map-only cell assignment + ONE scored
    # candidate pass + ONE brute-force ground-truth scan over the
    # monitored SAMPLE - run it over a bounded uniform sample of the
    # corpus (q_sample_uniform's content-addressed draw), not all of
    # 100 TB: drift is a distribution property, a 100k-vector sample
    # pins it to well under the 5pp threshold. The quantizer stays a
    # broadcast table; nothing here rescans the layout itself.
    # layout_current (operators/similarity.py) is the config half of the
    # same gate: marker mismatch refuses BEFORE serving; this key is the
    # statistical half that catches same-config-but-drifted-data.
    from mongo_to_parquet_spark.operators.similarity import (
        _centroids,
        recall_leg,
    )

    emb = T(spark, sf, "embeddings")
    bse = emb.filter(F.col("vec_id") % _DRIFT_BASE_MOD != 0)
    cents = F.broadcast(_centroids(bse, _DRIFT_CELLS, "vec_id", "embedding"))

    # both legs through the SHARED monitor machinery (recall_leg — also
    # what maintain_ivf_layout's rebuild loop measures with)
    b = recall_leg(
        bse, cents, "recall_build_bp", n_probe=_DRIFT_NP, n_probes=_DRIFT_PROBES
    )
    n = recall_leg(
        emb, cents, "recall_now_bp", n_probe=_DRIFT_NP, n_probes=_DRIFT_PROBES
    )
    # two 1-row aggs composed broadcast-side — the q_profile split-plan
    # shape, never a CartesianProduct
    return (
        b.crossJoin(F.broadcast(n))
        .select(
            F.lit(_DRIFT_NP).cast("bigint").alias("n_probe"),
            "recall_build_bp",
            "recall_now_bp",
            (F.col("recall_build_bp") - F.col("recall_now_bp"))
            .cast("bigint")
            .alias("drift_bp"),
            (
                F.col("recall_build_bp") - F.col("recall_now_bp")
                > _DRIFT_THRESH_BP
            ).alias("rebuild"),
        )
    )


# --------------------------------- pseudo-relevance feedback (RM3-style) ---
#: feedback depth, expansion width, and integer query-term weights
_RM3_FB_DOCS = 10
_RM3_EXP_TERMS = 5
_RM3_W_ORIG, _RM3_W_EXP = 2, 1


@q(
    "q_bm25_rm3",
    _BM25_CTES
    + f"""
    , fb AS (
        SELECT doc_id FROM bm25
        ORDER BY score DESC, doc_id ASC LIMIT {_RM3_FB_DOCS}
    ),
    exp AS (
        SELECT tok, {_RM3_W_EXP} AS w FROM (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks JOIN fb USING (doc_id)
            WHERE tok NOT IN {_BM25_TERMS!r}
            GROUP BY tok
            ORDER BY c DESC, tok ASC LIMIT {_RM3_EXP_TERMS})
    ),
    terms AS (
        SELECT unnest({list(_BM25_TERMS)!r}) AS tok, {_RM3_W_ORIG} AS w
        UNION ALL SELECT tok, w FROM exp
    ),
    tf2 AS (
        SELECT doc_id, t.tok, t.w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks JOIN terms t USING (tok)
        GROUP BY doc_id, t.tok, t.w
    ),
    df2 AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf2 GROUP BY tok),
    scored2 AS (
        SELECT tf2.doc_id,
               CAST(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * ({_BM25_K1} + 1.0))
                   / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
                   * w
               AS DECIMAL(38, 18)) AS s
        FROM tf2 JOIN df2 USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
    )
    SELECT doc_id, ROUND(CAST(SUM(s) AS DOUBLE), 4) AS score
    FROM scored2 GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
)
def q_bm25_rm3(spark, sf):
    # PSEUDO-RELEVANCE-FEEDBACK query expansion (the RM3 family —
    # Lavrenko & Croft relevance models as deployed in Anserini/Lucene):
    # run BM25 for the base query, take the top-{_RM3_FB_DOCS} docs as
    # feedback, mine their {_RM3_EXP_TERMS} most frequent non-query
    # terms, and re-rank the corpus with the EXPANDED weighted query
    # (original terms weight {_RM3_W_ORIG}, expansion {_RM3_W_EXP}) —
    # the standard recall-recovery move when the base query is short.
    # Determinism discipline: the feedback cut orders by the ROUNDED
    # score with a doc_id tiebreak (the only float in the selection path
    # is q_bm25's own bit-identical expression), expansion terms are
    # picked by integer (count desc, tok) and the per-term weight is an
    # integer multiplying the SAME scoring expression tree, so both
    # engines expand to the identical query and the re-rank hashes
    # exactly.
    #
    # Scale: stage 1 is q_bm25 (query-term-filtered scan + tiny aggs);
    # the feedback set is {_RM3_FB_DOCS} rows and term mining touches
    # only ITS tokens (semi-join-pruned scan); stage 2 is BM25 again
    # with ≤ {len(_BM25_TERMS)}+{_RM3_EXP_TERMS} terms riding as a
    # broadcast relation into the token scan. Two scans total — the
    # PRF trade every production system accepts — and no all-corpus
    # window anywhere.
    d = T(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    fb = (
        _bm25_scored(spark, sf)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RM3_FB_DOCS)
        .select("doc_id")
    )
    exp = (
        toks.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("tok").isin(*_BM25_TERMS))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(_RM3_EXP_TERMS)
        .select("tok", F.lit(_RM3_W_EXP).alias("w"))
    )
    orig = spark.createDataFrame(
        [(t, _RM3_W_ORIG) for t in _BM25_TERMS], "tok string, w int"
    )
    terms = orig.unionByName(exp)
    tf = (
        toks.join(F.broadcast(terms), "tok")
        .groupBy("doc_id", "tok", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    s = (
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * (F.col("tf") * (k1 + F.lit(1.0)))
        / (F.col("tf") + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl")))
        * F.col("w")
    ).cast("decimal(38,18)")
    return (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("s").cast("double"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )
