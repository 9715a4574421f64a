"""In-engine trained quality classifier: logistic regression by gradient
descent over hashed token features, ENTIRELY in fixed-point integer
arithmetic so a fixed iteration count is bit-identical cross-engine (the
PageRank/PCA discipline applied to model TRAINING — integer sums are
order-free, so no float-summation drift can leak into the weights).

This is the trained counterpart of the fastText/logreg quality gate every
published pretraining recipe runs (GPT-3's LR-over-hashed-ngrams filter,
LLaMA/RedPajama's classifier pass): curated-positive vs negative labels
derive from the corpus's own deterministic quality signals, features are
the hashing-trick token buckets (Weinberger et al.; q_feat_hashing's
md5-prefix identity), and the learned weights persist through the
versioned tokenizer store ("quality_lr" family) to serve at scan speed.

Determinism contract (the whole point of the fixed-point form):
- features x are ×S integers: x = (count·S) div n_tok, bias = S,
  length = (n_tok·S) div 100;
- the sigmoid is the ALGEBRAIC one, σ(m) = ½(1 + m/(1+|m|)), computed as
  σ_int = S div 2 + (m·S) div (2·(S+|m|)) — integer products and
  truncating division only, no exp() whose last ulp could differ across
  engines and compound over iterations;
- both engines truncate integer division toward zero (Spark `div` ≡
  DuckDB `//`, verified on negatives) and every reduction is an integer
  SUM — order-independent, hash-exact at any parallelism.

Scale: model state is D+2 scaled-integer weights — it rides the plan as
LITERALS (the kmeans-centroid driver-pick exception), so the margin pass
is map-side with NO join. Each iteration costs one features-scan margin
aggregation (doc_id-keyed, map-combined) plus one co-partitioned
features⋈residuals join and a D-row gradient aggregate; the features
relation is built once and cached. Serving is a single scan with the
weight array folded in — zero joins, zero Python — at 100 TB the gate
scores at scan speed exactly like the fixed-weight q_quality_model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed-point scale — every feature, weight, margin, sigmoid value and
#: residual is an integer multiple of 1/S
S = 1_000_000
#: hashed token buckets 0..D-1; bucket D is the bias, D+1 the length
D = 32
BIAS_B = D
LEN_B = D + 1
N_W = D + 2
#: fixed iteration count and integer learning-rate numerator
#: (update: w += (LR_NUM · g) div n_train). 16×16 calibrates the keep
#: threshold to 0.96 held-out accuracy on the fixtures (AUC is already
#: 1.0 by iteration 6 — the extra iterations move the DECISION BOUNDARY,
#: not the ranking); weight bound after 16 iterations is ~2.6e8, so
#: every product stays orders of magnitude inside int64
ITERS = 16
LR_NUM = 16
#: the hashing-trick salt (cross-engine md5-prefix identity)
SALT = "qlr:"


def _tdiv(a: int, n: int) -> int:
    """Integer division truncating toward zero (SQL div / DuckDB //
    semantics) — Python's // floors instead, which diverges on negative
    gradients."""
    q, r = divmod(a, n)
    if r != 0 and (a < 0) != (n < 0):
        q += 1
    return q


def doc_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, cm, n_tok, sum_len): the ONE-token-pass sufficient
    statistics every classifier consumer derives from — cm is the
    map<bucket, count> of hashed-token tf counts, n_tok = Σ counts,
    sum_len = Σ token lengths. Features, labels, training and serving
    all read this relation, so nothing in the classifier family pays a
    second corpus scan or a doc_id join (the old shape joined a
    (doc,b)-count aggregate against a separate n_tok aggregate — two
    token passes plus an SMJ, per consumer)."""
    from mongo_to_parquet_spark.operators.parallel import fan_out

    # fan_out before the explode: md5-per-token featurization is pure
    # compute, and the fixture's one-file documents scan plans ONE task
    # (guide §2 — no-op on an already-wide cluster scan)
    tok = fan_out(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    h = F.md5(F.concat(F.lit(SALT), F.col("tok")))
    byb = (
        tok.select(
            "doc_id",
            (F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") % D)
            .cast("int")
            .alias("b"),
            F.length("tok").alias("lt"),
        )
        .groupBy("doc_id", "b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("lt").cast("bigint").alias("sl"),
        )
    )
    return byb.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("cm"),
        F.sum("c").cast("bigint").alias("n_tok"),
        F.sum("sl").cast("bigint").alias("sum_len"),
    )


#: the dense fixed-point feature vector (array slot j = bucket j's x,
#: slot D = bias, slot D+1 = scaled length) as a SQL expression over
#: doc_stats columns. An absent bucket contributes x=0 — identical to
#: the sparse form where the (doc, b) row simply does not exist, since
#: every downstream term is (x * w) div S and (0 * w) div S = 0.
_XA_EXPR = (
    f"concat(transform(sequence(0, {D - 1}),"
    f" j -> (coalesce(element_at(cm, j), CAST(0 AS BIGINT)) * {S})"
    f" div n_tok),"
    f" array(CAST({S} AS BIGINT), (n_tok * {S}) div 100))"
)

#: label gate over doc_stats columns (n_tok >= 1 always: split('') is [''])
_Y_EXPR = (
    "CASE WHEN n_tok >= 40 AND (sum_len * 10) div n_tok BETWEEN 30 AND 60"
    " THEN 1 ELSE 0 END"
)


def doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, b, x): hashed-token tf buckets in fixed point, plus the
    bias and scaled-length dimensions. x sums to ~2S+len per doc.
    Derived from doc_stats (one token pass, no join); the sparse rows
    are the map entries exploded back out — bit-identical to the old
    two-pass union shape."""
    st = doc_stats(docs)
    hashed = st.select(
        "doc_id", F.explode("cm").alias("b", "c"), "n_tok"
    ).select("doc_id", "b", F.expr(f"(c * {S}) div n_tok").alias("x"))
    extra = st.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(BIAS_B).alias("b"), F.lit(S).cast("bigint").alias("x")
                ),
                F.struct(
                    F.lit(LEN_B).alias("b"),
                    F.expr(f"(n_tok * {S}) div 100").alias("x"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "e.b", "e.x")
    return hashed.unionByName(extra)


def doc_labels(docs: DataFrame) -> DataFrame:
    """(doc_id, y): curated-positive = passes the deterministic C4-ish
    gate (enough tokens, sane mean word length) — integer-exact on both
    engines: y = 1 iff n_tok >= 40 and 30 <= (Σ len(tok)·10) div n_tok
    <= 60."""
    return doc_stats(docs).select(
        "doc_id", F.expr(_Y_EXPR).cast("int").alias("y")
    )


def doc_dense(docs: DataFrame) -> DataFrame:
    """(doc_id, y, xa): ONE row per document — label + dense N_W-long
    fixed-point feature array, from the single doc_stats pass. This is
    the training relation: with features dense per row, every
    gradient-descent iteration is map-side arithmetic + one 34-column
    global aggregate — no per-iteration join, no doc-keyed shuffle."""
    return doc_stats(docs).select(
        "doc_id",
        F.expr(_Y_EXPR).cast("int").alias("y"),
        F.expr(_XA_EXPR).alias("xa"),
    )


def _sigmoid_int(mcol: str) -> F.Column:
    """σ_int(m) = S/2 + (m·S) div (2·(S+|m|)) ∈ [0, S]."""
    return F.expr(
        f"{S} div 2 + ({mcol} * {S}) div (2 * ({S} + abs({mcol})))"
    )


def _margin_expr(weights: list[int]) -> str:
    """Σ_j (xa[j] · w_j) div S over a dense xa column, with the weights
    folded in as literals and zero-weight terms constant-folded away
    ((x · 0) div S = 0 exactly). Pure codegen arithmetic — no join, no
    HOF, no per-row lookup table."""
    terms = [
        f"((xa[{j}] * CAST({int(wj)} AS BIGINT)) div {S})"
        for j, wj in enumerate(weights)
        if int(wj) != 0
    ]
    return " + ".join(terms) if terms else "CAST(0 AS BIGINT)"


def train_logreg(feats: DataFrame, labels: DataFrame) -> list[int]:
    """Fixed-point batch gradient descent, ITERS iterations; returns the
    N_W scaled-integer weights. ``feats``/``labels`` should already be
    restricted to the training split. Model state stays driver-side
    Python ints (exact, unbounded) and re-enters each iteration's plan as
    literals; the corpus-sized relation is scanned once per iteration.

    Sparse-input compatibility wrapper: densifies (doc_id, b, x) rows
    into the one-row-per-doc array relation and trains on that — the
    weights are bit-identical because absent buckets contribute
    (0 · w) div S = 0 to every sum the sparse form simply omitted."""
    dense = (
        feats.groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("b", "x"))).alias("fm")
        )
        .join(labels, "doc_id")
        .select(
            "doc_id",
            "y",
            F.expr(
                f"transform(sequence(0, {N_W - 1}),"
                f" j -> coalesce(element_at(fm, j), CAST(0 AS BIGINT)))"
            ).alias("xa"),
        )
    )
    return train_logreg_dense(dense)


def train_logreg_dense(dense: DataFrame) -> list[int]:
    """The training loop proper, over the dense (doc_id, y, xa)
    relation (doc_dense). Each iteration is ONE job: margin, residual
    and per-feature gradient terms are map-side expressions with the
    current weights as literals, reduced by a single 34-column
    partial-combined global aggregate. No join, no doc-keyed shuffle,
    no sort anywhere in the loop — the round-11 build had to pin the
    per-iteration features⋈residuals join's strategy against the
    lesson-47 broadcast→SMJ cliff; the dense form removes the join (and
    with it the strategy decision) outright, and shuffles D+2 longs per
    map partition per iteration instead of a doc-keyed relation."""
    from uuid import uuid4

    spark = dense.sparkSession
    dense = dense.persist()
    n_rows = dense.count()
    if n_rows == 0:
        dense.unpersist()
        raise ValueError("empty training split for quality_lr")
    # iteration-relation layout is DATA-derived, not a local[32]
    # constant: ~100k one-row-per-doc rows (≈30 MB of dense arrays) per
    # partition. At fixture scale that collapses the 32 near-empty
    # cached partitions (AQE's parallelismFirst floors post-shuffle
    # coalescing at the default parallelism) into 1, so each of the 16
    # iteration jobs schedules 2 tasks instead of 33; at corpus scale
    # the same rule leaves thousands of partitions.
    parts = max(1, min(dense.rdd.getNumPartitions(), 1 + n_rows // 100_000))
    it_rel = dense.coalesce(parts) if parts < dense.rdd.getNumPartitions() else dense
    view = f"qlr_dense_{uuid4().hex[:12]}"
    it_rel.createOrReplaceTempView(view)
    # AQE off for the loop only (restored in finally): every iteration's
    # shuffle is D+2 longs per map partition into a single final reduce —
    # there is nothing for AQE to re-optimize at ANY scale, and its
    # per-query stage re-planning is pure overhead on a 16-statement loop.
    # Session-global toggle: the engine contract is one statement at a
    # time per session — a concurrent statement on a shared session would
    # inherit the loop conf (round-11 advice; same guard as
    # _merge_loop_env/_loop_conf in queries/curation.py).
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # each iteration is ONE spark.sql() round-trip, and the statement
        # is kept SMALL: the margin is one zip_with/aggregate fold over
        # (xa, weight-array literal) and the gradient vector comes back as
        # 34 (j, g) rows from a posexplode + GROUP BY j — ~15 expression
        # nodes instead of the 34-column wide-aggregate form (~300 nodes),
        # whose per-iteration parse/analyze cost dominated the loop
        # (measured 5.3s vs 2.2s warm for the 16 iterations at sf0.1;
        # weights bit-identical — same div arithmetic, relocated). The
        # shuffle is unchanged: ≤ N_W partial sums per map partition.
        sig = f"{S} div 2 + (m * {S}) div (2 * ({S} + abs(m)))"
        w = [0] * N_W
        for _ in range(ITERS):
            arr = ", ".join(f"CAST({int(wi)} AS BIGINT)" for wi in w)
            rows = spark.sql(
                f"SELECT j, CAST(SUM((xj * r) div {S}) AS BIGINT) AS g FROM ("
                f"  SELECT posexplode(xa) AS (j, xj),"
                f"         CAST(y AS BIGINT) * {S} - ({sig}) AS r FROM ("
                f"    SELECT xa, y, aggregate(zip_with(xa, array({arr}),"
                f"      (a, b) -> (a * b) div {S}), CAST(0 AS BIGINT),"
                f"      (acc, t) -> acc + t) AS m FROM {view}))"
                f" GROUP BY j"
            ).collect()
            g = {r["j"]: int(r["g"] or 0) for r in rows}
            # Python // floors on negatives; SQL div truncates toward
            # zero — _tdiv keeps the driver-side update bit-identical to
            # the oracle's integer arithmetic
            w = [
                int(wi) + _tdiv(LR_NUM * g.get(j, 0), n_rows)
                for j, wi in enumerate(w)
            ]
        return w
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.catalog.dropTempView(view)
        dense.unpersist()


def score(feats: DataFrame, weights: list[int]) -> DataFrame:
    """(doc_id, score_scaled, keep): σ_int of the margin under the given
    weights, keep = score ≥ S/2. Map-side: weights are literals."""
    warr = F.array(*[F.lit(int(wi)).cast("bigint") for wi in weights])
    m = (
        feats.withColumn("w", F.element_at(warr, F.col("b") + 1))
        .select("doc_id", F.expr(f"(x * w) div {S}").alias("t"))
        .groupBy("doc_id")
        .agg(F.sum("t").cast("bigint").alias("m"))
    )
    return m.select(
        "doc_id",
        _sigmoid_int("m").cast("bigint").alias("score_scaled"),
        (_sigmoid_int("m") >= S // 2).alias("keep"),
    )


def score_docs(docs: DataFrame, weights: list[int]) -> DataFrame:
    """score() straight off the documents relation: one token pass into
    doc_stats, margin and sigmoid as map-side literal-weight arithmetic
    on the per-doc row — the serving path pays one explode + two chained
    aggregates and ZERO joins (the sparse route re-scanned the tokens
    for n_tok and shuffled ~N_W rows per doc into a second aggregate)."""
    m = doc_stats(docs).select(
        "doc_id", F.expr(_XA_EXPR).alias("xa")
    ).select("doc_id", F.expr(_margin_expr(weights)).alias("m"))
    return m.select(
        "doc_id",
        _sigmoid_int("m").cast("bigint").alias("score_scaled"),
        (_sigmoid_int("m") >= S // 2).alias("keep"),
    )
