"""Geospatial blocking-join pack.

Proximity joins are the spatial flavor of the repo's core scale pattern
(candidate generation by BLOCKING, then exact verification — the MinHash /
pHash / edit-distance discipline applied to coordinates): put every point
in a grid cell, equi-join probe cells against build cells in the 3x3
neighbor ring, verify with the exact distance, never all-pairs.

  q_geo_grid_knn     3 nearest suppliers per customer within the ring
  q_geo_radius_semi  customers with any supplier within radius R (semi-join)

The fixtures carry no coordinates, so both queries derive deterministic
integer MICRO-DEGREE coordinates from the entity keys by multiplicative
hashing (Knuth/xxhash odd constants, pure BIGINT arithmetic — the same
portable-synthesis discipline as queries/privacy.py: identical expression
tree on both engines, machinery under test is the blocking join). All
distance math is exact integer squared-distance in micro-degrees; no trig,
no floats, so the oracle hash-match is exact.

Ring semantics (documented contract): candidates come from the probe
cell's 3x3 ring only — a standard bounded-radius index lookup, not a
global kNN. With CELL = 50_000 micro-degrees, any neighbor within one
cell width is guaranteed found; q_geo_radius_semi keeps R < CELL so the
ring provably covers the radius (no false negatives by construction).

Heritage: the reference (main.py:287-309) has no spatial surface; this is
the §2.4-style widening for exported location-bearing collections.

Scale: the build side partitions by cell; the probe side replicates 9x
(the explode) and equi-joins on the cell key — hash join at any scale,
broadcast when the build side is dim-sized (plan-asserted here). Skewed
cells (urban hotspots) are ordinary join skew: AQE skew-split or salt the
cell key. At planetary scale swap the two-int cell for a geohash/S2
prefix of the same construction; the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


# coordinate synthesis: micro-degrees in [0, 1_000_000) from the key.
# Keys are reduced mod 10^8 BEFORE the odd multipliers (raw products
# overflow int64 near key 3.5e9, where DuckDB errors and non-ANSI Spark
# wraps — bounding keeps both engines exact at any SF). Distinct
# multipliers per axis (and a supplier offset) so the two
# point sets are uncorrelated; all products stay far below 2^63.
_A, _B = 2654435761, 2246822519
CELL = 50_000  # micro-degrees per grid cell -> 20x20 grid

_CUST_DUCK = f"""
    SELECT c_custkey AS k,
           ((c_custkey % 100000000) * {_A}) % 1000000 AS lat,
           ((c_custkey % 100000000) * {_B}) % 1000000 AS lon
    FROM customer
"""

_SUPP_DUCK = f"""
    SELECT s_suppkey AS sk,
           ((s_suppkey % 100000000) * {_B} + 123456789) % 1000000 AS slat,
           ((s_suppkey % 100000000) * {_A} + 987654321) % 1000000 AS slon
    FROM supplier
"""


def _cust_points(spark, sf):
    c = T(spark, sf, "customer")
    return c.select(
        F.col("c_custkey").alias("k"),
        (((F.col("c_custkey") % 100000000) * _A) % 1000000).alias("lat"),
        (((F.col("c_custkey") % 100000000) * _B) % 1000000).alias("lon"),
    )


def _supp_points(spark, sf):
    s = T(spark, sf, "supplier")
    return s.select(
        F.col("s_suppkey").alias("sk"),
        (((F.col("s_suppkey") % 100000000) * _B + 123456789) % 1000000).alias("slat"),
        (((F.col("s_suppkey") % 100000000) * _A + 987654321) % 1000000).alias("slon"),
    )


# --------------------------------------------------------- grid-cell kNN ---
@q(
    "q_geo_grid_knn",
    f"""
    WITH c AS ({_CUST_DUCK}),
    s AS ({_SUPP_DUCK}),
    sc AS (SELECT *, slon // {CELL} AS sx, slat // {CELL} AS sy FROM s),
    probe AS (
        SELECT c.*, (lon // {CELL}) + dx.dx AS px, (lat // {CELL}) + dy.dy AS py
        FROM c
        CROSS JOIN (VALUES (-1), (0), (1)) AS dx(dx)
        CROSS JOIN (VALUES (-1), (0), (1)) AS dy(dy)
    ),
    cand AS (
        SELECT probe.k, sc.sk,
               (lat - slat) * (lat - slat) + (lon - slon) * (lon - slon) AS dist2
        FROM probe JOIN sc ON probe.px = sc.sx AND probe.py = sc.sy
    )
    SELECT k AS c_custkey, sk AS s_suppkey, dist2, CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY k ORDER BY dist2, sk) AS rk
          FROM cand)
    WHERE rk <= 3
    """,
)
def q_geo_grid_knn(spark, sf):
    # 3 nearest suppliers per customer among the 3x3-ring candidates:
    # exact integer squared distance, (dist2, suppkey) total order. The
    # probe side explodes 9 neighbor offsets; the build side is joined on
    # its exact cell — candidates are an equi-join, never a cross product.
    #
    # Scale: build side broadcasts at dim size (plan-asserted) or hash-
    # partitions by cell otherwise; per-probe fan-out is bounded by ring
    # occupancy (data density), not corpus size. Top-k per probe is a
    # WindowGroupLimit (rank filter pushed into the window sort).
    c, s = _cust_points(spark, sf), _supp_points(spark, sf)
    sc = s.select(
        "*",
        F.expr(f"slon div {CELL}").alias("sx"),
        F.expr(f"slat div {CELL}").alias("sy"),
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probe = (
        c.withColumn("dx", F.explode(off))
        .withColumn("dy", F.explode(off))
        .select(
            "k",
            "lat",
            "lon",
            (F.expr(f"lon div {CELL}") + F.col("dx")).alias("px"),
            (F.expr(f"lat div {CELL}") + F.col("dy")).alias("py"),
        )
    )
    cand = probe.join(
        sc, (F.col("px") == F.col("sx")) & (F.col("py") == F.col("sy"))
    ).select(
        "k",
        "sk",
        (
            (F.col("lat") - F.col("slat")) * (F.col("lat") - F.col("slat"))
            + (F.col("lon") - F.col("slon")) * (F.col("lon") - F.col("slon"))
        ).alias("dist2"),
    )
    w = Window.partitionBy("k").orderBy("dist2", "sk")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("k").alias("c_custkey"),
            F.col("sk").alias("s_suppkey"),
            "dist2",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ------------------------------------------------------- radius semi-join --
_R = 40_000  # < CELL, so the 3x3 ring provably covers the radius


@q(
    "q_geo_radius_semi",
    f"""
    WITH c AS ({_CUST_DUCK}),
    s AS ({_SUPP_DUCK}),
    sc AS (SELECT *, slon // {CELL} AS sx, slat // {CELL} AS sy FROM s)
    SELECT k AS c_custkey FROM c
    WHERE EXISTS (
        SELECT 1 FROM sc
        WHERE sc.sx BETWEEN (c.lon // {CELL}) - 1 AND (c.lon // {CELL}) + 1
          AND sc.sy BETWEEN (c.lat // {CELL}) - 1 AND (c.lat // {CELL}) + 1
          AND (c.lat - slat) * (c.lat - slat)
              + (c.lon - slon) * (c.lon - slon) <= {_R} * {_R}
    )
    """,
)
def q_geo_radius_semi(spark, sf):
    # "has a supplier within 40k micro-degrees" — the bounded-radius
    # EXISTS that feeds coverage / service-area reports. R < CELL makes
    # the ring lookup complete (any point within R is within one cell
    # width), so blocking introduces no false negatives; the distance
    # predicate removes the false positives. LEFT SEMI join: each
    # customer emits at most once, no candidate materialization survives
    # the join.
    #
    # Scale: semi-join on the exploded ring key — the probe never
    # duplicates in the OUTPUT (semi semantics dedupe in the join), and
    # the build side stays cell-partitioned/broadcast.
    c, s = _cust_points(spark, sf), _supp_points(spark, sf)
    sc = s.select(
        "*",
        F.expr(f"slon div {CELL}").alias("sx"),
        F.expr(f"slat div {CELL}").alias("sy"),
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probe = (
        c.withColumn("dx", F.explode(off))
        .withColumn("dy", F.explode(off))
        .select(
            "k",
            "lat",
            "lon",
            (F.expr(f"lon div {CELL}") + F.col("dx")).alias("px"),
            (F.expr(f"lat div {CELL}") + F.col("dy")).alias("py"),
        )
    )
    hit = probe.join(
        sc,
        (F.col("px") == F.col("sx"))
        & (F.col("py") == F.col("sy"))
        & (
            (F.col("lat") - F.col("slat")) * (F.col("lat") - F.col("slat"))
            + (F.col("lon") - F.col("slon")) * (F.col("lon") - F.col("slon"))
            <= F.lit(_R * _R)
        ),
        "left_semi",
    )
    # the 9x probe explosion can match in several ring cells -> distinct
    # on the key restores exactly-once output (semi was per probe ROW)
    return hit.select(F.col("k").alias("c_custkey")).distinct()
