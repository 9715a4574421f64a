"""Vector column expressions — UDF-free, whole-stage-codegen friendly.

All math runs JVM-side via higher-order functions (``zip_with`` /
``aggregate``) in double precision, so results match a double-precision
oracle and never cross the Python boundary. At 100 TB this keeps similarity
scans inside codegen; the Python/Arrow path is reserved for operators that
genuinely need numpy (see operators/similarity.py ANN variants).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ in double precision (sequential, list order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    """L2 norm ‖a‖ in double precision."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a, b) -> Column:
    """Cosine similarity a·b / (‖a‖‖b‖), double precision throughout."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_dist(a, b) -> Column:
    """Euclidean distance ‖a−b‖ in double precision (sequential fold,
    list order — same determinism contract as :func:`dot`)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
