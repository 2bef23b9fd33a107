"""Vector column functions over ``array<float|double>`` embeddings.

All JVM-side (higher-order functions inside whole-stage codegen) — no Python
UDF in the hot path. Elements are cast to double first (float->double is
exact) so the fold order is the only rounding variable; both Spark
``aggregate`` and the oracle's dot products fold left-to-right.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two equal-length arrays."""
    prods = F.zip_with(_as_double(_c(a)), _as_double(_c(b)), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_as_double(_c(a)), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
