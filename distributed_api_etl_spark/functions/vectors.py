"""Vector column functions over ``array<float|double>`` embeddings.

All JVM-side (higher-order functions inside whole-stage codegen) — no Python
UDF in the hot path. Elements are cast to double first (float->double is
exact) so the fold order is the only rounding variable; both Spark
``aggregate`` and the oracle's dot products fold left-to-right.

Construction cost matters too: building nested HOF lambdas through the
Py4J bridge costs ~0.5s of driver time per expression. When operands are
plain column names the expression is built as ONE ``F.expr`` SQL string —
a single bridge call, identical semantics.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two equal-length arrays."""
    if isinstance(a, str) and isinstance(b, str) and _IDENT.match(a) and _IDENT.match(b):
        return F.expr(_dot_sql(a, b))
    prods = F.zip_with(_as_double(_c(a)), _as_double(_c(b)), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    if isinstance(a, str) and _IDENT.match(a):
        return F.expr(_norm_sql(a))
    sq = F.transform(_as_double(_c(a)), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str) and _IDENT.match(a) and _IDENT.match(b):
        return F.expr(f"{_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)})")
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_fold_udf():
    """Arrow-vectorized cosine with the SAME left-to-right fold as the SQL path.

    The verify stage of LSH near-dup evaluates one 64-dim cosine per
    candidate pair; the HOF ``aggregate`` fold runs interpreted (one closure
    call per element per row), which dominates wall time once candidates
    reach ~10^6. This pandas UDF accumulates per DIMENSION across the Arrow
    batch (``acc += A[:,j] * B[:,j]``), so each pair's dot/norms are summed
    in exactly the sequential element order of :func:`dot`/:func:`l2_norm`
    — IEEE doubles make the result bit-identical to the JVM fold and the
    DuckDB oracle, while the inner loop is 3 numpy ops per dimension per
    batch instead of per row. Vectorized batch compute, not a row-at-a-time
    UDF.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack([np.asarray(x, dtype=np.float64) for x in a])
        B = np.vstack([np.asarray(x, dtype=np.float64) for x in b])
        d = np.zeros(len(a)); na = np.zeros(len(a)); nb = np.zeros(len(a))
        for j in range(A.shape[1]):
            aj = A[:, j]; bj = B[:, j]
            d += aj * bj
            na += aj * aj
            nb += bj * bj
        return pd.Series(d / (np.sqrt(na) * np.sqrt(nb)))

    return cos
