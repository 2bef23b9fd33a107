"""Banded range join: pairs within a time window, without the quadratic
inequality join.

``range_join_within(left, right, on, by, window)``: all (left, right) pairs
sharing ``by`` keys with ``|left.on - right.on| <= window``.

A naive ``l JOIN r ON key AND abs(l.ts - r.ts) <= W`` forces Spark into a
per-key cartesian (BroadcastNestedLoop or a key-equi join whose per-key
output is then filtered — both O(n_k²) per key). The banded plan buckets
time into window-sized cells: any qualifying pair lives in the same or
adjacent cells, so duplicating the RIGHT side into its cell and both
neighbors turns the range predicate into an EQUI join on (key, cell) —
shuffle-hash-joinable, skew-splittable by AQE — followed by the exact
band filter. Cost: 3x right-side duplication, O(pairs-in-band) join output.

This is the standard interval-join strategy (Flink's interval join, the
bucketing behind Databricks' range-join optimization — public knowledge);
the reference has no join beyond one anti-join (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    window: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All cross-side pairs with ``|left.on - right.on| <= window`` per key.

    ``on`` must be numeric (cast timestamps to epoch micros/millis first);
    ``window`` is in the same unit. Output: by-keys + prefixed payloads +
    both ``on`` values.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    key_cols = set(by) | {on}
    lvals = [c for c in left.columns if c not in key_cols]
    rvals = [c for c in right.columns if c not in key_cols]

    cell = (F.col(on) / window).cast("bigint")  # non-negative epoch assumed
    l = left.select(
        *by,
        F.col(on).alias(f"{left_prefix}{on}"),
        cell.alias("_cell"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in lvals],
    )
    r_base = right.select(
        *by,
        F.col(on).alias(f"{right_prefix}{on}"),
        cell.alias("_rcell"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rvals],
    )
    r = r_base.withColumn(
        "_cell", F.explode(F.array(F.col("_rcell") - 1, F.col("_rcell"), F.col("_rcell") + 1))
    ).drop("_rcell")
    band = (
        F.abs(F.col(f"{left_prefix}{on}") - F.col(f"{right_prefix}{on}")) <= window
    )
    return (
        l.join(r, [*by, "_cell"])
        .where(band)
        .drop("_cell")
    )
