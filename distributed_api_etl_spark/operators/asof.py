"""As-of (backward) join — an operator Spark has no native form of.

``asof_join(left, right)``: for every left row, the single most recent
right row with ``right.on <= left.on`` within the same ``by`` keys (the
time-series / attribution join: "the latest click before this purchase",
"the prevailing price at trade time").

Implementation is the scalable union trick, NOT a range self-join:
union both sides with a side marker, then one window pass per ``by`` key
carrying the last-seen right row forward (right rows sort before left rows
at equal timestamps, so ties are inclusive, matching ASOF semantics).
Right-side payload is packed into ONE struct before the carry so all its
columns come from the same right row (per-column ``last(ignorenulls)``
would tear rows when a right value is legitimately NULL).

100 TB: one shuffle on ``by`` (the window), zero joins — compare with the
naive ``l JOIN r ON key AND r.ts <= l.ts`` + argmax, which explodes
quadratically per key. Skewed keys are bounded by per-key history length;
pre-filter ``right`` by a time horizon to cap state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    tolerance_ms: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join; inclusive on equal timestamps.

    Output: every left column, plus each right non-key column prefixed with
    ``right_prefix`` (NULL when no prior right row exists or the match is
    older than ``tolerance_ms``). ``tolerance_ms`` requires a
    timestamp-typed ``on`` column. For deterministic output when several
    right rows share (by, on), pre-aggregate the right side to one row per
    (by, on) — e.g. ``groupBy(by, on).agg(max(...))``.
    """
    key_cols = set(by) | {on}
    right_vals = [c for c in right.columns if c not in key_cols]
    left_vals = [c for c in left.columns if c not in key_cols]

    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        F.struct(F.col(on).alias("_r_on"), *[F.col(c) for c in right_vals]).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_vals],
    )
    lf = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in left_vals],
    )
    unioned = r.unionByName(lf)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1)
    if tolerance_ms is not None:
        age = F.unix_millis(F.col(on).cast("timestamp")) - F.unix_millis(
            F.col("_match._r_on").cast("timestamp")
        )
        out = out.withColumn(
            "_match", F.when(age <= tolerance_ms, F.col("_match"))
        )
    return out.select(
        *by,
        F.col(on),
        *[F.col(c) for c in left_vals],
        F.col(f"_match._r_on").alias(f"{right_prefix}{on}"),
        *[F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in right_vals],
    )
