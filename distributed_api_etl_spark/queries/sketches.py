"""Graded queries for the sketch operators (HLL cardinality, Bloom pruning).

Both sketches hash with ``portable_hash32`` and stay in integer/dyadic-double
arithmetic, so the DuckDB oracle reproduces the sketch BIT-FOR-BIT — the
estimates themselves are hash-match graded, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_api_etl_spark.operators import sketch as SK
from distributed_api_etl_spark.queries.registry import register, table

#: Build-side predicate for the Bloom demo: users with a high-value purchase
#: (~20% of users at every shipped SF — selective enough that pruning means
#: something, stable across testdata scales).
BLOOM_BUILD_VALUE = 200


@register(
    "events_hll_user_cardinality",
    bench=True,
    oracle=f"""
    SELECT h.event_type, h.zero_registers, h.est_distinct,
           e.exact_distinct
    FROM ({SK.hll_oracle_sql("user_id", "events", "event_type")}) h
    JOIN (SELECT event_type,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
          FROM events GROUP BY event_type) e USING (event_type)
    """,
    tags=("sketch", "events"),
)
def events_hll_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct-user cardinality via a portable HyperLogLog sketch
    (m=256 registers), joined against the exact count so the graded row
    carries the sketch's real error.

    At 100 TB the exact column is the thing you can no longer afford —
    ``COUNT(DISTINCT)`` shuffles every key, while the register table is 256
    rows/group after a map-side combine and merges across days with ``max``.
    Here the exact side doubles as in-row verification of the ~6.5%
    standard error (m=256).
    """
    ev = table(spark, sf_dir, "events")
    est = SK.hll_estimate(
        SK.hll_registers(ev, "user_id", ["event_type"]), ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "zero_registers", "est_distinct", "exact_distinct"
    )


def _bloom_oracle() -> str:
    cte = SK.bloom_oracle_ctes(
        "SELECT DISTINCT user_id AS k FROM events "
        f"WHERE event_type = 'purchase' AND value > {BLOOM_BUILD_VALUE}"
    )
    passx = SK.bloom_oracle_pass_expr("e.user_id")
    return f"""
    WITH {cte.strip()},
    marked AS (
      SELECT e.event_type,
             CASE WHEN {passx} THEN 1 ELSE 0 END AS bloom_pass,
             CASE WHEN e.user_id IN (SELECT k FROM bkeys) THEN 1 ELSE 0 END AS is_member
      FROM events e)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(bloom_pass) AS BIGINT) AS n_bloom_pass,
           CAST(sum(is_member) AS BIGINT) AS n_true_match,
           CAST(sum(bloom_pass) - sum(is_member) AS BIGINT) AS n_false_positive
    FROM marked GROUP BY event_type
    """


@register(
    "events_bloom_prune",
    oracle=_bloom_oracle(),
    tags=("sketch", "join", "events"),
)
def events_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning: a 1 KiB bitmap of high-value purchasers
    (the selective build side) probes the full event stream row-by-row in
    whole-stage codegen — no shuffle, no explode — and the graded row
    reports pass/true/false-positive counts per event type.

    The at-scale plan: build the bitmap with one map-side-combinable
    ``bit_or``, broadcast it, drop probe rows BEFORE the join shuffle. The
    ``n_true_match`` column (the exact semi-join) is the verification tier
    proving zero false negatives; production keeps only the bloom pass.
    Spark's own runtime version is enabled in session.py
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
    the explicit, cross-engine-checkable form.
    """
    from distributed_api_etl_spark.session import scoped_persist

    ev = table(spark, sf_dir, "events")
    # persisted: referenced by the bitmap build AND the is_member
    # verification join — without the cache the distinct re-runs per use
    build = scoped_persist(
        ev.where(
            (F.col("event_type") == "purchase")
            & (F.col("value") > BLOOM_BUILD_VALUE)
        )
        .select("user_id")
        .distinct()
    )
    bitmap = SK.build_bloom(build, "user_id")
    marked = SK.bloom_might_contain(ev, "user_id", bitmap).join(
        F.broadcast(build.withColumn("is_member", F.lit(1))), "user_id", "left"
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("bloom_pass").cast("bigint")).alias("n_bloom_pass"),
            F.sum(F.coalesce(F.col("is_member"), F.lit(0)).cast("bigint")).alias(
                "n_true_match"
            ),
        )
        .withColumn(
            "n_false_positive", F.col("n_bloom_pass") - F.col("n_true_match")
        )
    )


def _hll_rollup_oracle() -> str:
    """Per-day registers max-merged == whole-table registers, and therefore
    identical estimates — the sketch rollup algebra as a graded fact."""
    est_raw = f"({SK.HLL_ALPHA_EXPR}) * {SK.HLL_M} * {SK.HLL_M} / denom"
    corrected = SK._hll_correction_sql(est_raw)
    w = SK.HLL_W
    return f"""
    WITH hashed AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             {SK.portable_hash32_sql("user_id")} AS h32
      FROM events),
    bucketed AS (
      SELECT day, h32 // {1 << w} AS bucket,
             CASE WHEN h32 % {1 << w} = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(h32 % {1 << w})) END AS rho
      FROM hashed),
    daily AS (SELECT day, bucket, max(rho) AS max_rho
              FROM bucketed GROUP BY day, bucket),
    merged AS (SELECT bucket, max(max_rho) AS max_rho FROM daily GROUP BY bucket),
    est AS (
      SELECT CAST({SK.HLL_M} - count(*) AS BIGINT) AS zero_registers,
             sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << max_rho)) AS inv_sum
      FROM merged),
    final AS (SELECT zero_registers, zero_registers + inv_sum AS denom FROM est)
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_daily_registers,
           CAST((SELECT count(DISTINCT day) FROM daily) AS BIGINT) AS n_days,
           zero_registers,
           floor(({corrected}) * 1e4 + 0.5) / 1e4 AS est_distinct
    FROM final
    """


@register(
    "events_hll_daily_rollup",
    oracle=_hll_rollup_oracle(),
    tags=("sketch", "events"),
)
def events_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch rollup algebra, graded: per-DAY HLL register tables
    (what a 100 TB pipeline persists — 256 rows/day instead of re-scanning
    history) max-merge into the whole-corpus registers, and the merged
    estimate is computed FROM the daily tables only. The graded row
    carries the daily-register footprint (n_daily_registers ~ days x m)
    alongside the merged estimate — the pre-aggregation contract that
    makes distinct-count cubes incrementally maintainable."""
    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("timestamp").cast("date")
    )
    daily = SK.hll_registers(ev, "user_id", ["day"])
    from distributed_api_etl_spark.session import scoped_persist

    daily = scoped_persist(daily)  # referenced twice: footprint counts + merge
    merged = daily.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))
    est = SK.hll_estimate(merged, [])
    footprint = daily.agg(
        F.count("*").alias("n_daily_registers"),
        F.count_distinct("day").alias("n_days"),
    )
    return footprint.crossJoin(est).select(
        "n_daily_registers", "n_days", "zero_registers", "est_distinct"
    )


def _hist_quantile_oracle() -> str:
    cte = SK.histogram_quantile_oracle_ctes(
        "value", "events", "event_type", [("p50_est", 1, 2), ("p95_est", 19, 20)]
    )
    return f"""
    WITH {cte.strip()},
    ex AS (SELECT event_type,
                  quantile_cont(value, 0.5) AS p50_exact,
                  quantile_cont(value, 0.95) AS p95_exact,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY event_type)
    SELECT event_type, n, p50_est, p50_exact, p95_est, p95_exact
    FROM hq JOIN ex USING (event_type)
    """


@register(
    "events_value_hist_quantiles",
    bench=True,
    oracle=_hist_quantile_oracle(),
    tags=("sketch", "events", "stats"),
)
def events_value_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a mergeable 64-bin equi-width histogram — the
    deterministic quantile sketch completing the family (HLL = distinct,
    CMS = frequency, Bloom = membership, histogram = quantiles), with the
    exact quantiles in-row as the error-accounting tier.

    Why this shape at 100 TB: exact percentiles need a per-group sort (or
    the full two-pass exact machinery of events_value_percentiles);
    randomized sketches (t-digest/KLL) can't hash-grade. The histogram is
    <= 64 rows per group whatever the input, per-partition/per-day tables
    merge by vector SUM like CMS counters (bounds by min/max), and any
    quantile is answered from the cumulative table to within one bin
    width. Rank targets are computed in pure integer arithmetic
    (ceil(q*n) = (q_num*n + q_den - 1) div q_den) and the within-bin
    interpolation is a fixed IEEE sequence rounded via floor(x*1e4+0.5) —
    engine-exact on both sides.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    bounds, hist = SK.histogram_sketch(ev, "value", ["event_type"])
    from distributed_api_etl_spark.session import scoped_persist

    bounds = scoped_persist(bounds)  # feeds binning + both quantile picks
    hist = scoped_persist(hist)
    p50 = SK.histogram_quantile(bounds, hist, ["event_type"], 1, 2, "p50_est")
    p95 = SK.histogram_quantile(bounds, hist, ["event_type"], 19, 20, "p95_est")
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, CAST(0.5 AS DOUBLE))").alias("p50_exact"),
        F.expr("percentile(value, CAST(0.95 AS DOUBLE))").alias("p95_exact"),
        F.count("*").alias("n"),
    )
    return (
        p50.join(p95, "event_type")
        .join(exact, "event_type")
        .select("event_type", "n", "p50_est", "p50_exact", "p95_est", "p95_exact")
    )


def _cms_oracle() -> str:
    cte = SK.cms_oracle_sql("user_id", "events")
    return f"""
    WITH {cte.strip()},
    exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
              FROM events GROUP BY user_id)
    SELECT e.user_id, c.est_count, e.exact_count,
           c.est_count - e.exact_count AS overestimate
    FROM cms_est c JOIN exact e ON c.k = e.user_id
    ORDER BY c.est_count DESC, e.exact_count DESC, e.user_id
    LIMIT 10
    """


@register(
    "events_cms_heavy_hitters",
    bench=True,
    oracle=_cms_oracle(),
    tags=("sketch", "events"),
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a portable count-min sketch (d=4 x w=64 counters):
    per-user event frequencies estimated from a fixed-size counter table,
    top 10 by estimated count with the exact count in-row as the error
    accounting tier (est >= exact always — CMS only overestimates).

    Why this at 100 TB: exact heavy hitters need a full per-key groupBy —
    unbounded aggregation state shuffled across the cluster. The CMS
    counter table is d*w rows WHATEVER the input size, map-side-combines,
    and per-day tables merge by ``sum`` (the same rollup algebra graded for
    HLL in events_hll_daily_rollup), so a streaming pipeline maintains it
    incrementally and answers point-frequency queries without touching raw
    history. The probe side (candidate keys) never shuffles: d broadcast
    joins against the counter table in whole-stage codegen. The exact
    column here is verification, not production cost. Tie-break order is
    total (est desc, exact desc, user_id) so the LIMIT is deterministic on
    both engines. Width 64 is sized to exhibit real collisions at test SF;
    production sizes w ~ e/tolerated-error.
    """
    ev = table(spark, sf_dir, "events")
    counters = SK.cms_counters(ev, "user_id")
    cands = ev.select("user_id").distinct()
    est = SK.cms_estimate(cands, "user_id", counters)
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(
            F.col("est_count").desc(), F.col("exact_count").desc(), F.col("user_id")
        )
        .limit(10)
    )


def _hll_hourly_oracle() -> str:
    """Per-hour HLL distinct users — the windowed sketch table a streaming
    rollup would persist; same register arithmetic grouped by hour."""
    est_raw = f"({SK.HLL_ALPHA_EXPR}) * {SK.HLL_M} * {SK.HLL_M} / denom"
    corrected = SK._hll_correction_sql(est_raw)
    w = SK.HLL_W
    return f"""
    WITH hashed AS (
      SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             {SK.portable_hash32_sql("user_id")} AS h32
      FROM events),
    bucketed AS (
      SELECT window_start, h32 // {1 << w} AS bucket,
             CASE WHEN h32 % {1 << w} = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(h32 % {1 << w})) END AS rho
      FROM hashed),
    regs AS (SELECT window_start, bucket, max(rho) AS max_rho
             FROM bucketed GROUP BY window_start, bucket),
    est AS (
      SELECT window_start,
             CAST({SK.HLL_M} - count(*) AS BIGINT) AS zero_registers,
             sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << max_rho)) AS inv_sum
      FROM regs GROUP BY window_start),
    final AS (SELECT window_start, zero_registers,
                     zero_registers + inv_sum AS denom FROM est)
    SELECT window_start, zero_registers,
           floor(({corrected}) * 1e4 + 0.5) / 1e4 AS est_distinct
    FROM final
    """


@register(
    "events_hll_hourly_users",
    oracle=_hll_hourly_oracle(),
    tags=("sketch", "events", "window"),
)
def events_hll_hourly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed sketch rollup: distinct users PER HOUR via HLL registers
    grouped by the tumbling window — the table a streaming pipeline
    persists so any dashboard range-query merges hour sketches instead of
    re-scanning events (hours roll to days to months by register max,
    events_hll_daily_rollup grades that merge)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "window_start",
        F.date_format(
            F.date_trunc("hour", F.col("ts").cast("timestamp")),
            "yyyy-MM-dd HH:mm:ss",
        ),
    )
    regs = SK.hll_registers(ev, "user_id", ["window_start"])
    return SK.hll_estimate(regs, ["window_start"])


def _hll_overlap_oracle() -> str:
    """DuckDB mirror of the pairwise union-merge + inclusion-exclusion:
    single-type registers, pair registers max-merged, both estimated with
    the shared corrected-estimate SQL, exact intersection in-row."""
    from distributed_api_etl_spark.functions.portable import portable_hash32_sql

    est_raw = f"({SK.HLL_ALPHA_EXPR}) * {SK.HLL_M} * {SK.HLL_M} / denom"
    corrected = SK._hll_correction_sql(est_raw)
    return f"""
    WITH hashed AS (
      SELECT event_type, {portable_hash32_sql("user_id")} AS h32 FROM events),
    bucketed AS (
      SELECT event_type, h32 // {1 << SK.HLL_W} AS bucket,
             CASE WHEN h32 % {1 << SK.HLL_W} = 0 THEN {SK.HLL_W + 1}
                  ELSE {SK.HLL_W + 1} - length(bin(h32 % {1 << SK.HLL_W})) END AS rho
      FROM hashed),
    regs AS (SELECT event_type, bucket, max(rho) AS max_rho
             FROM bucketed GROUP BY event_type, bucket),
    single_est AS (
      SELECT event_type, zero_registers, zero_registers + inv_sum AS denom
      FROM (SELECT event_type,
                   CAST({SK.HLL_M} - count(*) AS BIGINT) AS zero_registers,
                   sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << max_rho)) AS inv_sum
            FROM regs GROUP BY event_type)),
    single AS (
      SELECT event_type,
             floor(({corrected}) * 1e4 + 0.5) / 1e4 AS est FROM single_est),
    pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b ON a.event_type < b.event_type),
    pair_regs AS (
      SELECT p.t1, p.t2, r.bucket, max(r.max_rho) AS max_rho
      FROM pairs p JOIN regs r ON r.event_type IN (p.t1, p.t2)
      GROUP BY p.t1, p.t2, r.bucket),
    union_est AS (
      SELECT t1, t2, zero_registers, zero_registers + inv_sum AS denom
      FROM (SELECT t1, t2,
                   CAST({SK.HLL_M} - count(*) AS BIGINT) AS zero_registers,
                   sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << max_rho)) AS inv_sum
            FROM pair_regs GROUP BY t1, t2)),
    unions AS (
      SELECT t1, t2,
             floor(({corrected}) * 1e4 + 0.5) / 1e4 AS est_union FROM union_est),
    exact AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             count(*) AS exact_intersection
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT event_type, user_id FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type)
    SELECT u.t1, u.t2,
           s1.est AS est_t1, s2.est AS est_t2, u.est_union,
           floor((s1.est + s2.est - u.est_union) * 1e4 + 0.5) / 1e4
             AS est_intersection,
           CAST(COALESCE(e.exact_intersection, 0) AS BIGINT)
             AS exact_intersection
    FROM unions u
    JOIN single s1 ON s1.event_type = u.t1
    JOIN single s2 ON s2.event_type = u.t2
    LEFT JOIN exact e ON e.t1 = u.t1 AND e.t2 = u.t2
    """


@register(
    "events_hll_type_overlap",
    oracle=_hll_overlap_oracle(),
    tags=("sketch", "events", "setops"),
)
def events_hll_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA beyond union: pairwise audience overlap between
    event types by inclusion-exclusion over HLL registers —
    |A n B| ~ est(A) + est(B) - est(A u B), where est(A u B) comes from
    max-merging the two types' register tables (the same merge the daily
    rollup grades). At 100 TB the inputs are m-row register tables per
    type, never re-scans of the fact; the exact intersection (one
    (type,user)-distinct self-join) rides along as the in-row accounting
    tier, the house pattern for every approx operator. All arithmetic is
    the dyadic/portable-round kind, so estimates hash-grade exactly."""
    ev = table(spark, sf_dir, "events")
    regs = SK.hll_registers(ev, "user_id", ["event_type"])
    from distributed_api_etl_spark.session import scoped_persist

    regs = scoped_persist(regs)  # feeds single ests, pair merge
    single = SK.hll_estimate(regs, ["event_type"]).select(
        "event_type", F.col("est_distinct").alias("est")
    )
    types = regs.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("t1"))
        .join(
            types.select(F.col("event_type").alias("t2")),
            F.col("t1") < F.col("t2"),
        )
    )
    pair_regs = (
        pairs.join(
            regs, (regs.event_type == F.col("t1")) | (regs.event_type == F.col("t2"))
        )
        .groupBy("t1", "t2", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    unions = SK.hll_estimate(pair_regs, ["t1", "t2"]).select(
        "t1", "t2", F.col("est_distinct").alias("est_union")
    )
    tu = ev.select("event_type", "user_id").distinct()
    exact = (
        tu.select(F.col("event_type").alias("t1"), "user_id")
        .join(
            tu.select(F.col("event_type").alias("t2"), F.col("user_id").alias("u2")),
            (F.col("user_id") == F.col("u2")) & (F.col("t1") < F.col("t2")),
        )
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("exact_intersection"))
    )
    s1 = single.select(F.col("event_type").alias("e1"), F.col("est").alias("est_t1"))
    s2 = single.select(F.col("event_type").alias("e2"), F.col("est").alias("est_t2"))
    return (
        unions.join(s1, F.col("t1") == F.col("e1"))
        .join(s2, F.col("t2") == F.col("e2"))
        .join(exact, ["t1", "t2"], "left")
        .select(
            "t1",
            "t2",
            "est_t1",
            "est_t2",
            "est_union",
            F.expr(
                "floor((est_t1 + est_t2 - est_union) * 1e4 + 0.5) / 1e4"
            ).alias("est_intersection"),
            F.coalesce("exact_intersection", F.lit(0)).cast("bigint").alias(
                "exact_intersection"
            ),
        )
    )
