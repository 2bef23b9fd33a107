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
    ev = table(spark, sf_dir, "events")
    build = (
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
