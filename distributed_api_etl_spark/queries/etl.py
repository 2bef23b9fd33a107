"""Warehouse-maintenance graded queries: SCD2 dimension merge and
data-quality expectations (operators/scd.py, operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_api_etl_spark.queries.registry import register, table

SCD_T0 = "2024-01-01 00:00:00"
SCD_T1 = "2024-06-01 00:00:00"
# update batch: every 7th customer re-lands with a segment derived from
# custkey%3 (some equal the current segment -> must NOT version), plus
# three brand-new keys (insert branch)
_NEW_SEG_SQL = (
    "CASE CAST(c_custkey % 3 AS INTEGER) WHEN 0 THEN 'AUTOMOBILE' "
    "WHEN 1 THEN 'BUILDING' ELSE 'MACHINERY' END"
)


@register(
    "scd2_customer_segments",
    oracle=f"""
    WITH cur AS (SELECT c_custkey, c_mktsegment FROM customer),
    upd AS (
      SELECT c_custkey, {_NEW_SEG_SQL} AS new_seg
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT * FROM (VALUES (900000001, 'FURNITURE'), (900000002, 'FURNITURE'),
                            (900000003, 'HOUSEHOLD')) v(c_custkey, new_seg)
    ),
    changed AS (
      SELECT c.c_custkey, c.c_mktsegment AS old_seg, u.new_seg
      FROM cur c JOIN upd u USING (c_custkey)
      WHERE u.new_seg <> c.c_mktsegment
    )
    SELECT c_custkey, old_seg AS c_mktsegment,
           TIMESTAMP '{SCD_T0}' AS valid_from,
           TIMESTAMP '{SCD_T1}' AS valid_to
    FROM changed
    UNION ALL
    SELECT c_custkey, new_seg, TIMESTAMP '{SCD_T1}', CAST(NULL AS TIMESTAMP)
    FROM changed
    UNION ALL
    SELECT u.c_custkey, u.new_seg, TIMESTAMP '{SCD_T1}', CAST(NULL AS TIMESTAMP)
    FROM upd u LEFT JOIN cur c USING (c_custkey) WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT c.c_custkey, c.c_mktsegment, TIMESTAMP '{SCD_T0}',
           CAST(NULL AS TIMESTAMP)
    FROM cur c LEFT JOIN upd u USING (c_custkey)
    WHERE u.c_custkey IS NULL OR u.new_seg = c.c_mktsegment
    """,
    tags=("etl", "scd"),
)
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge (operators/scd.py:scd2_apply): an update batch versions
    the customer-segment dimension — changed keys close + re-version,
    unchanged re-lands are suppressed, brand-new keys insert as their
    first version. One equi-join plus map-side unions."""
    from distributed_api_etl_spark.operators.scd import scd2_apply

    cust = table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(SCD_T0).cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    upd = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.expr(_NEW_SEG_SQL).alias("c_mktsegment"),
        F.lit(SCD_T1).cast("timestamp_ntz").alias("effective_ts"),
    ).unionByName(
        spark.createDataFrame(
            [
                (900000001, "FURNITURE", SCD_T1),
                (900000002, "FURNITURE", SCD_T1),
                (900000003, "HOUSEHOLD", SCD_T1),
            ],
            "c_custkey bigint, c_mktsegment string, effective_ts string",
        ).select(
            "c_custkey",
            "c_mktsegment",
            F.col("effective_ts").cast("timestamp_ntz").alias("effective_ts"),
        )
    )
    return scd2_apply(dim, upd, "c_custkey", ["c_mktsegment"])


def _viol_sql(name: str, fail_cond: str) -> str:
    """One report row: violations = rows where the rule's SQL check fails
    (fail_cond is the NEGATED check, NULL-inclusive on both engines)."""
    return f"""
    SELECT '{name}' AS rule_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN {fail_cond} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST((1000000 * sum(CASE WHEN {fail_cond} THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS violation_ppm
    FROM orders
    """


@register(
    "orders_dq_report",
    oracle=f"""
    {_viol_sql("orderdate_in_window",
               "NOT (CAST(o_orderdate AS DATE) <= DATE '1998-12-31')")}
    UNION ALL
    {_viol_sql("priority_known",
               "o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM',"
               "'4-NOT SPECIFIED','5-LOW') OR o_orderpriority IS NULL")}
    UNION ALL
    {_viol_sql("totalprice_positive", "NOT (o_totalprice > 0)")}
    UNION ALL
    {_viol_sql("totalprice_under_400k", "NOT (o_totalprice < 400000)")}
    UNION ALL
    SELECT 'custkey_in_customer' AS rule_name,
           (SELECT count(*) FROM orders) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_violations,
           CAST((1000000 * count(*)) // (SELECT count(*) FROM orders)
                AS BIGINT) AS violation_ppm
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    tags=("etl", "quality"),
)
def orders_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation report (operators/quality.py): four row rules in ONE
    aggregation pass over one scan, plus a referential rule (anti-join
    against the customer key set) — the bronze->silver promotion gate.
    Non-vacuous: the testdata's order dates overrun the declared window
    and the price cap, so two rules report real violations."""
    from distributed_api_etl_spark.operators.quality import (
        dq_report,
        fk_violations,
        rule,
    )

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    rules = [
        rule("orderdate_in_window",
             F.col("o_orderdate").cast("date") <= F.lit("1998-12-31").cast("date")),
        rule("priority_known",
             F.col("o_orderpriority").isin(
                 "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
        rule("totalprice_positive", F.col("o_totalprice") > 0),
        rule("totalprice_under_400k", F.col("o_totalprice") < 400000),
    ]
    report = dq_report(orders, rules)
    fk = fk_violations(orders, "o_custkey", cust, "c_custkey", "custkey_in_customer")
    return report.unionByName(fk)


@register(
    "orders_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k,
             o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0 END AS price,
             o_orderstatus AS st
      FROM orders WHERE o_orderkey % 13 != 0),
    new AS (
      SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st
      FROM orders WHERE o_orderkey % 11 != 0),
    cls AS (
      SELECT COALESCE(old.k, new.k) AS o_orderkey,
             CASE WHEN old.k IS NULL THEN 'added'
                  WHEN new.k IS NULL THEN 'removed'
                  WHEN old.price != new.price OR old.st != new.st THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM old FULL OUTER JOIN new ON old.k = new.k)
    SELECT o_orderkey, change_type FROM cls WHERE change_type != 'unchanged'
    """,
    tags=("etl", "reconcile"),
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot reconciliation (operators/reconcile.py:snapshot_diff):
    two deterministic snapshots derived from ``orders`` (1/13 of keys new,
    1/11 removed, every 5th price drifted) are diffed into
    added/removed/changed rows — both sides reduce to (key, md5 row hash)
    before the single full-outer shuffle, so the join ships two narrow
    columns and the output scales with the CHANGE rate, not table size."""
    from distributed_api_etl_spark.operators.reconcile import snapshot_diff

    orders = table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 5 == 0, F.lit(1.0)).otherwise(F.lit(0.0))
        ).alias("o_totalprice"),
        "o_orderstatus",
    )
    new = orders.where(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return snapshot_diff(old, new, "o_orderkey", ["o_totalprice", "o_orderstatus"])


PIT_T0 = "1995-01-01 00:00:00"
PIT_T1 = "1998-01-01 00:00:00"


@register(
    "orders_scd2_pointintime",
    oracle=f"""
    WITH cur AS (SELECT c_custkey, c_mktsegment FROM customer),
    upd AS (
      SELECT c_custkey, {_NEW_SEG_SQL} AS new_seg
      FROM customer WHERE c_custkey % 7 = 0
    ),
    changed AS (
      SELECT c.c_custkey, c.c_mktsegment AS old_seg, u.new_seg
      FROM cur c JOIN upd u USING (c_custkey)
      WHERE u.new_seg <> c.c_mktsegment
    ),
    dim AS (
      SELECT c_custkey, old_seg AS seg,
             TIMESTAMP '{PIT_T0}' AS valid_from,
             TIMESTAMP '{PIT_T1}' AS valid_to
      FROM changed
      UNION ALL
      SELECT c_custkey, new_seg, TIMESTAMP '{PIT_T1}', CAST(NULL AS TIMESTAMP)
      FROM changed
      UNION ALL
      SELECT c.c_custkey, c.c_mktsegment, TIMESTAMP '{PIT_T0}',
             CAST(NULL AS TIMESTAMP)
      FROM cur c LEFT JOIN upd u USING (c_custkey)
      WHERE u.c_custkey IS NULL OR u.new_seg = c.c_mktsegment
    )
    SELECT d.seg AS c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
             AS revenue
    FROM orders o
    JOIN dim d ON d.c_custkey = o.o_custkey
     AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to)
    GROUP BY d.seg
    """,
    tags=("etl", "scd", "asof"),
)
def orders_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact enrichment against the SCD2 dimension — the query
    SCD2 exists FOR: each order joins the segment version VALID AT its
    order date (equi-join on the key plus the validity-interval predicate;
    per-key version counts are small, so the range residual is a cheap
    post-filter on the equi-join, never an inequality-only join). The
    dimension is built by the same scd2_apply operator with epochs rebased
    into the order-date range so the 1998 boundary genuinely splits each
    changed customer's history. Revenue accumulates in exact DECIMAL."""
    from distributed_api_etl_spark.operators.scd import scd2_apply

    cust = table(spark, sf_dir, "customer")
    dim0 = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(PIT_T0).cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    upd = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.expr(_NEW_SEG_SQL).alias("c_mktsegment"),
        F.lit(PIT_T1).cast("timestamp_ntz").alias("effective_ts"),
    )
    dim = scd2_apply(dim0, upd, "c_custkey", ["c_mktsegment"]).select(
        F.col("c_custkey").alias("d_custkey"),
        F.col("c_mktsegment").alias("seg"),
        "valid_from",
        "valid_to",
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp_ntz").alias("o_ts"),
    )
    from pyspark.sql.types import DecimalType

    return (
        orders.join(
            dim,
            (F.col("o_custkey") == F.col("d_custkey"))
            & (F.col("o_ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("o_ts") < F.col("valid_to"))),
        )
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(DecimalType(14, 2))), 2)
            .cast("double")
            .alias("revenue"),
        )
    )
