"""Relational / dataflow operators from SURVEY.md §2.1, as graded queries.

Covers: catalog scan + projection + predicate pushdown (#1,#4), anti-join
idempotency diff (#5), hash batch assignment (#7, fixed to be non-negative
and cross-engine portable), batch filter (#10), distinct batch enumeration
(#9), plus the downstream Spark-SQL analytics the reference delegates to
Spark (SURVEY §3.3) as TPC-H-style aggregation/join queries (the bench
headliners).

Scale notes: every query is a declarative DataFrame plan — Catalyst pushes
filters into the parquet scan, prunes columns, and AQE's runtime size stats
pick broadcast vs sort-merge per join. Explicit ``broadcast`` hints appear
ONLY on sides whose size is bounded by construction at every sf (fixed-size
nation/region dims, one-row scalar aggregates, q18's tiny >300-qty key
set) — never on tables or slices that scale with the data, where a hint
would override AQE and OOM at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from distributed_api_etl_spark.functions.portable import (
    dec,
    portable_hash32,
    portable_hash32_sql,
)
from distributed_api_etl_spark.queries.registry import register, table

N_BATCHES = 16


def _one_minus(col, sign: int = -1):
    # exact (5,3) decimal for (1 - discount) / (1 + tax) factors
    return (F.lit(1) + sign * dec(col, 5, 3)).cast(DecimalType(5, 3))


# ---------------------------------------------------------------------------
# Source scan / projection / pushdown  (reference op #1/#4: orchestrator.py
# get_data_source + withColumnRenamed to request_id)
# ---------------------------------------------------------------------------
@register(
    "source_scan_project",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS request_id,
           c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_acctbal > 1000.0 AND c_mktsegment <> 'MACHINERY'
    """,
    tags=("relational",),
)
def source_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .where((F.col("c_acctbal") > 1000.0) & (F.col("c_mktsegment") != "MACHINERY"))
        .select(
            F.col("c_custkey").cast("string").alias("request_id"),
            "c_name",
            "c_mktsegment",
            "c_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# Idempotency diff (reference op #5: the one join in the codebase —
# src/orchestration/batch_processor.py:36-40, left_anti on request_id)
# ---------------------------------------------------------------------------
@register(
    "idempotency_anti_join",
    oracle="""
    WITH source AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS request_id, o_custkey, o_totalprice
      FROM orders
    ),
    sink AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS request_id
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT s.request_id, s.o_custkey, s.o_totalprice
    FROM source s
    WHERE NOT EXISTS (SELECT 1 FROM sink t WHERE t.request_id = s.request_id)
    """,
    tags=("relational", "etl"),
)
def idempotency_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    source = orders.select(
        F.col("o_orderkey").cast("string").alias("request_id"),
        "o_custkey",
        "o_totalprice",
    )
    # stand-in for the bronze sink's already-processed request_ids
    sink = (
        orders.where(F.col("o_orderkey") % 3 == 0)
        .select(F.col("o_orderkey").cast("string").alias("request_id"))
    )
    return source.join(sink, on="request_id", how="left_anti")


# ---------------------------------------------------------------------------
# Batch assignment (reference op #7: hash(request_id) % n — rebuilt with a
# non-negative, cross-engine-portable hash; batch_processor.py:42-54)
# ---------------------------------------------------------------------------
_BATCH_ID_SQL = (
    f"({portable_hash32_sql('o_orderkey')} % {N_BATCHES})"
)


@register(
    "batch_assignment",
    oracle=f"""
    SELECT {_BATCH_ID_SQL} AS batch_id,
           count(*) AS n_rows,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM orders
    GROUP BY 1
    """,
    tags=("relational", "etl"),
)
def batch_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    with_batch = orders.withColumn(
        "batch_id", portable_hash32(F.col("o_orderkey")) % N_BATCHES
    )
    return with_batch.groupBy("batch_id").agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@register(
    "batch_filter",
    oracle=f"""
    SELECT CAST(o_orderkey AS VARCHAR) AS request_id, o_custkey
    FROM orders
    WHERE {_BATCH_ID_SQL} = 3
    """,
    tags=("relational", "etl"),
)
def batch_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select one batch (reference op #10: batch_processor.py:57)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.withColumn("batch_id", portable_hash32(F.col("o_orderkey")) % N_BATCHES)
        .where(F.col("batch_id") == 3)
        .select(F.col("o_orderkey").cast("string").alias("request_id"), "o_custkey")
    )


@register(
    "batch_ids_distinct",
    oracle=f"""
    SELECT DISTINCT {_BATCH_ID_SQL} AS batch_id FROM orders
    """,
    tags=("relational", "etl"),
)
def batch_ids_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumerate batches (reference op #9: batch_processor.py:79-81)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(
            (portable_hash32(F.col("o_orderkey")) % N_BATCHES).alias("batch_id")
        ).distinct()
    )


# ---------------------------------------------------------------------------
# Downstream analytics (SURVEY §3.3: "downstream querying is plain Spark
# SQL") — TPC-H-style headliners, also the bench workload.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))), 2)
                AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))
                    * CAST(1 + CAST(l_tax AS DECIMAL(5,3)) AS DECIMAL(5,3))), 2)
                AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    tags=("analytics",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice", 12, 2)
    disc_f = _one_minus(F.col("l_discount"), -1)
    tax_f = _one_minus(F.col("l_tax"), +1)
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 12, 2)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * disc_f), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price * disc_f * tax_f), 2).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))), 2)
                AS DOUBLE) AS revenue,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
    tags=("analytics",),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").cast("date") < F.lit("1995-03-15").cast("date")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").cast("date") > F.lit("1995-03-15").cast("date")
    )
    revenue = dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"), -1)
    return (
        # no broadcast hints: orders/customer scale with sf, so an explicit
        # hint would override AQE's size stats and OOM at 100 TB — AQE picks
        # broadcast at small sf (under autoBroadcastJoinThreshold) and
        # sort-merge + skew-split at scale
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(cust.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))), 2)
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1994-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-01-01'
    GROUP BY n_name
    """,
    bench=True,
    tags=("analytics",),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1994-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-01-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"), -1)
    return (
        # customer/supplier scale with sf: no hints, AQE decides (broadcast
        # at small sf, sort-merge at 100 TB). nation/region are fixed-size
        # (25/5 rows at every sf) so their hints are scale-safe.
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp.select("s_suppkey", "s_nationkey"),
            (li.l_suppkey == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Multi-level aggregation: ROLLUP (grouping sets). The reference has no
# aggregations beyond count (SURVEY §2.4); downstream analytics delegate to
# Spark — rollup is the canonical "one shuffle, all levels" pattern (partial
# aggregation covers every grouping set in a single pass).
# ---------------------------------------------------------------------------
@register(
    "q1_rollup_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("analytics",),
    # promoted r10 (VERDICT r9 #3): q1_cube_summary's grouping sets cover
    # the code path, but this head's own driver evidence had aged to
    # r2/r3 — rejoins the rotation for fresh evidence on the rollup shape.
    graded=True,
)
def q1_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 12, 2)).cast("double").alias("sum_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations + frame-based windows (SURVEY §2.4: absent in the
# reference, delegated to Spark built-ins — graded here).
# ---------------------------------------------------------------------------
@register(
    "set_ops_customer_segments",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
    SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
    UNION ALL
    SELECT 'except', CAST(count(*) AS BIGINT)
    FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
    UNION ALL
    SELECT 'union', CAST(count(*) AS BIGINT)
    FROM (SELECT * FROM building UNION SELECT * FROM rich)
    """,
    tags=("relational", "setops"),
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.where(F.col("c_acctbal") > 5000.0).select("c_custkey")
    spark_ = spark

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        one("intersect", building.intersect(rich))
        .unionByName(one("except", building.exceptAll(rich).distinct()))
        .unionByName(one("union", building.union(rich).distinct()))
    )


@register(
    "window_running_order_totals",
    oracle="""
    SELECT o_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           CAST(lag(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS BIGINT)
             AS prev_orderkey
    FROM orders
    WHERE o_custkey < 200
    """,
    tags=("relational", "window"),
)
def window_running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based running sum + lag per customer (exact DECIMAL
    accumulation, cast to double only at the boundary)."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), F.col("o_orderkey")
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.sum(dec("o_totalprice", 14, 2)).over(frame).cast("double").alias("running_total"),
        F.lag("o_orderkey").over(w).cast("bigint").alias("prev_orderkey"),
    )


@register(
    "profile_customer_table",
    oracle="""
    SELECT 'c_custkey' AS column_name, count(*) AS n_rows,
           count(*) - count(c_custkey) AS n_nulls,
           count(DISTINCT c_custkey) AS n_distinct,
           CAST(min(c_custkey) AS DOUBLE) AS min_num,
           CAST(max(c_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM customer
    UNION ALL
    SELECT 'c_name', count(*), count(*) - count(c_name), count(DISTINCT c_name),
           NULL, NULL, min(c_name), max(c_name) FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
           count(DISTINCT c_nationkey),
           CAST(min(c_nationkey) AS DOUBLE), CAST(max(c_nationkey) AS DOUBLE),
           NULL, NULL FROM customer
    UNION ALL
    SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
           count(DISTINCT c_acctbal),
           CAST(min(c_acctbal) AS DOUBLE), CAST(max(c_acctbal) AS DOUBLE),
           NULL, NULL FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
           count(DISTINCT c_mktsegment),
           NULL, NULL, min(c_mktsegment), max(c_mktsegment) FROM customer
    """,
    tags=("relational", "profiling"),
)
def profile_customer_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profiling (operators/profile.py): the oracle
    needs 5 scans for what one Spark aggregation computes."""
    from distributed_api_etl_spark.operators.profile import profile_table

    return profile_table(table(spark, sf_dir, "customer"))


@register(
    "profile_customer_approx",
    oracle="""
    SELECT 'c_custkey' AS column_name, count(*) AS n_rows,
           count(*) - count(c_custkey) AS n_nulls,
           CAST(min(c_custkey) AS DOUBLE) AS min_num,
           CAST(max(c_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
           TRUE AS ndv_within_5pct
    FROM customer
    UNION ALL
    SELECT 'c_name', count(*), count(*) - count(c_name),
           NULL, NULL, min(c_name), max(c_name), TRUE FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
           CAST(min(c_nationkey) AS DOUBLE), CAST(max(c_nationkey) AS DOUBLE),
           NULL, NULL, TRUE FROM customer
    UNION ALL
    SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
           CAST(min(c_acctbal) AS DOUBLE), CAST(max(c_acctbal) AS DOUBLE),
           NULL, NULL, TRUE FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
           NULL, NULL, min(c_mktsegment), max(c_mktsegment), TRUE FROM customer
    """,
    tags=("relational", "profiling"),
)
def profile_customer_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiler's at-scale tier graded as its own row: ``approx=True``
    swaps exact count_distinct (one Expand shuffle per column set) for HLL
    ``approx_count_distinct`` — the only profile choice at 100 TB. HLL
    values can't be mirrored in DuckDB, so the grade pins the exact fields
    by hash and grades the HLL estimate as a tolerance BOOLEAN against the
    exact NDV computed in the same query (HLL is hash-based, so the flag is
    deterministic for a fixed dataset). The two-scan exact+approx join here
    exists only to produce the reference NDV for the tolerance check; the
    production at-scale call is the single approx pass."""
    from distributed_api_etl_spark.operators.profile import profile_table

    cust = table(spark, sf_dir, "customer")
    exact = profile_table(cust)
    approx = profile_table(cust, approx=True, rsd=0.01).select(
        "column_name", F.col("n_distinct").alias("ndv_approx")
    )
    return (
        exact.join(approx, "column_name")
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            "min_num",
            "max_num",
            "min_str",
            "max_str",
            (
                F.abs(F.col("ndv_approx") - F.col("n_distinct"))
                <= 0.05 * F.col("n_distinct")
            ).alias("ndv_within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets (CUBE) — absent from the reference (SURVEY §2.4 "no grouping
# sets"); the Spark-native form computes every grouping-set level in ONE
# shuffle with map-side partial aggregation (the naive alternative is 4
# scans + a union). GROUPING() flags disambiguate subtotal NULLs from data
# NULLs, which matters once grouping columns are nullable at scale.
# ---------------------------------------------------------------------------
@register(
    "q1_cube_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_returnflag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS count_order
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("analytics",),
)
def q1_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_returnflag"),
        F.grouping("l_linestatus").cast("int").alias("g_linestatus"),
        F.sum(dec("l_quantity", 12, 2)).cast("double").alias("sum_qty"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Correlated-aggregate join (TPC-H q17 shape): "lineitems whose quantity is
# below 20% of the per-part average". The correlated subquery is decorrelated
# by hand into a per-part aggregate + equi-join — the form Catalyst's
# decorrelation produces, but stated explicitly so the plan is stable.
# The 0.2*avg threshold is evaluated EXACTLY via cross-multiplication
# (5·cnt·qty < sum_qty): no float division, so the filter decision is
# bit-identical across engines and at any scale.
# Scale: filtered `part` is tiny -> broadcast to the lineitem scan; the
# per-part aggregate and the probe join both hash-partition on l_partkey,
# so AQE reuses one exchange; nothing is ever corpus².
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH sel AS (
      SELECT p_partkey AS l_partkey, p_brand FROM part
      WHERE p_brand IN ('Brand#12','Brand#13','Brand#14') AND p_size <= 15
    ),
    per_part AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           count(*) AS n_small,
           CAST(sum(CAST(li.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_price
    FROM lineitem li
    JOIN sel USING (l_partkey)
    JOIN per_part pp USING (l_partkey)
    WHERE CAST(li.l_quantity AS DECIMAL(12,2)) * 5 * pp.cnt < pp.sum_qty
    GROUP BY p_brand
    """,
    tags=("analytics",),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    sel = part.where(
        F.col("p_brand").isin("Brand#12", "Brand#13", "Brand#14")
        & (F.col("p_size") <= 15)
    ).select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity", 12, 2)).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    qty = dec("l_quantity", 12, 2)
    # sel is a ~1%-selective part slice — small at test sf, but part scales
    # with data (1% of a 2 TB part table is 20 GB), so the join is unhinted
    # and AQE's stats pick broadcast vs shuffle per scale
    return (
        li.join(sel, "l_partkey")
        .join(per_part, "l_partkey")
        .where(qty * F.lit(5) * F.col("cnt").cast(DecimalType(10, 0)) < F.col("sum_qty"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            F.sum(dec("l_extendedprice", 12, 2)).cast("double").alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Semi-join (EXISTS) — the dual of the reference's one join (the left-anti
# idempotency diff, batch_processor.py:36-40): "customers with at least one
# urgent order". LEFT SEMI never duplicates or widens the probe side, so the
# output stays one row per customer with zero extra columns shuffled.
# Scale: Catalyst broadcasts whichever side stats allow; at 100 TB both
# sides are large -> AQE picks shuffled semi on o_custkey, and the
# o_orderpriority filter is pushed into the orders scan first.
# ---------------------------------------------------------------------------
@register(
    "semi_join_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=("relational",),
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# TPC-H breadth (SURVEY §3.3 delegated analytics): the remaining canonical
# join/subquery shapes, adapted to the available columns. Each one is the
# decorrelated, shuffle-minimal Spark form of a classic correlated-subquery
# pattern — the rewrite Catalyst itself applies to EXISTS/IN subqueries.
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE))
    GROUP BY o_orderpriority
    """,
    tags=("analytics",),
)
def q4_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (EXISTS decorrelated to a left-semi join with a non-equi
    residual; l_commitdate/l_receiptdate absent, l_shipdate > o_orderdate
    stands in). The semi join keeps only orders columns flowing, so the
    shuffle payload is the 2-column projection, never lineitem."""
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate.cast("date") > orders.o_orderdate.cast("date")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))), 2)
                AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("analytics",),
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top returned-item customers for a quarter. Fact side
    (lineitem) filtered at the scan; orders/customer joins are unhinted so
    AQE's size stats pick broadcast at small sf and sort-merge at 100 TB
    (orders/customer scale with sf; only fixed-size nation keeps a hint).
    The global top-20 is a TakeOrdered on the driver, not a full sort."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"), -1)
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN
                     CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))
                   ELSE CAST(0 AS DECIMAL(15,5)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3)))
                 AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-10-01'
    """,
    tags=("analytics",),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation over the part-dim join — unhinted,
    because part scales with sf (AQE broadcasts under the threshold, shuffles
    above it). Both sums accumulate in exact DECIMAL and only the final
    ratio is double, so the percentage is bit-identical cross-engine."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-09-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-10-01").cast("date"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"), -1)
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast(DecimalType(15, 5))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


Q18_MIN_QTY = 300


@register(
    "q18_large_volume_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > {Q18_MIN_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("analytics",),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: the IN (GROUP BY ... HAVING) subquery decorrelated to an
    aggregate-then-join. The HAVING filter runs before either join, so only
    the tiny qualifying-order set (decimal-exact sums) joins back — both
    joins broadcast at any scale where 'large volume' is selective."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("qty_dec"))
        .where(F.col("qty_dec") > Q18_MIN_QTY)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(big)
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            # dates leave graded queries as formatted strings (q3 convention):
            # a raw DATE hashes differently across engines' pandas mappings
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
                "o_orderdate"
            ),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    ),
    urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT c.c_mktsegment, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM urgent u WHERE u.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    tags=("analytics",),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-aggregate subquery (global average balance)
    + NOT EXISTS anti-join (customers with no urgent orders — every synthetic
    customer has orders, so 'dormant' is priority-scoped). The scalar is a
    one-row broadcast cross join (always safe: exactly 1 row). The NOT EXISTS
    anti-join is unhinted — the distinct urgent-customer key set scales with
    customer count, so AQE's stats choose broadcast vs shuffled anti-join."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    urgent = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(urgent, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal", 14, 2)).cast("double").alias("totacctbal"),
        )
    )


@register(
    "orders_price_deciles",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(ntile(10) OVER w AS INT) AS decile,
           round(cume_dist() OVER w, 6) AS cd,
           lag(o_totalprice) OVER w AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("analytics", "window"),
)
def orders_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window breadth: ntile deciles, cume_dist, and lag in one
    window over (priority, price). One shuffle keyed by o_orderpriority;
    at scale the 5-value partition key under-parallelizes a global sort —
    the production form extends the key with a hash bucket and re-merges
    (same guidance as pack_sequences); semantics here are the graded,
    deterministic (price, orderkey)-ordered form. lag carries the raw
    double (no arithmetic), so cross-engine equality is exact."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey AS custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("relational", "sink", "bucketing"),
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write both join sides as bucketed+sorted tables on the join key,
    then join them — the one-write-time-shuffle-amortizes-every-join
    pattern. The joined plan has ZERO shuffle exchanges (asserted at the
    plan level in tests/test_table_manager.py); here the ROW SET is graded
    against the plain-join oracle, proving bucketing is purely physical.
    At 100 TB this is how a fact table repeatedly joined on one key should
    be stored: bucket count ~ total size / 200 MB, both sides agreeing."""
    import tempfile

    from distributed_api_etl_spark.core.table_manager import TableManager

    tm = TableManager(spark)
    base = tempfile.mkdtemp(prefix="bucketed_q_")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )
    tm.write_bucketed(
        orders, "bucketed_q.orders_b", ["custkey"], 8,
        sort_cols=["custkey"], location=f"{base}/orders_b",
    )
    tm.write_bucketed(
        cust, "bucketed_q.customer_b", ["custkey"], 8,
        sort_cols=["custkey"], location=f"{base}/customer_b",
    )
    return (
        spark.table("bucketed_q.orders_b")
        .join(spark.table("bucketed_q.customer_b"), "custkey")
        .select("o_orderkey", "custkey", "c_name", "c_mktsegment")
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH maxd AS (SELECT max(o_orderdate) AS d FROM orders),
    rfm AS (
      SELECT o_custkey AS c_custkey,
             date_diff('day', max(o_orderdate), (SELECT d FROM maxd)) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey)
    SELECT c_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary,
           CAST(CASE WHEN recency_days <= 90 THEN 3
                     WHEN recency_days <= 365 THEN 2 ELSE 1 END AS INTEGER) AS r_score,
           CAST(CASE WHEN frequency >= 15 THEN 3
                     WHEN frequency >= 8 THEN 2 ELSE 1 END AS INTEGER) AS f_score,
           CAST(CASE WHEN monetary >= 2000000 THEN 3
                     WHEN monetary >= 1000000 THEN 2 ELSE 1 END AS INTEGER) AS m_score
    FROM rfm
    """,
    tags=("relational", "ml"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency/frequency/monetary scores with
    fixed business thresholds — integer boundaries, so segment assignment
    is bit-exact): one groupBy on the customer key plus a one-row max-date
    broadcast. Day arithmetic via datediff on DATE values (no
    engine-boundary-crossing second counting)."""
    orders = table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("d"))
    rfm = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast(DecimalType(14, 2))), 2)
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .withColumn("recency_days", F.datediff(F.col("d"), F.col("last_order")).cast("bigint"))
    )
    return rfm.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.when(F.col("recency_days") <= 90, 3)
        .when(F.col("recency_days") <= 365, 2)
        .otherwise(1)
        .cast("int")
        .alias("r_score"),
        F.when(F.col("frequency") >= 15, 3)
        .when(F.col("frequency") >= 8, 2)
        .otherwise(1)
        .cast("int")
        .alias("f_score"),
        F.when(F.col("monetary") >= 2000000, 3)
        .when(F.col("monetary") >= 1000000, 2)
        .otherwise(1)
        .cast("int")
        .alias("m_score"),
    )


@register(
    "lineitem_qty_discount_corr",
    oracle="""
    WITH base AS (
      SELECT CAST(l_quantity AS DECIMAL(14,2)) AS x,
             CAST(l_discount AS DECIMAL(14,2)) AS y
      FROM lineitem),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,2)) AS sx,
             CAST(sum(y) AS DECIMAL(38,2)) AS sy,
             CAST(sum(x * x) AS DECIMAL(38,4)) AS sxx,
             CAST(sum(y * y) AS DECIMAL(38,4)) AS syy,
             CAST(sum(x * y) AS DECIMAL(38,4)) AS sxy
      FROM base)
    SELECT n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS pearson_r
    FROM sums
    """,
    tags=("relational", "stats", "ml"),
)
def lineitem_qty_discount_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation with hash-gradable arithmetic (quantity vs
    discount): every moment sum is exact DECIMAL, so the final
    numerator/denominator doubles are bit-identical and the one
    multiply + sqrt + divide after them are correctly-rounded IEEE —
    where corr()'s float covariance accumulators are aggregation-order
    dependent and can never hash-match across engines. One map-side-
    combinable aggregation; the at-scale plan shape of any moment
    statistic."""
    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast(DecimalType(14, 2)).alias("x"),
        F.col("l_discount").cast(DecimalType(14, 2)).alias("y"),
    )
    sums = base.agg(
        F.count("*").alias("n"),
        F.sum("x").cast(DecimalType(38, 2)).alias("sx"),
        F.sum("y").cast(DecimalType(38, 2)).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(DecimalType(38, 4)).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(DecimalType(38, 4)).alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast(DecimalType(38, 4)).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select("n", (num / den).alias("pearson_r"))
