"""TPC-H breadth: the remaining queries expressible on the driver's
simplified star schema (no ``partsupp`` table and no
``l_shipmode/l_commitdate/l_receiptdate/p_container`` columns; q9 keeps
its classic shape only as the adapted variant noted on the query, and
q2/q11/q12/q16/q20/q21 live as schema-adapted variants in
queries/tpch_adapted.py — with those, all 22 TPC-H shapes are graded).
The rest are the standard formulations with parameters tuned to the
synthetic value domains.

All joins are UNHINTED: orders/customer/supplier/part scale with sf, so AQE's
runtime size stats pick broadcast below ``autoBroadcastJoinThreshold`` and
sort-merge + skew-split above it — the same code is correct at sf0.001 and at
100 TB. Only fixed-size ``nation``/``region`` (25/5 rows at every sf) carry
explicit broadcast hints.

Numeric determinism follows queries/relational.py: money sums accumulate in
exact DECIMAL (addition is associative there, unlike double), and only final
outputs/ratios are cast to double — both engines then hash bit-identically.

Reference parity: the reference delegates all analytics beyond count to its
SQL layer (see SURVEY.md §3.3); these queries are that layer's workload
re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from distributed_api_etl_spark.functions.portable import dec
from distributed_api_etl_spark.queries.registry import register, table
from distributed_api_etl_spark.session import scoped_persist


def _one_minus(col, sign: int = -1):
    # exact (5,3) decimal for (1 - discount) factors (same as relational.py)
    return (F.lit(1) + sign * dec(col, 5, 3)).cast(DecimalType(5, 3))


def _d53(v: str):
    return F.lit(v).cast(DecimalType(5, 3))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(5,3))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
      AND CAST(l_discount AS DECIMAL(5,3)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
    tags=("analytics",),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the canonical pushdown probe.
    Every predicate reaches the parquet scan (shipdate min/max row-group
    pruning does most of the I/O elimination at 100 TB); no join, no
    wide shuffle, a single partial+final agg."""
    li = table(spark, sf_dir, "lineitem")
    disc = dec("l_discount", 5, 3)
    return (
        li.where(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & disc.between(_d53("0.05"), _d53("0.07"))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(dec("l_extendedprice", 12, 2) * disc), 2).cast("double").alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT) AS l_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))), 2)
                AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    GROUP BY 1, 2, 3
    """,
    tags=("analytics",),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    The nation-pair disjunction is applied AFTER the nation joins (the two
    nation sides are independent, so pre-filtering either to {1,2} would be
    wrong only for the pair constraint — the post-join disjunction keeps
    Catalyst free to push the derivable `n_name IN ('NATION_1','NATION_2')`
    halves down via constraint propagation). nation is a 25-row broadcast at
    every sf; the three big joins shuffle on their natural keys."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate")
        .cast("date")
        .between(F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
    )
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INT) AS o_year,
           round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2))
                         * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))
                    ELSE CAST(0 AS DECIMAL(15,5)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3)))
                 AS DOUBLE), 6) AS mkt_share
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
      AND p_type = 'ECONOMY'
      AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    GROUP BY 1
    """,
    tags=("analytics",),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of a region's market for a part
    type, by order year. Two independent nation lookups (customer side scopes
    the market region, supplier side attributes the share) — both broadcast
    (25 rows); part is pre-filtered by type but joins unhinted so AQE sizes
    it. The share is a conditional-sum ratio computed in one aggregation."""
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate")
        .cast("date")
        .between(F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"))
    national = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast(DecimalType(15, 5))
    )
    return (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region.select("r_regionkey")), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year(F.col("o_orderdate").cast("date")).alias("o_year"))
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum(volume).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_revenue",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))), 2)
                AS DOUBLE) AS revenue
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("analytics",),
)
def q9_product_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): profit-by-nation-and-year over parts whose name
    matches a substring. The schema has no partsupp/ps_supplycost, so the
    profit expression degrades to discounted revenue — the plan shape
    (substring-filtered part dim, two fact joins, nation rollup) is the
    point. LIKE '%red%' cannot prune at the scan; the filter still runs
    before the join so only matching partkeys enter the shuffle."""
    part = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"))
    return (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("analytics",),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted): order-count-per-customer distribution, with the
    classic comment NOT LIKE filter replaced by an order-priority exclusion
    (the schema has no o_comment). The filter lives in the LEFT JOIN's ON
    clause — pre-filtering orders would be equivalent here, but keeping it in
    the ON documents the outer-join semantics (customers with only urgent
    orders count 0, not dropped). Two shuffles: the outer join on custkey and
    the tiny distribution re-agg on c_count."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.select("c_custkey")
        .join(
            orders.select("o_custkey", "o_orderkey", "o_orderpriority"),
            (cust.c_custkey == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3)))
               AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("analytics",),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    scalar-max-subquery pattern. Revenue totals accumulate in exact DECIMAL,
    so the `== max` equality is portable (double sums would make ties
    engine-dependent). The max is a one-row broadcast cross join; the ties-
    preserving filter then runs map-side. At scale: one shuffle for the
    per-supplier agg, the supplier join sized by AQE."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    revenue = scoped_persist(revenue)  # feeds BOTH the output and the max subquery — without the
    # cache the filtered lineitem scan + agg runs twice (plan-audited)
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp.select("s_suppkey", "s_name"), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue"), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,3)) AS DECIMAL(5,3))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("analytics",),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted: no p_container/l_shipmode in the schema): revenue
    under a 3-arm disjunction mixing part attributes and lineitem quantity.
    The OR spans both join sides, so no single arm can be pushed whole;
    Catalyst still derives the cross-side residuals — part rows must match
    `p_brand IN (...)` and lineitem rows `l_quantity BETWEEN 1 AND 30` —
    and pushes those to the scans, shrinking the join inputs before the
    full disjunction is evaluated post-join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        li.join(part.select("p_partkey", "p_brand", "p_size"), li.l_partkey == F.col("p_partkey"))
        .where(arm("Brand#1", 5, 1, 11) | arm("Brand#2", 10, 10, 20) | arm("Brand#3", 15, 20, 30))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice", 12, 2) * _one_minus(F.col("l_discount"))), 2
            )
            .cast("double")
            .alias("revenue")
        )
    )
