"""Graded graph-analytics queries beyond dedup clustering.

Connected components (two variants) grade under the dedup family
(queries/dedup.py); this module holds general graph analytics over the
relational tables — currently fixed-point PageRank on the customer-supplier
interaction graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_api_etl_spark.operators.graph import PR_SCALE, pagerank_fixed_point
from distributed_api_etl_spark.queries.registry import register, table

PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolled fixed-point PageRank (PR_ITERS rounds) in DuckDB SQL —
    integer arithmetic end to end, mirroring pagerank_fixed_point exactly."""
    scale = PR_SCALE
    parts = [
        """e0 AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""",
        "sym AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0)",
        "deg AS (SELECT a, count(*) AS d FROM sym GROUP BY a)",
        "nn AS (SELECT count(*) AS n FROM deg)",
        f"pr0 AS (SELECT a AS node, {scale} // (SELECT n FROM nn) AS pr FROM deg)",
    ]
    for t in range(PR_ITERS):
        parts.append(
            f"""agg{t} AS (
              SELECT s.b AS node, CAST(sum(p.pr // d.d) AS BIGINT) AS insum
              FROM sym s JOIN deg d ON d.a = s.a JOIN pr{t} p ON p.node = s.a
              GROUP BY s.b)"""
        )
        parts.append(
            f"""pr{t + 1} AS (
              SELECT node,
                     (15 * {scale}) // (100 * (SELECT n FROM nn))
                     + (85 * insum) // 100 AS pr
              FROM agg{t})"""
        )
    return f"""
    WITH {', '.join(parts)}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(node // 2 AS BIGINT) AS entity_id,
           CAST(pr AS BIGINT) AS pr_fp,
           CAST(pr AS DOUBLE) / {float(scale)} AS pr
    FROM pr{PR_ITERS}
    """


@register(
    "supply_graph_pagerank",
    oracle=_pagerank_oracle(),
    bench=True,
    tags=("graph", "ml"),
)
def supply_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the customer-supplier graph (edges =
     'customer ordered from supplier' via orders x lineitem; node ids
    disambiguated by parity). The graded columns carry the EXACT integer
    ranks — the property float PageRank can never grade — plus the double
    rendering; top ranks surface the hub suppliers serving the most
    distinct high-degree customers.

    Scale: |E| distinct edges after one orders-lineitem join; each of the
    3 rounds shuffles only the |V|-sized rank frame against the persisted,
    pre-partitioned edge list (operators/graph.py:pagerank_fixed_point).
    """
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    # NO .distinct() here: pagerank_fixed_point's repartition("a") +
    # dropDuplicates([a, b]) already dedups partition-locally (hash(a) is a
    # valid distribution for (a, b) groups), so a dedicated distinct would
    # add a full |E| exchange to strip the ~2% within-order duplicate
    # (customer, supplier) pairs that ride the one necessary exchange for
    # free (measured round 6: -5.5 MB shuffle at sf0.1, hash unchanged)
    edges = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        (F.col("o_custkey") * 2).alias("d1"),
        (F.col("l_suppkey") * 2 + 1).alias("d2"),
    )
    pr = pagerank_fixed_point(edges, "d1", "d2", iters=PR_ITERS)
    return pr.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("div(node, 2)").cast("bigint").alias("entity_id"),
        "pr_fp",
        "pr",
    )


@register(
    "supply_graph_triangles",
    oracle="""
    WITH lo AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    und AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM lo a JOIN lo b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)
      GROUP BY n
    ),
    orient AS (
      SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                  THEN u ELSE v END AS a,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                  THEN v ELSE u END AS b,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                  THEN dv.d ELSE du.d END AS db
      FROM und
      JOIN deg du ON du.n = u
      JOIN deg dv ON dv.n = v
    ),
    tri AS (
      SELECT o1.a AS x, o1.b AS y, o2.b AS z
      FROM orient o1
      JOIN orient o2 ON o1.a = o2.a
       AND ((o1.db < o2.db) OR (o1.db = o2.db AND o1.b < o2.b))
      WHERE EXISTS (SELECT 1 FROM orient o3 WHERE o3.a = o1.b AND o3.b = o2.b)
    ),
    pern AS (
      SELECT n, count(*) AS t
      FROM (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY n
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(p.t, 0) AS BIGINT) AS triangles
    FROM supplier s
    JOIN deg d ON d.n = s.s_suppkey
    LEFT JOIN pern p ON p.n = s.s_suppkey
    """,
    tags=("graph", "ml"),
)
def supply_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts on the supplier co-supply graph (suppliers sharing an
    order), via degree-ordered orientation (operators/graph.py:
    triangle_counts) — the skew-proof formulation whose wedge work is
    O(|E|^1.5) worst-case instead of sum-of-degree-squared. The per-order
    supplier self-join is bounded by lines-per-order (<= 7 in TPC-H-shaped
    data), so edge construction is linear in lineitem."""
    from distributed_api_etl_spark.operators.graph import triangle_counts

    lo = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    rhs = lo.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    from distributed_api_etl_spark.session import scoped_persist

    pairs = scoped_persist(  # feeds triangle_counts AND the degree branch —
        # without the persist the lineitem self-join + distinct runs twice
        lo.join(rhs, (F.col("l_orderkey") == F.col("o2"))
                & (F.col("l_suppkey") < F.col("s2")))
        .select(F.col("l_suppkey").alias("d1"), F.col("s2").alias("d2"))
        .distinct()
    )
    tri = triangle_counts(pairs)
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(tri, supp.s_suppkey == tri.node)
        .join(
            pairs.select(F.explode(F.array("d1", "d2")).alias("n"))
            .groupBy("n")
            .agg(F.count("*").alias("degree")),
            F.col("s_suppkey") == F.col("n"),
        )
        .select("s_suppkey", "s_name", F.col("degree").cast("long").alias("degree"), "triangles")
    )
