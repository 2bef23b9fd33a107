"""Similarity search over embedding columns (``array<float>``).

JVM-side higher-order functions for the dot products (no Python in the hot
path). Two tiers:

  * brute force: exact top-k / threshold pairs — the baseline and the
    verifier for approximate methods; O(N*Q) dot products, embarrassingly
    parallel (broadcast the query side).
  * IVF (inverted-file): assign every vector to its nearest centroid, then
    search only the probe's bucket — the 100 TB path. Centroids here are a
    deterministic subset (lowest ids) so results are oracle-verifiable; at
    scale you'd plug in k-means centroids, the plan shape is identical
    (broadcast centroids -> argmax assignment -> co-partitioned bucket join).

Embedding cosine near-dup (threshold pairs) doubles as the
embedding-based dedup operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_api_etl_spark.functions.vectors import cosine_similarity


def cosine_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup)."""
    a = emb.select(F.col(id_col).alias("d1"), F.col(vec_col).alias("v1"))
    b = emb.select(F.col(id_col).alias("d2"), F.col(vec_col).alias("v2"))
    cos = cosine_similarity("v1", "v2")
    return (
        a.crossJoin(b)
        .where(F.col("d1") < F.col("d2"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("d1", "d2", F.round("cosine", 6).alias("cosine"))
    )


def bruteforce_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding self).

    The query side is broadcast — one pass over the corpus, no shuffle of
    the big side; ranking happens per query partition.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("qv", "nv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("cosine"))
    )


def ivf_assign(
    emb: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (ties -> lowest
    centroid id). Centroids are broadcast; assignment is one scan."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv")
    )
    scored = emb.crossJoin(F.broadcast(c)).withColumn(
        "ccos", cosine_similarity(vec_col, "cv")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    return (
        scored.withColumn("arnk", F.row_number().over(w))
        .where(F.col("arnk") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("centroid_id"))
    )


def ivf_bucket_topk(
    assigned: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Shared IVF search stage: per-query top-k inside the query's own
    centroid bucket (nprobe=1). ``assigned`` is the output of
    :func:`ivf_assign`; the (small) query side is broadcast so the corpus
    never shuffles."""
    q = queries.select(F.col(id_col).alias("query_id")).join(
        assigned.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col("centroid_id"),
        ),
        "query_id",
    )
    cand = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("centroid_id"),
    )
    scored = (
        cand.join(F.broadcast(q), "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity("qv", "nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("cosine"))
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    queries: DataFrame,
    k: int,
) -> DataFrame:
    """IVF search: probe only the query's own bucket (nprobe=1).

    Deterministic centroid set = the n_centroids lowest-id vectors.
    """
    centroids = emb.orderBy(F.col(id_col)).limit(n_centroids)
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    return ivf_bucket_topk(assigned, queries, id_col, vec_col, k)


def quantize_embeddings(
    emb: DataFrame, id_col: str, vec_col: str, levels: int = 127
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q[j] = round(v[j]/s), with
    scale s = max|v|/levels stored alongside.

    The 100 TB storage path: 4x smaller than float32 (16x vs float64),
    enough precision for ANN candidate generation; re-rank the top
    candidates with the full-precision vectors. All JVM-side HOFs.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / levels).otherwise(F.lit(1.0))
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        F.transform(v, lambda x: F.round(x / scale).cast("int")).alias("qvec"),
    )


def dequantize(qvec_col: str = "qvec", scale_col: str = "scale"):
    """Column expression: approximate reconstruction v[j] ~= q[j] * scale."""
    return F.transform(
        F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)
    )


def kmeans_centroids(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 2,
    round_decimals: int = 6,
) -> DataFrame:
    """Deterministic Lloyd's k-means, reproducible on any engine.

    Init = the k lowest-id vectors (the :func:`ivf_topk` convention, labels
    keep their seed ids). Each iteration: max-cosine assignment (ties ->
    lowest centroid id), then the element-wise cluster mean ROUNDED to
    ``round_decimals`` — the rounding pins the centroid floats so an
    independent engine (the DuckDB oracle) reproduces them exactly and the
    next argmax assignment agrees; without it, summation-order differences
    in the mean would diverge run-to-run and engine-to-engine.

    Scale: per iteration, one corpus scan with broadcast centroids (the
    assignment) plus one shuffle of exploded components keyed by
    (centroid_id, pos) — a k x dim aggregate; nothing is collected to the
    driver. A cluster that loses all members drops out (both engines).
    """
    cents = emb.orderBy(F.col(id_col)).limit(k).select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col),
    )
    for _ in range(iters):
        assigned = ivf_assign(emb, cents, id_col, vec_col)
        comps = assigned.select(
            "centroid_id",
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("pos", "x"),
        )
        means = comps.groupBy("centroid_id", "pos").agg(
            F.round(F.avg("x"), round_decimals).alias("m")
        )
        cents = (
            means.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias(vec_col)
            )
            .select(F.col("centroid_id").alias(id_col), vec_col)
        )
    return cents


def ivf_kmeans_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    queries: DataFrame,
    k: int,
    iters: int = 2,
) -> DataFrame:
    """IVF with learned (k-means) centroids — the production variant of
    :func:`ivf_topk`. Centroids come from :func:`kmeans_centroids`
    (deterministic Lloyd's), so the whole query is oracle-verifiable; the
    search plan is the shared broadcast-assign + bucket equi-join.

    At 100 TB fit the centroids on a sample (a ``.sample``/``limit`` over
    the corpus feeds the same iteration loop) — the assignment cost, one
    corpus scan, is unchanged.
    """
    cents = kmeans_centroids(emb, id_col, vec_col, n_centroids, iters)
    assigned = ivf_assign(emb, cents, id_col, vec_col)
    return ivf_bucket_topk(assigned, queries, id_col, vec_col, k)


def ivf_kmeans_topk_ml(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    queries: DataFrame,
    k: int,
    max_iter: int = 5,
    seed: int = 7,
) -> DataFrame:
    """pyspark.ml KMeans variant (k-means|| init, not cross-engine
    reproducible — use where oracle parity is not required)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    model = KMeans(k=n_centroids, maxIter=max_iter, seed=seed).fit(train)
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], f"{id_col} bigint, {vec_col} array<double>"
    )
    assigned = ivf_assign(emb, cdf, id_col, vec_col)
    return ivf_bucket_topk(assigned, queries, id_col, vec_col, k)
