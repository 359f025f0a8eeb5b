"""Distributed Lloyd's k-means over the embedding corpus — the
iterative-algorithm pattern (driver-side loop over declarative
per-iteration jobs), and the real trainer for IVF centroids
(ext/similarity.ivf_topk ships a deterministic stand-in; this is the
production path).

Scale shape per iteration:
- assignment: corpus ⋈ broadcast(centroids) → argmin distance —
  one codegen pass, no shuffle of vectors;
- update: groupBy(cluster) over per-dimension sums via
  ``posexplode`` — shuffles (cluster, dim, partial-sum) triples,
  k×dim rows, independent of corpus size thanks to partial aggs.

Deterministic: init = first k vectors by vec_id, squared-L2
distance, ties to the lowest centroid id — same result every run
(no sampling, no rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from trade_data_collection_service_spark.ext.similarity import vectors


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector: (vec_id, emb, cluster, sqdist)."""
    c = centroids.select(
        F.col("cluster").alias("c_id"), F.col("centroid").alias("c_emb")
    )
    scored = corpus.join(broadcast(c)).withColumn(
        "d", _sqdist(F.col("emb"), F.col("c_emb"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("c_id").asc())
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("vec_id", "emb", F.col("c_id").alias("cluster"), F.col("d").alias("sqdist"))
    )


def update(assigned: DataFrame) -> DataFrame:
    """New centroids = per-cluster mean, via posexplode so the shuffle
    carries (cluster, dim) partial sums, not vectors."""
    exploded = assigned.select(
        "cluster", F.posexplode("emb").alias("pos", "x")
    )
    means = (
        exploded.groupBy("cluster", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "cluster",
            F.transform("pm", lambda s: s["m"]).alias("centroid"),
        )
    )
    return means


def fit(
    spark,
    sf_dir: str,
    k: int = 8,
    max_iters: int = 5,
) -> tuple[DataFrame, list[float]]:
    """Run Lloyd's iterations; returns (centroids DataFrame, inertia
    per iteration).  Centroids are cached per iteration — only the
    small k×dim frame ever lands on the driver-side loop boundary."""
    v = vectors(spark, sf_dir).select("vec_id", "emb").cache()
    centroids = (
        v.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy("vec_id"))
            .alias("cluster"),
            F.col("emb").alias("centroid"),
        )
        .cache()
    )
    inertia: list[float] = []
    for _ in range(max_iters):
        assigned = assign(v, centroids)
        inertia.append(
            assigned.agg(F.round(F.sum("sqdist"), 6).alias("j")).collect()[0]["j"]
        )
        centroids = update(assigned).cache()
        centroids.count()  # materialize so the next loop reuses it
    return centroids, inertia
