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
    """Nearest centroid per vector: (vec_id, emb, cluster, sqdist).

    The argmin ranks on the distance ROUNDED to 6 decimals (ties to
    the lowest centroid id) so assignments are bit-portable across
    engines — the DuckDB oracle twin ranks identically, and sub-1e-6
    distance differences from summation order can't flip a cluster."""
    c = centroids.select(
        F.col("cluster").alias("c_id"), F.col("centroid").alias("c_emb")
    )
    scored = corpus.join(broadcast(c)).withColumn(
        "d", _sqdist(F.col("emb"), F.col("c_emb"))
    )
    # r14 (guide §2.3 aggregate-before-shuffle): the argmin used to be
    # a window (row_number over the k×-expanded candidates), which
    # SHUFFLES every candidate row — k× the corpus, embeddings
    # included — then sorts.  A grouped struct-minimum is the same
    # lexicographic (rounded distance, centroid id) pick — (rd, c_id)
    # is unique per group, so the payload fields never participate in
    # the comparison — but partial aggregation reduces to ONE row per
    # vector map-side: the exchange carries 1/k of the rows and 1/k
    # of the embedding bytes.  Winner rows are identical, so
    # assignments, inertia and downstream centroids are unchanged.
    best = scored.groupBy("vec_id").agg(
        F.min(
            F.struct(
                F.round(F.col("d"), 6).alias("rd"),
                F.col("c_id").alias("c_id"),
                F.col("d").alias("d"),
                F.col("emb").alias("emb"),
            )
        ).alias("w")
    )
    return best.select(
        "vec_id",
        F.col("w.emb").alias("emb"),
        F.col("w.c_id").alias("cluster"),
        F.col("w.d").alias("sqdist"),
    )


def update(assigned: DataFrame, round_to: int | None = None) -> DataFrame:
    """New centroids = per-cluster mean, via posexplode so the shuffle
    carries (cluster, dim) partial sums, not vectors.

    ``round_to`` rounds each mean coordinate — set it (6) when the
    trained centroids must be reproducible across engines (the IVF
    oracle twin): partial-aggregation order perturbs the last float
    bits, and rounding collapses those differences identically in
    Spark and DuckDB."""
    exploded = assigned.select(
        "cluster", F.posexplode("emb").alias("pos", "x")
    )
    mean = F.avg("x")
    if round_to is not None:
        mean = F.round(mean, round_to)
    means = (
        exploded.groupBy("cluster", "pos")
        .agg(mean.alias("m"))
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
    round_to: int | None = None,
) -> tuple[DataFrame, list[float]]:
    """Run Lloyd's iterations; returns (centroids DataFrame, inertia
    per iteration).  Centroids are cached per iteration — only the
    small k×dim frame ever lands on the driver-side loop boundary —
    and the PREVIOUS iteration's cache is unpersisted once the new one
    is materialized, so cached frames don't accumulate across
    iterations (ADVICE r1)."""
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
        prev = centroids
        centroids = update(assigned, round_to).cache()
        centroids.count()  # materialize so the next loop reuses it
        prev.unpersist()
    v.unpersist()
    return centroids, inertia
