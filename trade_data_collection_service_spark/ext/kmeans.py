"""Distributed Lloyd's k-means over the embedding corpus — the
iterative-algorithm pattern (driver-side loop over declarative
per-iteration jobs), and the real trainer for IVF centroids
(ext/similarity.ivf_topk ships a deterministic stand-in; this is the
production path).

Scale shape per iteration:
- assignment: literal-folded argmin over the k×dim centroid model
  (r15) — one map-only pass, no join, no shuffle of vectors;
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

from trade_data_collection_service_spark.ext.similarity import (
    _one_pass,
    _sql_structs,
    _sql_vec,
    vectors,
)


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
    distance differences from summation order can't flip a cluster.

    r15 (guide §2.4, the NB-dense literal precedent): the centroid
    frame is MODEL state (k × dim doubles, dimension-bounded — the
    GD-scalar driver budget), so it is collected once and folded into
    the plan as literals; the argmin is one ``array_min`` over k
    (rd, c_id, d) structs inside a single projection.  The r14 shape
    (broadcast join expanding k× candidate rows + a grouped
    struct-minimum that planned as SortAggregate pairs around an
    Exchange on vec_id) shuffled one embedding-bearing row per vector
    per call; this shuffles nothing — assignment is map-only.  Same
    lexicographic (rd, c_id) winner over the same IEEE distances
    (:func:`~trade_data_collection_service_spark.ext.similarity._lit_vec`),
    payload (emb) now rides from the row it always equalled, so
    assignments, inertia and downstream centroids are bit-identical
    (oracle twins + property tests unchanged)."""
    ctype = dict(centroids.dtypes)["cluster"]
    rows = centroids.select("cluster", "centroid").collect()
    if not rows:
        return corpus.select(
            "vec_id",
            "emb",
            F.lit(None).cast(ctype).alias("cluster"),
            F.lit(None).cast("double").alias("sqdist"),
        ).filter(F.lit(False))
    cands = _sql_structs(
        [
            (
                ("c_id", f"CAST({int(r['cluster'])} AS {ctype})"),
                ("c_emb", _sql_vec(r["centroid"])),
            )
            for r in rows
        ]
    )
    scored = F.transform(
        cands,
        lambda c: F.struct(
            _sqdist(F.col("emb"), c["c_emb"]).alias("d"),
            c["c_id"].alias("c_id"),
        ),
    )
    w = F.array_min(
        F.transform(
            scored,
            lambda s: F.struct(
                F.round(s["d"], 6).alias("rd"),
                s["c_id"].alias("c_id"),
                s["d"].alias("d"),
            ),
        )
    )
    # the winner rides as ONE struct through the barrier (two direct
    # field extractions would embed — and evaluate — the argmin twice
    # inside the same projection); the field split above the Generate
    # is a cheap read of the materialized value
    return _one_pass(corpus, F.col("vec_id"), F.col("emb"), w.alias("w")).select(
        "vec_id",
        "emb",
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
