"""Duplicate-cluster resolution: near-dup pairs → connected
components → one canonical document per cluster.

Pair emitters (exact digest groups, MinHash+LSH, SimHash) find EDGES;
a training-data dedup pipeline needs the components of that graph —
"these 5 docs are all the same article" — and then a policy choice of
which member to keep.  The reference has no analog (single-node
tooling stops at pairs); this is the standard distributed follow-up
(MapReduce connected-components family; the min-label-propagation
below is the classic "hash-to-min" variant).

Scale notes:
- Each iteration is one equi-join (labels ⋈ edges, shuffle on node
  id) + one groupBy-min — both map-side-combinable.  Iterations =
  graph diameter.  Near-dup clusters are shallow (a viral doc links
  to its copies directly, diameter 2-3), so the loop converges in
  single digits; the O(log n)-round large-star/small-star contraction
  is the upgrade path if components with long chains appear.
- Labels are eagerly localCheckpoint-ed per iteration: the iterative
  lineage stays O(1)-deep (no per-action re-analysis of the upstream
  pair-generation plan), and superseded blocks are released by the
  ContextCleaner when the previous frame goes unreferenced.
- The convergence probe is ONE scalar count per iteration —
  acceptable driver traffic for an iterative algorithm (same budget
  as ext/kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for every node appearing in ``pairs``,
    where cluster_id is the component's minimum node id (the DuckDB
    recursive-CTE oracle computes min-reachable-id, the same
    fixpoint)."""
    # Eager localCheckpoint, not cache: it MATERIALIZES the (possibly
    # very expensive) pair-generation lineage once and truncates it —
    # otherwise every iteration's action re-analyzes the full upstream
    # plan (measured 26 s → ~7 s for LSH-pairs input at sf0.1).
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    # r14 optimization (guide §2.4, §1.2): the old iteration was
    # three shuffles (edges⋈labels, groupBy(a), labels⋈nbr_min) plus
    # a TWO-shuffle join probe (new⋈old + count) per round.  min(own,
    # min(neighbors)) is one grouped minimum over the union of the
    # label table with the neighbor-propagated labels — same fixpoint,
    # one join + one map-side-combined groupBy per round — and since
    # labels only ever DECREASE (F.min), Σ cluster_id is strictly
    # monotone until the fixpoint: "no label changed" ⇔ the exact
    # decimal sum is unchanged, a scan-agg of the just-materialized
    # checkpoint instead of a join of two generations.
    prev_sum = None
    for _ in range(max_iter):
        nbr = edges.join(
            labels.select(
                F.col("doc_id").alias("b"),
                F.col("cluster_id").alias("lbl"),
            ),
            "b",
        ).select(F.col("a").alias("doc_id"), "lbl")
        labels = (
            labels.select("doc_id", F.col("cluster_id").alias("lbl"))
            .unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("lbl").alias("cluster_id"))
            .localCheckpoint(eager=True)  # keeps the iterative plan O(1)-deep
        )
        new_sum = labels.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond")
    — the O(log n)-round upgrade path over hash-to-min propagation
    for graphs with long chains.

    Each round is two edge rewrites (one shuffle each, on node id):
    - large-star: every node links its LARGER neighbors to its
      neighborhood minimum — tall trees flatten geometrically;
    - small-star: every node links its smaller-or-equal neighbors
      (and itself) to the minimum — stars contract onto their root.
    The edge multiset converges to (node → component-min) stars;
    termination is detected by the edge-set hash stabilizing (one
    scalar aggregate per round, same driver budget as the
    propagation loop's convergence count).

    Output: (doc_id, cluster_id), cluster_id = component min —
    identical contract to ``connected_components`` (property-tested
    against union-find)."""
    e = (
        pairs.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(edges: DataFrame) -> DataFrame:
        return edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def _mins(edges_sym: DataFrame) -> DataFrame:
        # m(u) = min(N(u) ∪ {u})
        return (
            edges_sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )

    def _fingerprint(edges: DataFrame) -> tuple:
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            # XOR fold: order-independent, cannot overflow (ANSI mode
            # rejects a long SUM of 64-bit hashes)
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    fp = None
    for _ in range(max_iter):
        sym = _sym(e)
        mins = _mins(sym)
        # large-star: (v, m(u)) for v ∈ N(u), v > u
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = (
            large.select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sym = _sym(e)
        mins = _mins(sym)
        # small-star: (v, m(u)) for v ∈ N(u), v ≤ u, plus (u, m(u))
        small = (
            sym.join(mins, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select("u", F.col("m").alias("v")))
        )
        e = (
            small.select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_fp = _fingerprint(e)
        if new_fp == fp:
            break
        fp = new_fp
    # stars: every non-root points at its component min; roots appear
    # only on the right — add them as self-labeled.
    nodes = pairs.select(F.col(src).alias("doc_id")).union(
        pairs.select(F.col(dst).alias("doc_id"))
    ).distinct()
    return (
        nodes.join(
            e.select(F.col("v").alias("doc_id"), F.col("u").alias("cluster_id")),
            "doc_id",
            "left",
        )
        .groupBy("doc_id")
        .agg(F.min(F.coalesce("cluster_id", "doc_id")).alias("cluster_id"))
    )


def assign_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Every doc gets a cluster_id: its component min if it appears in
    any pair, else itself (singleton cluster)."""
    labels = connected_components(pairs)
    return (
        docs.select(id_col)
        .join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )


def keep_best_per_cluster(
    scored_docs: DataFrame,
    clusters: DataFrame,
    quality_col: str = "quality_score",
) -> DataFrame:
    """Canonical-document selection: per multi-doc cluster, keep the
    highest-quality member (ties → lowest doc_id).  Implemented as a
    max-of-struct aggregation — map-side partial, no window sort —
    the same shape operators/dedup.py uses for last-write-wins.

    Output: (cluster_id, keep_doc_id, n_docs, best_quality)."""
    j = clusters.join(scored_docs, "doc_id")
    best = F.max(
        F.struct(F.col(quality_col).alias("q"), (-F.col("doc_id")).alias("neg_id"))
    )
    return (
        j.groupBy("cluster_id")
        .agg(
            best.alias("best"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            "cluster_id",
            (-F.col("best.neg_id")).alias("keep_doc_id"),
            F.col("n_docs"),
            F.col("best.q").alias("best_quality"),
        )
        .orderBy("cluster_id")
    )


def keep_doc_per_cluster(
    scored_docs: DataFrame,
    clusters: DataFrame,
    quality_col: str = "quality_score",
) -> DataFrame:
    """Like keep_best_per_cluster but over ALL clusters (singletons
    keep themselves): the winner-per-cluster projection used by the
    end-to-end curation pipeline.  Output: (doc_id, cluster_id,
    n_docs, quality) for the kept doc of every cluster."""
    j = clusters.join(scored_docs, "doc_id")
    best = F.max(
        F.struct(F.col(quality_col).alias("q"), (-F.col("doc_id")).alias("neg_id"))
    )
    return (
        j.groupBy("cluster_id")
        .agg(best.alias("best"), F.count(F.lit(1)).alias("n_docs"))
        .select(
            (-F.col("best.neg_id")).alias("doc_id"),
            "cluster_id",
            "n_docs",
            F.col("best.q").alias(quality_col),
        )
    )
