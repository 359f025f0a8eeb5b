from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.cluster import (
    assign_clusters,
    connected_components,
    keep_best_per_cluster,
)


def test_connected_components_chain(spark):
    # A 6-node chain (diameter 5 — forces several propagation rounds),
    # a triangle, and an isolated pair.
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # chain
        (10, 11), (11, 12), (10, 12),             # triangle
        (20, 21),                                 # pair
    ]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_assign_clusters_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], ["doc_id"])
    pairs = spark.createDataFrame([(2, 4)], ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(docs, pairs).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5}


def test_keep_best_quality_and_tiebreak(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        ["doc_id", "cluster_id"],
    )
    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.1), (6, 1.0)],
        ["doc_id", "quality_score"],
    )
    rows = keep_best_per_cluster(scored, clusters).collect()
    got = {r["cluster_id"]: (r["keep_doc_id"], r["n_docs"]) for r in rows}
    # cluster 1: quality tie 2 vs 3 -> lowest doc_id wins; cluster 4:
    # tie -> doc 4; singleton cluster 6 excluded (n_docs > 1 filter).
    assert got == {1: (2, 3), 4: (4, 2)}
    assert all(r["best_quality"] > 0 for r in rows)
