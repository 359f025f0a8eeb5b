"""Product-quantization ANN: codebook shape, encode compression,
recall vs exact L2 top-k, and determinism across partitionings."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.kmeans import _sqdist
from trade_data_collection_service_spark.ext.pq import (
    pq_encode,
    pq_search,
    train_codebooks,
)
from trade_data_collection_service_spark.ext.similarity import vectors

M, K_CODES, TOPK, N_Q = 4, 16, 10, 5


@pytest.fixture(scope="module")
def pq_parts(spark, sf_dir):
    books = train_codebooks(spark, sf_dir, m=M, k=K_CODES, max_iters=3)
    encoded = pq_encode(spark, sf_dir, books, m=M).localCheckpoint(eager=True)
    return books, encoded


def test_codebook_and_encode_shapes(spark, sf_dir, pq_parts):
    books, encoded = pq_parts
    n_vec = vectors(spark, sf_dir).count()
    cb = books.groupBy("subspace").count().collect()
    assert {r["subspace"] for r in cb} == set(range(M))
    assert all(r["count"] <= K_CODES for r in cb)
    # every vector compresses to exactly m codes
    per_vec = encoded.groupBy("vec_id").count().collect()
    assert len(per_vec) == n_vec
    assert all(r["count"] == M for r in per_vec)


def test_pq_recall_vs_exact(spark, sf_dir, pq_parts):
    """Tie-aware recall: clustered synthetic vectors collide into
    identical PQ codes, so members of one cell share one approx
    distance and rank order within the cell is the id tiebreak.  The
    property PQ must deliver is that a TRUE neighbor's approx distance
    is never strictly worse than the returned k-th distance — i.e.
    quantization may merge neighbors into tie classes but must not
    push them behind non-neighbors."""
    books, encoded = pq_parts
    # all approx distances for the eval queries (k = whole corpus)
    n_corpus = vectors(spark, sf_dir).count()
    got = pq_search(
        spark, sf_dir, books, encoded, n_queries=N_Q, k=n_corpus, m=M
    )
    approx_d = {}
    for r in got.collect():
        approx_d[(r["q_id"], r["vec_id"])] = r["approx_d"]
    kth = {}
    for r in got.filter(F.col("rank") == TOPK).collect():
        kth[r["q_id"]] = r["approx_d"]

    v = vectors(spark, sf_dir).select("vec_id", "emb")
    q = v.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.round("d", 6).asc(), F.col("vec_id").asc()
    )
    exact = {}
    rows = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("d", _sqdist("emb", "q_emb"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK)
        .collect()
    )
    for r in rows:
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])

    assert set(kth) == exact.keys()
    recalls = []
    for qid, true_ids in exact.items():
        hit = sum(
            1
            for vid in true_ids
            if approx_d[(qid, vid)] <= kth[qid] + 1e-9
        )
        recalls.append(hit / TOPK)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, recalls


def test_pq_search_deterministic_across_partitionings(spark, sf_dir, pq_parts):
    books, encoded = pq_parts
    a = pq_search(spark, sf_dir, books, encoded, n_queries=N_Q, k=TOPK, m=M).collect()
    b = pq_search(
        spark,
        sf_dir,
        books.repartition(7),
        encoded.repartition(5),
        n_queries=N_Q,
        k=TOPK,
        m=M,
    ).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert {key(r): (r["vec_id"], r["approx_d"]) for r in a} == {
        key(r): (r["vec_id"], r["approx_d"]) for r in b
    }
