

def test_hybrid_rrf_fuses_both_sides(spark, sf_dir, tmp_path):
    """RRF properties on the fixture: dense ranks 1..k per query, no
    self-retrieval, the fused score is exactly the sum of the two
    reciprocal-rank terms — and on a planted corpus a doc dominating
    BOTH sides fuses to rank 1."""
    from trade_data_collection_service_spark.ext.similarity import (
        hybrid_rrf_topk,
    )

    rows = hybrid_rrf_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(r["doc_id"] != q for r in rs)
        scores = [r["rrf_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            want = (1.0 / (60 + r["sparse_rank"]) if r["sparse_rank"] else 0)
            want += (1.0 / (60 + r["dense_rank"]) if r["dense_rank"] else 0)
            assert abs(r["rrf_score"] - want) < 1e-6
        # fusion really mixes: at least one result per query carries a
        # rank from each side somewhere in the list
        assert any(r["sparse_rank"] is not None for r in rs)
        assert any(r["dense_rank"] is not None for r in rs)

    # planted: doc 5 is byte-identical text AND identical embedding to
    # query doc 0 -> rank 1 on both sides -> fused rank 1
    import math

    docs = [(i, f"filler{i} words here nothing alike {i}", "en", "s")
            for i in range(1, 8)]
    docs.insert(0, (0, "the planted duplicate document text", "en", "s"))
    docs[5] = (5, "the planted duplicate document text", "en", "s")
    spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    embs = []
    for i in range(8):
        base = [math.sin(i * 1.7 + d) for d in range(8)]
        embs.append((i, [float(x) for x in base], 0))
    embs[5] = (5, embs[0][1], 0)  # same embedding as the query
    spark.createDataFrame(
        embs, ["vec_id", "embedding", "label"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    planted = hybrid_rrf_topk(spark, str(tmp_path), n_queries=1, k=3)
    top = planted.collect()[0]
    assert top["q_id"] == 0 and top["doc_id"] == 5 and top["rank"] == 1
    assert top["sparse_rank"] == 1 and top["dense_rank"] == 1


def test_hybrid_indexed_consistent_with_brute(spark, sf_dir, tmp_path):
    """VERDICT r10 #1: the indexed-serving hybrid must agree with the
    brute evaluation baseline on the fixture — EXACTLY on the sparse
    side (stored postings are the from-text censuses at rest, scored
    by the shared bm25_weight), recall-style on the fused top-k (the
    dense side trades brute cosine for IVF-PQ approximation)."""
    from trade_data_collection_service_spark.ext.pq import (
        write_ivfpq_index,
    )
    from trade_data_collection_service_spark.ext.similarity import (
        hybrid_rrf_indexed_topk,
        hybrid_rrf_topk,
    )
    from trade_data_collection_service_spark.ext.text import (
        bm25_ranks_indexed_multi,
        with_tokens,
        write_bm25_index,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sparse = str(tmp_path / "bm25")
    write_bm25_index(docs, sparse)
    dense = str(tmp_path / "ivfpq")
    centroids, books = write_ivfpq_index(spark, sf_dir, dense)

    # sparse side: indexed ranks == the brute hybrid's from-text ranks
    qterms = with_tokens(docs.filter(F.col("doc_id") < 3)).select(
        F.col("doc_id").alias("q_id"),
        F.explode(F.array_distinct("tokens")).alias("term"),
    )
    sd = bm25_ranks_indexed_multi(
        spark, sparse, qterms, depth=20, exclude_self=True
    )
    brute = hybrid_rrf_topk(spark, sf_dir, depth=20)
    brute_sparse = {
        (r["q_id"], r["doc_id"]): r["sparse_rank"]
        for r in brute.collect()
        if r["sparse_rank"] is not None and r["sparse_rank"] <= 20
    }
    idx_sparse = {
        (r["q_id"], r["doc_id"]): r["r_s"] for r in sd.collect()
    }
    # every sparse rank the brute fusion surfaced matches the index's
    for key, rank in brute_sparse.items():
        assert idx_sparse.get(key) == rank, (key, rank, idx_sparse.get(key))

    # fused top-k: recall-style agreement (ANN dense side is
    # approximate, so require strong but not exact overlap)
    fused = hybrid_rrf_indexed_topk(
        spark, sf_dir, sparse, dense, centroids, books
    ).collect()
    by_q_idx = {}
    for r in fused:
        by_q_idx.setdefault(r["q_id"], set()).add(r["doc_id"])
        assert r["doc_id"] != r["q_id"]  # no self-retrieval
    by_q_brute = {}
    for r in brute.collect():
        by_q_brute.setdefault(r["q_id"], set()).add(r["doc_id"])
    assert set(by_q_idx) == set(by_q_brute)
    for q in by_q_brute:
        inter = len(by_q_idx[q] & by_q_brute[q])
        assert inter / len(by_q_brute[q]) >= 0.5, (
            q, sorted(by_q_idx[q]), sorted(by_q_brute[q])
        )


def test_retrieval_eval_hand_computed(spark):
    """Exact metric check on planted rankings: q1 has relevant docs at
    ranks 1 and 3 of k=3 (recall 2/3, MRR 1, nDCG hand-computed), q2
    has none (all-zero row emitted, not dropped)."""
    import math

    from trade_data_collection_service_spark.ext.similarity import (
        retrieval_eval,
    )

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2),
         (2, 22, 3)],
        ["q_id", "doc_id", "rank"],
    )
    truth = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 77), (2, 78), (2, 79)],
        ["q_id", "doc_id"],
    )
    out = {r["q_id"]: r.asDict() for r in retrieval_eval(results, truth, k=3).collect()}
    g = lambda r: round(1.0 / math.log2(r + 1.0), 12)  # noqa: E731
    idcg = g(1) + g(2) + g(3)
    assert out[1]["n_relevant_found"] == 2
    assert abs(out[1]["recall_at_k"] - 2 / 3) < 1e-12
    assert out[1]["mrr"] == 1.0
    assert abs(out[1]["ndcg_at_k"] - (g(1) + g(3)) / idcg) < 1e-12
    assert out[2] == {
        "q_id": 2,
        "n_relevant_found": 0,
        "recall_at_k": 0.0,
        "mrr": 0.0,
        "ndcg_at_k": 0.0,
    }
