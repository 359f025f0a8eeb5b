

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
