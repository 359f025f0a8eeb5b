import math

from trade_data_collection_service_spark.ext.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    vectors,
)


def test_brute_force_topk_shape_and_order(spark, sf_dir):
    rows = brute_force_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        assert [r["rank"] for r in rs] == [1, 2, 3]
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r["vec_id"] != q for r in rs)
        assert all(-1.0 <= r["sim"] <= 1.0 for r in rs)


def test_brute_force_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = {
        r["vec_id"]: np.array(r["emb"])
        for r in vectors(spark, sf_dir).collect()
    }
    rows = brute_force_topk(spark, sf_dir, n_queries=1, k=3).collect()
    q = emb[0]
    sims = {
        vid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for vid, v in emb.items()
        if vid != 0
    }
    expected = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:3]
    got = [(r["vec_id"], r["sim"]) for r in rows]
    for (evid, esim), (gvid, gsim) in zip(expected, got):
        assert evid == gvid
        assert math.isclose(esim, gsim, abs_tol=2e-6)


def test_ivf_searches_only_own_bucket(spark, sf_dir):
    rows = ivf_topk(spark, sf_dir).collect()
    assert rows
    # each query returns results from exactly one bucket
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], set()).add(r["bucket"])
    assert all(len(b) == 1 for b in by_q.values())


def test_neardup_contains_planted(spark, sf_dir):
    rows = embedding_neardup_pairs(spark, sf_dir).collect()
    got = {(r["vec_a"], r["vec_b"]): r["sim"] for r in rows}
    # every 50th vector has an identical copy at +1000000 (both in the
    # %5 sample) -> cosine 1.0
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    planted = {(v, v + 1000000) for v in range(0, n, 50)}
    for p in planted:
        assert p in got
        assert got[p] >= 0.999999


def test_neardup_no_nested_loop_join(spark, sf_dir):
    """The LSH rewrite's whole point (VERDICT r1 item 2): candidate
    generation is an equi-join on (band, key) — the plan must not
    contain an all-pairs BroadcastNestedLoopJoin or CartesianProduct."""
    plan = embedding_neardup_pairs(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:4000]
    assert "CartesianProduct" not in plan, plan[:4000]


def test_neardup_lsh_recall_equals_brute_force(spark, sf_dir):
    """On the fixture, LSH candidates + cosine verify returns exactly
    the brute-force pair set (all positives are exact duplicates,
    which agree on every sign band)."""
    from pyspark.sql import functions as F
    from trade_data_collection_service_spark.ext.similarity import _dot, vectors

    lsh = {
        (r["vec_a"], r["vec_b"], r["sim"])
        for r in embedding_neardup_pairs(spark, sf_dir).collect()
    }
    v = vectors(spark, sf_dir)
    planted = v.filter(F.col("vec_id") % 50 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    corpus = v.unionByName(planted).filter(F.col("vec_id") % 5 == 0)
    a = corpus.select(
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = corpus.select(
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    brute = {
        (r["vec_a"], r["vec_b"], r["sim"])
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "sim",
            F.round(_dot("emb_a", "emb_b") / (F.col("nrm_a") * F.col("nrm_b")), 6),
        )
        .filter(F.col("sim") >= 0.99)
        .select("vec_a", "vec_b", "sim")
        .collect()
    }
    assert lsh == brute


def test_ivf_trained_topk_uses_trained_centroids(spark, sf_dir):
    from trade_data_collection_service_spark.ext.similarity import ivf_trained_topk

    rows = ivf_trained_topk(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], set()).add(r["bucket"])
    # nprobe=1: each query searches exactly one (trained) bucket
    assert all(len(b) == 1 for b in by_q.values())
    # trained cluster ids are 1..8, not raw vec_ids
    assert all(1 <= r["bucket"] <= 8 for r in rows)


def test_semdedup_drops_planted_copies(spark, sf_dir):
    from trade_data_collection_service_spark.ext.similarity import semdedup

    rows = {r["vec_id"]: r for r in semdedup(spark, sf_dir).collect()}
    planted = [v for v in rows if v >= 1000000]
    assert planted, "fixture plants copies of every 50th vector"
    # every planted exact copy (cos=1.0) must be dropped, and its
    # original (lower id, same cluster) kept
    for v in planted:
        assert rows[v]["kept"] is False
        assert rows[v - 1000000]["kept"] is True
        assert rows[v]["cluster"] == rows[v - 1000000]["cluster"]


def test_ann_recall_bounds_and_exhaustive_probe(spark, sf_dir):
    from trade_data_collection_service_spark.ext.similarity import ann_recall

    rows = ann_recall(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_hits"] == round(r["recall_at_k"] * 3)
    # probing every bucket searches the whole corpus: recall == 1
    full = ann_recall(spark, sf_dir, n_centroids=8, nprobe=8).collect()
    assert all(r["recall_at_k"] == 1.0 for r in full)


def test_ann_recall_curve_monotone_and_consistent(spark, sf_dir):
    from trade_data_collection_service_spark.ext.similarity import (
        ann_recall,
        ann_recall_curve,
    )

    rows = ann_recall_curve(spark, sf_dir, max_nprobe=8).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(len(v) for v in by_q.values()) == {8}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["nprobe"])
        recalls = [r["recall_at_k"] for r in rs]
        # candidate sets nest in nprobe, so recall never decreases
        assert recalls == sorted(recalls), (q, recalls)
        assert all(0.0 <= x <= 1.0 for x in recalls)
        # probing all 8 buckets searches the whole corpus: recall == 1
        assert recalls[-1] == 1.0
    # the nprobe=1 level IS ann_recall's single-point evaluation
    single = {
        r["q_id"]: (r["n_hits"], r["recall_at_k"])
        for r in ann_recall(spark, sf_dir, nprobe=1).collect()
    }
    level1 = {
        r["q_id"]: (r["n_hits"], r["recall_at_k"])
        for r in rows
        if r["nprobe"] == 1
    }
    assert level1 == single
