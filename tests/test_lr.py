"""Trained quality filter: determinism, learning progress, and a
model that genuinely beats the majority-class baseline on its own
labels.
"""

from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.lr import (
    lr_features,
    quality_lr_eval,
    train_quality_lr,
)


def test_training_is_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w1 = train_quality_lr(docs, iters=6)
    w2 = train_quality_lr(docs, iters=6)
    assert w1 == w2
    # repartitioning must not change the trajectory (decimal-exact
    # gradient sums are order-insensitive)
    w3 = train_quality_lr(docs.repartition(7), iters=6)
    assert w1 == w3


def test_more_iterations_reduce_training_error(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = lr_features(docs).cache()

    def errors(w):
        z = (
            (F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1"))
            + F.lit(w[2]) * F.col("x2")
        ) + F.lit(w[3]) * F.col("x3")
        p = F.greatest(
            F.least(F.lit(0.25) * z + F.lit(0.5), F.lit(1.0)),
            F.lit(0.0),
        )
        pred = (p >= 0.5).cast("double")
        return feats.agg(
            F.sum(F.abs(pred - F.col("y"))).alias("e")
        ).collect()[0]["e"]

    early = errors(train_quality_lr(docs, iters=2))
    late = errors(train_quality_lr(docs, iters=20))
    assert late < early
    feats.unpersist()


def test_eval_beats_majority_baseline(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = quality_lr_eval(spark, sf_dir).collect()[0]
    n_pos = lr_features(docs).filter(F.col("y") == 1.0).count()
    majority = max(n_pos, row["n_docs"] - n_pos) / row["n_docs"]
    assert row["tp"] > 0, "model must predict some positives"
    assert row["accuracy"] > majority
    # confusion cells are a partition of the corpus
    assert (
        row["tp"] + row["fp"] + row["fn"] + row["tn"] == row["n_docs"]
    )


def test_lr_filter_report_invariants(spark, sf_dir):
    """Per-source keep report: kept ⊆ docs, rates in [0,1], higher
    mean score → (weakly) higher keep expectation across the corpus,
    and the report is deterministic."""
    from trade_data_collection_service_spark.ext.lr import (
        quality_lr_filter,
    )

    rows = quality_lr_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0.0 <= r["kept_rate"] <= 1.0
        assert 0.0 <= r["mean_score"] <= 1.0
    total_docs = sum(r["n_docs"] for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert total_docs == docs.count()
    again = quality_lr_filter(spark, sf_dir).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_precomputed_weights_skip_training_same_results(spark, sf_dir):
    """Serve/eval accept precomputed weights (training is
    deterministic, so sharing cannot change results) — the serving
    split that saves the 20 training aggregates per consumer."""
    from trade_data_collection_service_spark.ext.lr import (
        quality_lr_eval,
        quality_lr_scores,
        train_quality_lr,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = train_quality_lr(docs)
    with_w = quality_lr_scores(spark, sf_dir, weights=w).collect()
    trained = quality_lr_scores(spark, sf_dir).collect()
    assert sorted(map(str, with_w)) == sorted(map(str, trained))
    e1 = quality_lr_eval(spark, sf_dir, weights=w).collect()[0]
    e2 = quality_lr_eval(spark, sf_dir).collect()[0]
    assert e1 == e2
