"""Stored-model serve path for the Naive-Bayes source classifier
(VERDICT r11 #4): stored ≡ in-query bit-for-bit, the push_terms
In-list serving shape changes nothing, and an empty build refuses."""

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.text import (
    nb_score_indexed,
    source_nb,
    write_nb_index,
)


@pytest.fixture(scope="module")
def nb_index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nb_idx")) + "/index"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_nb_index(docs, path)
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stored_model_identical_to_in_query(spark, sf_dir, nb_index):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stored = _rows(nb_score_indexed(spark, nb_index, docs))
    inline = _rows(source_nb(spark, sf_dir))
    assert stored == inline


def test_push_terms_serving_batch_identical(spark, sf_dir, nb_index):
    # a small serving batch with the batch-vocab In-list pushed into
    # the term-sorted census scan scores identically to the full scan
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 25 == 0)
    pushed = _rows(nb_score_indexed(spark, nb_index, batch, push_terms=True))
    plain = _rows(nb_score_indexed(spark, nb_index, batch))
    assert pushed == plain
    assert len(pushed) == batch.count()


def test_unseen_terms_score_via_smoothing(spark, nb_index, sf_dir):
    # a doc whose terms never appear in the training census must
    # still get a prediction (Laplace floor ln(1/(n_s+V)) per term)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    novel = docs.limit(1).select(
        "doc_id",
        "source",
        F.lit("zzqx-unseen wvvk-unseen qqjm-unseen").alias("text"),
    )
    rows = nb_score_indexed(spark, nb_index, novel).collect()
    assert len(rows) == 1
    assert rows[0]["pred_source"] is not None


def test_empty_build_refused(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.lit(False)
    )
    with pytest.raises(ValueError, match="empty"):
        write_nb_index(docs, str(tmp_path / "idx"))
