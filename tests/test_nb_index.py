"""Stored-model serve path for the Naive-Bayes source classifier
(VERDICT r11 #4): stored ≡ in-query bit-for-bit, the push_terms
In-list serving shape changes nothing, and an empty build refuses."""

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.text import (
    append_to_nb_index,
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


def test_append_equals_rebuild_equals_inline(spark, sf_dir, tmp_path):
    """The ledger contract: base(2/3) + append(1/3) must score
    IDENTICALLY to a fresh full build and to the in-query classifier
    — the per-batch census/src_stats partials sum exactly for
    disjoint doc sets.  A keyed replay of the same batch is
    idempotent (dynamic overwrite of its own partitions)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "app") + "/index"
    write_nb_index(docs.filter(F.col("doc_id") % 3 != 0), path)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    append_to_nb_index(batch, path, batch_id="b1")
    appended = _rows(nb_score_indexed(spark, path, docs))
    assert appended == _rows(source_nb(spark, sf_dir))
    # keyed replay: same batch id again -> same result, no doubling
    append_to_nb_index(batch, path, batch_id="b1")
    assert _rows(nb_score_indexed(spark, path, docs)) == appended


def test_unkeyed_append_double_counts_by_contract(spark, sf_dir, tmp_path):
    # batch_id=None lands in the shared 'legacy' partition; a replay
    # double-counts (documented contract — repair = rebuild)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "leg") + "/index"
    write_nb_index(docs.filter(F.col("doc_id") % 3 != 0), path)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    append_to_nb_index(batch, path)
    once = _rows(nb_score_indexed(spark, path, docs))
    append_to_nb_index(batch, path)
    twice = spark.read.parquet(f"{path}/census")
    n_batch_rows = twice.filter(F.col("batch") == "legacy").count()
    assert n_batch_rows > 0 and n_batch_rows % 2 == 0
    assert once == _rows(source_nb(spark, sf_dir))


def test_compact_folds_batches_scores_unchanged(spark, sf_dir, tmp_path):
    """compact_nb_index sums unprotected batch partitions into base
    exactly (counts are additive), so serving is byte-equal before
    and after; protected batches keep their partition identity; the
    maybe_compact cadence triggers on the max distinct-batch count
    across both tables."""
    import os

    from trade_data_collection_service_spark.ext.dedup import (
        maybe_compact,
    )
    from trade_data_collection_service_spark.ext.text import (
        compact_nb_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "cmp") + "/index"
    write_nb_index(docs.filter(F.col("doc_id") % 4 == 0), path)
    for i in (1, 2, 3):
        append_to_nb_index(
            docs.filter(F.col("doc_id") % 4 == i), path, batch_id=i
        )
    before = _rows(nb_score_indexed(spark, path, docs))
    parts = lambda t: {  # noqa: E731
        d for d in os.listdir(f"{path}/{t}") if d.startswith("batch=")
    }
    assert len(parts("census")) == 4
    # below threshold: metadata-only no-op
    assert maybe_compact(spark, path, "nb", max_batches=8) is False
    # above threshold: fold, protecting the still-replayable batch 3
    assert (
        maybe_compact(
            spark, path, "nb", max_batches=2, protect_batches=("3",)
        )
        is True
    )
    assert parts("census") == {"batch=base", "batch=3"}
    assert parts("src_stats") == {"batch=base", "batch=3"}
    assert _rows(nb_score_indexed(spark, path, docs)) == before
    # a keyed replay of the protected batch still lands idempotently
    append_to_nb_index(
        docs.filter(F.col("doc_id") % 4 == 3), path, batch_id=3
    )
    assert _rows(nb_score_indexed(spark, path, docs)) == before
    # full fold
    compact_nb_index(spark, path)
    assert parts("census") == {"batch=base"}
    assert _rows(nb_score_indexed(spark, path, docs)) == before


def test_null_source_docs_count_in_n_docs_but_never_classify(
    spark, tmp_path
):
    """r12 review: the refactor's per-source-marginal n_docs must
    still equal the twin's count(*) when a doc's source is NULL —
    the doc counts toward n_docs (shifting every prior) but NULL is
    never a candidate class, matching the pre-refactor semantics."""
    from trade_data_collection_service_spark.ext.text import (
        _nb_model,
        _nb_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "web", "the quick fox"),
            (2, "web", "the lazy dog"),
            (3, "books", "quick brown words"),
            (4, None, "orphan text here"),
        ],
        "doc_id long, source string, text string",
    )
    census, src_partials = _nb_model(docs)
    src_stats, _ = _nb_stats(census, src_partials)
    rows = src_stats.collect()
    assert {r["source"] for r in rows} == {"web", "books"}
    assert all(r["n_docs"] == 4 for r in rows)  # NULL-source doc counted
    # end-to-end through the stored-model path: every doc scored,
    # predictions only ever from the non-NULL classes
    path = str(tmp_path / "nullsrc") + "/index"
    write_nb_index(docs, path)
    scored = nb_score_indexed(spark, path, docs).collect()
    assert len(scored) == 4
    assert {r["pred_source"] for r in scored} <= {"web", "books"}


def test_empty_build_refused(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.lit(False)
    )
    with pytest.raises(ValueError, match="empty"):
        write_nb_index(docs, str(tmp_path / "idx"))
