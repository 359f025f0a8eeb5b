"""Round-14 additions: the cost-based NB sparse/dense auto-switch
(VERDICT r13 #7).  The two scoring branches are bit-equal by the r13
identity tests; what r14 adds is the DECISION — posting density
measured from the census alone picks the cheaper plan, with the
explicit flag kept as an override."""

from __future__ import annotations

from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.text import (
    NB_SPARSE_DENSITY_THRESHOLD,
    _nb_model,
    _nb_score,
    _nb_stats,
    nb_auto_sparse,
    source_nb,
)


def _rows(df):
    return [
        (r["doc_id"], r["actual_source"], r["pred_source"], r["score"],
         r["correct"])
        for r in df.collect()
    ]


def _disjoint_docs(spark):
    # every source owns its vocabulary: density ≈ 1/n_sources
    return spark.createDataFrame(
        [
            (i, f"s{i % 5}", " ".join(f"s{i % 5}w{(i * j) % 13}"
                                      for j in range(20)))
            for i in range(120)
        ],
        "doc_id long, source string, text string",
    )


def test_auto_picks_dense_on_shared_vocabulary(spark, sf_dir):
    """The fixture corpus shares one vocabulary across sources —
    density is far above the threshold, so auto must keep the dense
    default (the r12 negative result: sparse is 0–30% slower here)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    census, _ = _nb_model(docs)
    pick = nb_auto_sparse(census)
    assert pick["sparse"] is False
    assert pick["density"] > NB_SPARSE_DENSITY_THRESHOLD
    # sanity: the stats really are census marginals
    assert pick["v_size"] == census.select("term").distinct().count()
    assert pick["n_sources"] == (
        census.select("source").distinct().count()
    )
    # and the auto path scores identically to the explicit branch
    assert _rows(source_nb(spark, sf_dir)) == _rows(
        source_nb(spark, sf_dir, sparse=False)
    )


def test_auto_picks_sparse_on_disjoint_vocabularies(spark):
    """Disjoint per-source vocabularies: density ≈ 1/n_sources, well
    under the threshold — auto routes through the sparse identity and
    still emits bit-equal scores."""
    docs = _disjoint_docs(spark)
    census, partials = _nb_model(docs)
    census = census.localCheckpoint(eager=False)
    pick = nb_auto_sparse(census)
    assert pick["sparse"] is True
    assert pick["density"] <= 1.0 / pick["n_sources"] + 1e-9
    stats, vocab = _nb_stats(census, partials)
    auto = _rows(_nb_score(docs, census, stats, vocab))
    assert auto == _rows(
        _nb_score(docs, census, stats, vocab, sparse=True)
    )
    assert auto == _rows(
        _nb_score(docs, census, stats, vocab, sparse=False)
    )


def test_auto_on_stored_index_uses_the_stored_decision(
    spark, tmp_path
):
    """nb_score_indexed(sparse=None) serves from the decision STORED
    at build time (1-row read, no census scan): a disjoint-vocabulary
    index flips the serve plan to sparse with identical output, and
    the sidecar records the density behind the pick."""
    from trade_data_collection_service_spark.ext.text import (
        _read_nb_decision,
        nb_score_indexed,
        write_nb_index,
    )

    docs = _disjoint_docs(spark)
    path = f"{tmp_path}/nbidx"
    write_nb_index(docs, path)
    # build persisted the decision sidecar
    dec = spark.read.parquet(f"{path}/decision").first()
    assert dec["sparse"] is True
    assert dec["density"] <= 1.0 / dec["n_sources"] + 1e-9
    assert _read_nb_decision(spark, path) is True
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    auto = _rows(nb_score_indexed(spark, path, batch))
    assert auto == _rows(
        nb_score_indexed(spark, path, batch, sparse=True)
    )
    # and the census-derived pick agrees with the stored one
    census = spark.read.parquet(f"{path}/census")
    assert nb_auto_sparse(census)["sparse"] is True


def test_stored_decision_stale_after_append_refreshed_by_compact(
    spark, tmp_path
):
    """Appends leave the decision sidecar untouched (the O(batch)
    append contract forbids a full-census read); compaction — which
    already folds the whole ledger — refreshes it.  A pre-r14 layout
    without the sidecar still serves via the census fallback."""
    from trade_data_collection_service_spark.ext.text import (
        _read_nb_decision,
        append_to_nb_index,
        compact_nb_index,
        nb_score_indexed,
        write_nb_index,
    )
    from trade_data_collection_service_spark.streaming.pipeline import (
        _rm,
    )

    # seed with a DISJOINT-vocabulary corpus -> stored decision sparse
    docs = _disjoint_docs(spark)
    path = f"{tmp_path}/nbidx"
    write_nb_index(docs.filter(F.col("doc_id") < 60), path)
    assert _read_nb_decision(spark, path) is True
    mtime0 = spark.read.parquet(f"{path}/decision").first()
    # append: decision untouched (same row back)
    append_to_nb_index(
        docs.filter(F.col("doc_id") >= 60), path, batch_id="b1"
    )
    assert spark.read.parquet(f"{path}/decision").first() == mtime0
    # compaction refreshes it (same corpus shape -> same verdict,
    # but the stats now cover the folded ledger)
    compact_nb_index(spark, path)
    dec = spark.read.parquet(f"{path}/decision").first()
    assert dec["sparse"] is True
    census = spark.read.parquet(f"{path}/census")
    assert dec["n_pairs"] == census.count()
    # legacy layout (sidecar removed): serve falls back to computing
    _rm(spark, f"{path}/decision")
    assert _read_nb_decision(spark, path) is None
    batch = docs.filter(F.col("doc_id") % 4 == 1)
    assert _rows(nb_score_indexed(spark, path, batch)) == _rows(
        nb_score_indexed(spark, path, batch, sparse=True)
    )


def test_empty_census_defaults_dense(spark):
    """Degenerate census (no rows): density defaults to 1.0 — the
    dense branch, whose left-join semantics tolerate anything."""
    census = spark.createDataFrame(
        [], "source string, term string, n_st long"
    )
    pick = nb_auto_sparse(census)
    assert pick["sparse"] is False and pick["density"] == 1.0
