"""Streaming ingest-anomaly monitoring: maintain the per
(event_type, day) counts table from the live event stream and score
it with the exact batch scorer.

The reference's quality watchdog polls tables on a schedule and
recomputes per-window counts (data_quality_check.py:248-250,
391-485); Spark-first, the same tripwire is a foreachBatch that
keeps a TINY counts table current and defers scoring to read time:

- per micro-batch, only the (event_type, day) cells TOUCHED by the
  batch are recomputed — from the idempotent append-only raw table,
  never by incrementing stored counts, so checkpoint replays and
  duplicate deliveries converge (the rollup-upsert recompute rule,
  streaming/pipeline.py);
- the counts table is O(event_types × days) rows regardless of
  event volume — orders of magnitude smaller than the stream — so
  the per-batch rewrite cost is bounded by the tripwire's own
  cardinality, not the data's;
- scoring (trailing 7-day mean/std z-score) runs on read via
  ``ext.pipeline.anomaly_scores`` — the SAME function the batch
  ``event_anomaly`` oracle checks, so stream and batch flags can
  never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.pipeline import (
    anomaly_scores,
    daily_event_counts,
)
from trade_data_collection_service_spark.streaming.pipeline import (
    _rm,
    table_exists,
)


def _publish_counts_stage(spark: SparkSession, stage: str, counts_path: str) -> None:
    """Overwrite the live counts table from a fully-staged copy.
    Isolated so crash tests can inject a failure at the boundary."""
    spark.read.parquet(stage).write.mode("overwrite").parquet(counts_path)


def _recover_counts_stage(spark: SparkSession, counts_path: str) -> None:
    """Roll the counts-publish WAL forward on batch entry — the
    streaming/pipeline._recover_stage discipline applied to the
    (unpartitioned) counts table.  A crash during the live overwrite
    leaves counts_path partially written; without recovery the next
    batch's left_anti against the damaged stored table would
    permanently drop untouched (event_type, day) cells.  States:

    - no stage dir: previous batch finished — nothing to do;
    - stage WITHOUT ``_SUCCESS``: crash mid-staging, live untouched —
      discard the partial stage;
    - stage WITH ``_SUCCESS``: crash between stage completion and live
      overwrite — republish the stage (the complete post-batch table)
      before anyone reads stored counts, then delete it."""
    stage = counts_path + ".stage"
    if not table_exists(spark, stage):
        return
    if table_exists(spark, stage + "/_SUCCESS"):
        _publish_counts_stage(spark, stage, counts_path)
    _rm(spark, stage)


def upsert_daily_counts(
    spark: SparkSession,
    raw_events: str | DataFrame,
    batch_df: DataFrame,
    counts_path: str,
) -> None:
    """Recompute the (event_type, day) cells touched by one
    micro-batch from the raw table and splice them into the stored
    counts (keep untouched cells).  Recompute-not-increment keeps the
    upsert idempotent under replays."""
    _recover_counts_stage(spark, counts_path)
    touched = (
        batch_df.select(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .distinct()
    )
    raw = (
        raw_events
        if isinstance(raw_events, DataFrame)
        else spark.read.parquet(raw_events)
    )
    recomputed = daily_event_counts(
        raw.join(
            F.broadcast(touched),
            [
                raw["event_type"] == touched["event_type"],
                F.date_trunc("day", raw["ts"]) == touched["day"],
            ],
            "left_semi",
        )
    )
    if table_exists(spark, counts_path):
        stored = spark.read.parquet(counts_path)
        out = stored.join(
            F.broadcast(touched), ["event_type", "day"], "left_anti"
        ).unionByName(recomputed)
    else:
        out = recomputed
    # The counts table is tiny (types × days); a staged whole-table
    # swap is simpler than partition surgery.  The stage is the WAL:
    # its _SUCCESS marker records "staging complete", it's republished
    # on entry if a crash interrupted the live overwrite, and it's
    # deleted only AFTER the live overwrite succeeds — so checkpoint
    # replays converge even through mid-publish crashes.
    stage = counts_path + ".stage"
    out.coalesce(1).write.mode("overwrite").parquet(stage)
    _publish_counts_stage(spark, stage, counts_path)
    _rm(spark, stage)


def start_event_anomaly_stream(
    spark: SparkSession,
    source_dir: str,
    counts_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """File-source event stream → foreachBatch counts upsert.  The
    raw-table role is played by the source directory itself (append-
    only parquet), so recomputes read exactly what was delivered."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_daily_counts(spark, source_dir, batch_df, counts_path)

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def anomaly_from_counts(
    spark: SparkSession, counts_path: str, z_threshold: float = 2.5
) -> DataFrame:
    """Score the maintained counts table — identical output contract
    to the batch ``event_anomaly`` over the same delivered events."""
    return anomaly_scores(spark.read.parquet(counts_path), z_threshold)
