"""Transport-level streaming dedup: ``dropDuplicatesWithinWatermark``
over the candle identity key — exactly-once MATERIALIZATION of an
at-least-once delivery stream.

Two distinct dedup problems exist in the reference's pipeline and
this engine keeps them separate:

- TRANSPORT duplicates: the same row delivered again (websocket
  reconnect replays, at-least-once sources — data_collector.py's
  reconnect path).  The payload is identical; any copy may be kept.
  That is THIS module: Spark's native streaming dedup keeps the
  first-seen row per key and ages its state out with the event-time
  watermark, so state is O(keys within the watermark horizon), not
  O(stream).
- VERSION duplicates: a REVISED row for the same key (late volume
  fix-ups).  Later version wins; handled by the A9 versioned dedup
  (append-all-versions + read-side ``dedup_latest`` + compaction,
  operators/dedup.py) — a watermark dedup would wrongly drop the
  revision.

Scale shape: ``dropDuplicatesWithinWatermark`` keeps per-key state in
the state store, partitioned by key hash across executors, and the
watermark bounds both the state size and the re-delivery window it
protects against — the standard Spark idiom for idempotent ingestion
in front of an append-only sink.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def start_transport_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 1,
):
    """File-source candle stream → watermark dedup on the candle
    identity (exchange, symbol, interval, start) → append sink.
    Re-delivered rows inside the watermark horizon are dropped in
    flight; the sink needs no read-side dedup for transport dupes."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    deduped = stream.withWatermark(
        "receipt_timestamp", watermark
    ).dropDuplicatesWithinWatermark(
        ["exchange", "symbol", "interval", "start"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
