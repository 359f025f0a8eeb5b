"""Streaming active-users monitoring: maintain per-day HLL user
registers from the live event stream; daily and trailing-7-day
distinct-user estimates are folded on read.

The reference's quality watchdog polls tables on a schedule
(data_quality_check.py:391-485); the engagement twin of its tripwire
is a foreachBatch that keeps a register table current:

- state is the per (day, hll_idx) MAX-RHO register table —
  O(days × 64) rows regardless of event volume;
- unlike the counts table (streaming/anomaly.py), the upsert needs
  NO raw-table recompute to survive replays: max-merge is
  associative, commutative, and IDEMPOTENT, so re-delivered batches
  and checkpoint replays converge by algebra alone — the cheapest
  possible exactly-once story, and the reason sketches (not counts)
  are the right streaming engagement state;
- publishes reuse the stage-WAL discipline (streaming/anomaly.py
  ``_recover_counts_stage``) so a crash during the live overwrite
  never loses untouched days;
- read-time folding shares ``functions.sketch.hll_fold`` with the
  batch ``hll_distinct``, so streamed and batch estimates can never
  drift; the trailing-7-day estimate is a register-level union
  (fan each day's registers out to the report days they serve, max
  per (report_day, idx), fold) — HLL union is lossless, so the
  rolling estimate equals the estimate of the underlying 7-day user
  set, not an approximation of approximations.

Scale shape: the per-batch merge unions a 64-row-per-day batch
register table with the stored one and max-combines — bounded by the
tripwire's own cardinality; the 7-day fan-out multiplies register
rows (not events) by 7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trade_data_collection_service_spark.functions.sketch import (
    hll_fold,
    hll_registers,
)
from trade_data_collection_service_spark.streaming.anomaly import (
    _publish_counts_stage,
    _recover_counts_stage,
)
from trade_data_collection_service_spark.streaming.pipeline import (
    _rm,
    table_exists,
)


def daily_user_registers(events: DataFrame) -> DataFrame:
    """(day, hll_idx, reg) register table for distinct users per day."""
    ts = F.col("ts")
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        ts = ts.cast("timestamp")
    return hll_registers(
        events.withColumn("day", F.date_trunc("day", ts)),
        ["day"],
        "user_id",
    )


def upsert_daily_registers(
    spark: SparkSession, batch_df: DataFrame, regs_path: str
) -> None:
    """Merge one micro-batch's registers into the stored table:
    union + max per (day, hll_idx).  Idempotent without recompute —
    max-merge absorbs duplicate delivery."""
    _recover_counts_stage(spark, regs_path)
    batch_regs = daily_user_registers(batch_df)
    if table_exists(spark, regs_path):
        out = (
            spark.read.parquet(regs_path)
            .unionByName(batch_regs)
            .groupBy("day", "hll_idx")
            .agg(F.max("reg").alias("reg"))
        )
    else:
        out = batch_regs
    stage = regs_path + ".stage"
    out.coalesce(1).write.mode("overwrite").parquet(stage)
    _publish_counts_stage(spark, stage, regs_path)
    _rm(spark, stage)


def start_active_users_stream(
    spark: SparkSession,
    source_dir: str,
    regs_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """File-source event stream → foreachBatch register merge."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_daily_registers(spark, batch_df, regs_path)

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def active_users_from_registers(
    spark: SparkSession, regs_path: str, window_days: int = 7
) -> DataFrame:
    """Fold the maintained register table into (day,
    active_users_day, active_users_roll) — daily and trailing-N-day
    distinct-user estimates.  The rolling figure unions registers
    across the trailing window BEFORE folding (lossless HLL union),
    restricted to days the table has actually seen."""
    return fold_active_users(
        spark.read.parquet(regs_path), window_days
    )


def fold_active_users(regs: DataFrame, window_days: int = 7) -> DataFrame:
    """registers → (day, active_users_day, active_users_roll);
    shared by the stream reader above and the batch twin
    (__spark_entry__ ``rolling_active_hll``), so both fold the same
    algebra over the same state shape."""
    daily = hll_fold(regs, ["day"]).withColumnRenamed(
        "hll_estimate", "active_users_day"
    )
    contrib = regs.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.timestamp_add("DAY", F.lit(window_days - 1), F.col("day")),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
        "hll_idx",
        "reg",
    )
    real_days = regs.select("day").distinct()
    rolled = (
        contrib.join(F.broadcast(real_days), "day", "left_semi")
        .groupBy("day", "hll_idx")
        .agg(F.max("reg").alias("reg"))
    )
    rolling = hll_fold(rolled, ["day"]).withColumnRenamed(
        "hll_estimate", "active_users_roll"
    )
    return daily.join(rolling, "day").orderBy("day")
