"""SQL query surface.

The reference's users query ClickHouse with SQL (README.md:56-68,
notebooks/ohlcv_views.ipynb); this module gives the engine the same
front door: register the candle table, its deduped FINAL view, the
rollup cascade, and the driver tables as temp views, then use
``spark.sql(...)`` freely — Catalyst treats view SQL and DataFrame
code identically, so everything in docs/ARCHITECTURE.md (pushdown,
pruning, broadcast) applies unchanged.

View names mirror the reference's tables:
    candles_raw          all versions (the ReplacingMergeTree heap)
    candles_final        deduped last-write-wins view (… FINAL)
    candles_1m … candles_1d   rollup cascade levels
plus the raw driver tables (events, documents, …).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators import cascade, dedup_latest
from trade_data_collection_service_spark.schema import TABLES, cascade_specs


def register_views(
    spark: SparkSession,
    sf_dir: str,
    minutes: list[int] | None = None,
) -> list[str]:
    """Register the full view surface; returns the view names."""
    names: list[str] = []
    for t in TABLES:
        if t == "events":
            from trade_data_collection_service_spark.candles import events_df

            events_df(spark, sf_dir).createOrReplaceTempView(t)
        else:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        names.append(t)

    raw = candles_from_events(spark, sf_dir)
    raw.createOrReplaceTempView("candles_raw")
    names.append("candles_raw")
    final = dedup_latest(raw)
    final.createOrReplaceTempView("candles_final")
    names.append("candles_final")
    levels = cascade(final, minutes)
    for spec in cascade_specs(minutes or None):
        if spec.minutes in levels:
            levels[spec.minutes].createOrReplaceTempView(spec.table)
            names.append(spec.table)
    return names
