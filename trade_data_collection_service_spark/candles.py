"""Deterministic candle derivation from the driver's ``events`` table.

The driver's test tables are fixed (TESTDATA.md); candle-shaped inputs
are *derived* from ``events`` with a pure, SQL-expressible mapping
(FIXTURES.md §1.1) so the DuckDB oracle can reproduce them exactly.
This module holds BOTH sides of that contract:

- the Spark DataFrame derivation (``candles_from_events``), and
- the DuckDB CTE twin (``CANDLES_CTE``), prefixed onto every candle
  oracle query in ``__spark_entry__.oracle_sql``.

Mapping (per FIXTURES.md): each event is a "trade" with price
``value`` at time ``ts``; symbol/exchange derive from user_id /
event_type; grouping to the minute produces the 1-minute OHLCV candle
stream the reference ingests over websockets (data_collector.py:222-283).

Determinism notes (cross-engine hash equality):
- open/close use min_by/max_by on the unique ``event_id`` — no ties.
- float sums are rounded to 6 decimals on both sides.
- event timestamps carry ns precision in parquet; both engines
  truncate to µs, and we additionally truncate to whole seconds on
  the derived timestamp columns so the value hash is robust.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DuckDB twin of candles_from_events, kept textually adjacent so the
# two stay in lockstep.  Every candle oracle query starts with this CTE.
CANDLES_CTE = """
WITH candles AS (
  SELECT
    CASE WHEN event_type < 'm' THEN 'EXCH_A' ELSE 'EXCH_B' END AS exchange,
    'SYM' || CAST(user_id % 8 AS VARCHAR)                      AS symbol,
    '1m'                                                       AS "interval",
    date_trunc('minute', ts)                                   AS start,
    date_trunc('minute', ts) + INTERVAL 1 MINUTE               AS stop,
    CAST(epoch(date_trunc('minute', ts) + INTERVAL 1 MINUTE) AS BIGINT)
                                                               AS close_unixtime,
    CAST(count(*) AS BIGINT)                                   AS trades,
    arg_min(value, event_id)                                   AS open,
    max(value)                                                 AS high,
    min(value)                                                 AS low,
    arg_max(value, event_id)                                   AS close,
    round(sum(abs(value)), 6)                                  AS volume,
    date_trunc('second', max(ts))                              AS timestamp,
    date_trunc('second', max(ts))                              AS receipt_timestamp
  FROM events
  GROUP BY 1, 2, 3, 4, 5, 6
)
"""

# Candles plus injected duplicate versions (FIXTURES.md §1.1 "dup
# variants"): every 3rd minute bucket gets a second row 3 s later with
# a nudged volume (a VALID revision — it must survive validate()) —
# dedup (A9) must keep the later version.
CANDLES_DUP_CTE = (
    CANDLES_CTE
    + """
, candles_dup AS (
  SELECT * FROM candles
  UNION ALL
  SELECT exchange, symbol, "interval", start, stop, close_unixtime, trades,
         open, high, low, close,
         round(volume + 1.0, 6) AS volume, timestamp,
         receipt_timestamp + INTERVAL 3 SECOND AS receipt_timestamp
  FROM candles WHERE (close_unixtime // 60) % 3 = 0
)
"""
)

# Candles plus injected invalid rows (FIXTURES.md §1.1 "invalid rows"):
# every 5th minute bucket gets an OHLC-ordering violation (high below
# least(open, close)), every 7th a close_unixtime <= 0 violation —
# both at shifted starts so the keys stay distinct.
CANDLES_INVALID_CTE = (
    CANDLES_CTE
    + """
, candles_invalid AS (
  SELECT * FROM candles
  UNION ALL
  SELECT exchange, symbol, "interval",
         start + INTERVAL 30 SECOND AS start,
         stop, close_unixtime, trades,
         open, least(open, close) - 1.0 AS high, low, close, volume,
         timestamp, receipt_timestamp
  FROM candles WHERE (close_unixtime // 60) % 5 = 0
  UNION ALL
  SELECT exchange, symbol, "interval",
         start + INTERVAL 45 SECOND AS start,
         stop, CAST(0 AS BIGINT) AS close_unixtime, trades,
         open, high, low, close, volume,
         timestamp, receipt_timestamp
  FROM candles WHERE (close_unixtime // 60) % 7 = 0
)
"""
)


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read ``events`` with ``ts`` as a proper TimestampType.

    The parquet stores TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as
    epoch-nanos long, converted here by truncation to µs — the same
    ns→µs truncation DuckDB applies when it reads TIMESTAMP_NS.
    """
    try:  # runtime-settable SQLConf; makes the read work on any session
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


def candle_projection(ev: DataFrame) -> DataFrame:
    """Per-event projection to (exchange, symbol, start, event_id, ts,
    value) — shared by the batch derivation and the streaming windowed
    twin (streaming/candle_window.py), so both compute identical
    candles from identical inputs."""
    start = F.date_trunc("minute", F.col("ts"))
    return ev.select(
        F.when(F.col("event_type") < "m", F.lit("EXCH_A"))
        .otherwise(F.lit("EXCH_B"))
        .alias("exchange"),
        F.concat(F.lit("SYM"), (F.col("user_id") % 8).cast("string")).alias("symbol"),
        start.alias("start"),
        F.col("event_id"),
        F.col("ts"),
        F.col("value"),
    )


def candle_aggs() -> list:
    """The OHLCV aggregation expressions (batch ≡ streaming)."""
    return [
        F.count(F.lit(1)).alias("trades"),
        F.min_by("value", "event_id").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "event_id").alias("close"),
        F.round(F.sum(F.abs("value")), 6).alias("volume"),
        F.date_trunc("second", F.max("ts")).alias("timestamp"),
        F.date_trunc("second", F.max("ts")).alias("receipt_timestamp"),
    ]


def finalize_candles(agg: DataFrame) -> DataFrame:
    """(exchange, symbol, start, aggs…) → full raw-candle schema."""
    stop = F.col("start") + F.expr("INTERVAL 1 MINUTE")
    return agg.select(
        "exchange",
        "symbol",
        F.lit("1m").alias("interval"),
        "start",
        stop.alias("stop"),
        F.unix_timestamp(stop).alias("close_unixtime"),
        "trades",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "timestamp",
        "receipt_timestamp",
    )


def candles_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the 1-minute raw candle table from ``events``.

    Spark twin of ``CANDLES_CTE``.  Produces the reference's raw-candle
    schema (clickhouse_schema.py:123-147; SURVEY.md §1.3).  Groups on
    the minimal key (exchange, symbol, start); interval / stop /
    close_unixtime are functionally dependent on start and derived
    after aggregation — narrower hash-map keys, same result as the
    oracle's 6-column GROUP BY.
    """
    base = candle_projection(events_df(spark, sf_dir))
    agg = base.groupBy("exchange", "symbol", "start").agg(*candle_aggs())
    return finalize_candles(agg)


def candles_with_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candles UNION ALL duplicate versions — Spark twin of CANDLES_DUP_CTE.

    Exercises the ReplacingMergeTree(receipt_timestamp) last-write-wins
    semantics (clickhouse_schema.py:143-145)."""
    c = candles_from_events(spark, sf_dir)
    dup = (
        c.filter(F.expr("(close_unixtime div 60) % 3 = 0"))
        .withColumn("volume", F.round(F.col("volume") + 1.0, 6))
        .withColumn(
            "receipt_timestamp",
            F.col("receipt_timestamp") + F.expr("INTERVAL 3 SECOND"),
        )
    )
    return c.unionByName(dup)


def candles_with_invalid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candles UNION ALL corrupted variants — Spark twin of CANDLES_INVALID_CTE.

    Exercises the CHECK-constraint validation (clickhouse_schema.py:139-142)."""
    c = candles_from_events(spark, sf_dir)
    bad_ohlc = (
        c.filter(F.expr("(close_unixtime div 60) % 5 = 0"))
        .withColumn("start", F.col("start") + F.expr("INTERVAL 30 SECOND"))
        .withColumn("high", F.least("open", "close") - F.lit(1.0))
    )
    bad_unix = (
        c.filter(F.expr("(close_unixtime div 60) % 7 = 0"))
        .withColumn("start", F.col("start") + F.expr("INTERVAL 45 SECOND"))
        .withColumn("close_unixtime", F.lit(0).cast("long"))
    )
    return c.unionByName(bad_ohlc.select(*c.columns)).unionByName(
        bad_unix.select(*c.columns)
    )
