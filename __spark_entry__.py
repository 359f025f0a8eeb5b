"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every query here maps to an operator row in SURVEY.md §2; candle
queries run over the deterministic candle derivation from ``events``
(FIXTURES.md §1.1, trade_data_collection_service_spark/candles.py —
the DuckDB CTE twin lives next to the Spark derivation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import (
    CANDLES_CTE,
    CANDLES_DUP_CTE,
    CANDLES_INVALID_CTE,
    candles_from_events,
    candles_with_duplicates,
    candles_with_invalid,
)
from trade_data_collection_service_spark.operators import (
    backfill_plan,
    cascade,
    dedup_latest,
    islands,
    missing_timestamps,
    quarantine,
    rollup_raw,
)
from trade_data_collection_service_spark.operators import queries as Q

SF0001 = "/root/testdata/sf0.001"

ROLLUP_COLS = [
    "exchange",
    "symbol",
    "candle_start",
    "open",
    "open_time",
    "high",
    "low",
    "close",
    "close_time",
    "volume",
    "trades",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → 1m candles → validate → dedup → rollup
    cascade to 15m (SURVEY.md §7 minimum end-to-end slice)."""
    c = dedup_latest(candles_from_events(spark, SF0001))
    levels = cascade(c, [1, 5, 15])
    return levels[15].select(*ROLLUP_COLS)


# ---------------------------------------------------------------------------
# queries(): Spark side
# ---------------------------------------------------------------------------


def _q_candles_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candles_from_events(spark, sf_dir)


def _q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_latest(candles_with_duplicates(spark, sf_dir))


def _q_rollup_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return rollup_raw(c, 5).select(*ROLLUP_COLS)


def _q_cascade_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Built through the 5m level; the oracle aggregates 1m -> 15m
    # directly — hash equality proves cascade exactness (A6).
    c = candles_from_events(spark, sf_dir)
    return cascade(c, [1, 5, 15])[15].select(*ROLLUP_COLS)


def _q_earliest_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.earliest_per_symbol(candles_from_events(spark, sf_dir), "EXCH_A", "1m")


def _q_minmax_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.minmax_window(candles_from_events(spark, sf_dir), "EXCH_A", "SYM0")


def _q_count_distinct_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.count_distinct_in_window(
        candles_from_events(spark, sf_dir),
        "EXCH_A",
        "SYM0",
        "2024-01-05 00:00:00",
        "2024-01-12 00:00:00",
    )


def _q_latest_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.latest_per_symbol(candles_from_events(spark, sf_dir))


def _q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.distinct_pairs(candles_from_events(spark, sf_dir))


def _q_recent_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.recent_candles(
        candles_from_events(spark, sf_dir), "EXCH_A", "SYM0", "1m", 200
    ).select("symbol", "start", "open", "high", "low", "close", "volume")


def _q_symbol_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    syms = candles_from_events(spark, sf_dir).select("symbol").distinct()
    return Q.symbols_filtered(syms, None, "SYM", ["SYM3"])


def _q_readme_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    now = c.agg(F.max("start").alias("__now"))
    return (
        c.crossJoin(F.broadcast(now))
        .filter(
            F.col("symbol").isin(["SYM0", "SYM1"])
            & (F.col("start") >= F.col("__now") - F.expr("INTERVAL 6 HOURS"))
        )
        .select("symbol", "start", "open", "high", "low", "close", "volume")
        .orderBy("symbol", "start")
    )


def _q_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.freshness(candles_from_events(spark, sf_dir))


def _q_gap_missing_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        missing_timestamps(c)
        .groupBy("exchange", "symbol")
        .agg(F.count(F.lit(1)).alias("n_missing"))
        .orderBy("exchange", "symbol")
    )


def _q_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir).filter(
        (F.col("exchange") == "EXCH_A") & (F.col("symbol") == "SYM0")
    )
    return islands(missing_timestamps(c))


def _q_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return backfill_plan(
        c, "2023-12-28 00:00:00", 1000, "2024-02-01 00:00:00"
    )


def _q_validate_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quarantine(candles_with_invalid(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "candles_1m": _q_candles_1m,
        "dedup_latest": _q_dedup_latest,
        "rollup_5m": _q_rollup_5m,
        "cascade_15m": _q_cascade_15m,
        "earliest_per_symbol": _q_earliest_per_symbol,
        "minmax_window": _q_minmax_window,
        "count_distinct_window": _q_count_distinct_window,
        "latest_per_symbol": _q_latest_per_symbol,
        "distinct_pairs": _q_distinct_pairs,
        "recent_topn": _q_recent_topn,
        "symbol_filter": _q_symbol_filter,
        "readme_window": _q_readme_window,
        "freshness": _q_freshness,
        "gap_missing_count": _q_gap_missing_count,
        "gap_islands": _q_gap_islands,
        "backfill_plan": _q_backfill_plan,
        "validate_quarantine": _q_validate_quarantine,
    }


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB twins
# ---------------------------------------------------------------------------

_ROLLUP_AGG = """
  arg_min(open, start)                    AS open,
  min(start)                              AS open_time,
  max(high)                               AS high,
  min(low)                                AS low,
  arg_max(close, start)                   AS close,
  max(start)                              AS close_time,
  round(sum(volume), 6)                   AS volume,
  CAST(sum(trades) AS BIGINT)             AS trades
"""

_VALID_COND = """
      isfinite(open) AND isfinite(high) AND isfinite(low)
  AND isfinite(close) AND isfinite(volume)
  AND low <= least(open, close)
  AND high >= greatest(open, close)
  AND low <= high
  AND close_unixtime > 0
  AND exchange <> '' AND symbol <> '' AND "interval" <> ''
"""


def oracle_sql() -> dict[str, str]:
    return {
        "candles_1m": CANDLES_CTE + "SELECT * FROM candles",
        "dedup_latest": CANDLES_DUP_CTE
        + """
        SELECT exchange, symbol, "interval", start, stop, close_unixtime,
               trades, open, high, low, close, volume, timestamp,
               receipt_timestamp
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY exchange, symbol, start, "interval"
                   ORDER BY receipt_timestamp DESC, close DESC, volume DESC
                 ) AS rn
          FROM candles_dup
        ) WHERE rn = 1
        """,
        "rollup_5m": CANDLES_CTE
        + f"""
        SELECT exchange, symbol,
               time_bucket(INTERVAL '5 minutes', start) AS candle_start,
               {_ROLLUP_AGG}
        FROM candles GROUP BY 1, 2, 3
        """,
        "cascade_15m": CANDLES_CTE
        + f"""
        SELECT exchange, symbol,
               time_bucket(INTERVAL '15 minutes', start) AS candle_start,
               {_ROLLUP_AGG}
        FROM candles GROUP BY 1, 2, 3
        """,
        "earliest_per_symbol": CANDLES_CTE
        + """
        SELECT symbol, min(start) AS earliest_start
        FROM candles WHERE exchange = 'EXCH_A' AND "interval" = '1m'
        GROUP BY symbol
        """,
        "minmax_window": CANDLES_CTE
        + """
        SELECT min(start) AS min_start, max(start) AS max_start
        FROM candles WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
        """,
        "count_distinct_window": CANDLES_CTE
        + """
        SELECT CAST(count(DISTINCT start) AS BIGINT) AS n_candles
        FROM candles
        WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
          AND start >= TIMESTAMP '2024-01-05 00:00:00'
          AND start <  TIMESTAMP '2024-01-12 00:00:00'
        """,
        "latest_per_symbol": CANDLES_CTE
        + """
        SELECT exchange, symbol, "interval", start, stop, close_unixtime,
               trades, open, high, low, close, volume, timestamp,
               receipt_timestamp
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY symbol
                   ORDER BY stop DESC, exchange DESC
                 ) AS rn
          FROM candles
        ) WHERE rn = 1
        """,
        "distinct_pairs": CANDLES_CTE
        + "SELECT DISTINCT exchange, symbol FROM candles",
        "recent_topn": CANDLES_CTE
        + """
        SELECT symbol, start, open, high, low, close, volume
        FROM (
          SELECT * FROM candles
          WHERE exchange = 'EXCH_A' AND symbol = 'SYM0' AND "interval" = '1m'
          ORDER BY start DESC LIMIT 200
        ) ORDER BY start
        """,
        "symbol_filter": CANDLES_CTE
        + """
        SELECT DISTINCT symbol FROM candles
        WHERE symbol LIKE '%SYM%' AND symbol NOT IN ('SYM3')
        ORDER BY symbol
        """,
        "readme_window": CANDLES_CTE
        + """
        SELECT symbol, start, open, high, low, close, volume
        FROM candles, (SELECT max(start) AS now_ts FROM candles)
        WHERE symbol IN ('SYM0', 'SYM1')
          AND start >= now_ts - INTERVAL 6 HOUR
        ORDER BY symbol, start
        """,
        "freshness": CANDLES_CTE
        + """
        SELECT symbol, latest_stop,
               CAST(epoch(now_ts) - epoch(latest_stop) AS BIGINT) AS lag_seconds,
               (epoch(now_ts) - epoch(latest_stop)) > 120 AS is_stale
        FROM (SELECT symbol, max(stop) AS latest_stop FROM candles GROUP BY symbol),
             (SELECT max(stop) AS now_ts FROM candles)
        ORDER BY symbol
        """,
        "gap_missing_count": CANDLES_CTE
        + """
        , bounds AS (
            SELECT exchange, symbol, min(start) AS lo, max(start) AS hi
            FROM candles GROUP BY 1, 2
        ), grid AS (
            SELECT exchange, symbol,
                   unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS start
            FROM bounds
        ), missing AS (
            SELECT exchange, symbol, start FROM grid
            EXCEPT
            SELECT exchange, symbol, start FROM candles
        )
        SELECT exchange, symbol, CAST(count(*) AS BIGINT) AS n_missing
        FROM missing GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "gap_islands": CANDLES_CTE
        + """
        , one AS (
            SELECT * FROM candles
            WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
        ), bounds AS (
            SELECT exchange, symbol, min(start) AS lo, max(start) AS hi
            FROM one GROUP BY 1, 2
        ), grid AS (
            SELECT exchange, symbol,
                   unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS start
            FROM bounds
        ), missing AS (
            SELECT exchange, symbol, start FROM grid
            EXCEPT
            SELECT exchange, symbol, start FROM one
        ), flagged AS (
            SELECT exchange, symbol, start,
                   CASE WHEN lag(start) OVER w IS NULL
                         OR epoch(start) - epoch(lag(start) OVER w) > 60
                        THEN 1 ELSE 0 END AS new_island
            FROM missing
            WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
        ), ids AS (
            SELECT exchange, symbol, start,
                   sum(new_island) OVER (
                     PARTITION BY exchange, symbol ORDER BY start
                     ROWS UNBOUNDED PRECEDING
                   ) AS island
            FROM flagged
        )
        SELECT exchange, symbol, min(start) AS gap_start, max(start) AS gap_end,
               CAST(count(*) AS BIGINT) AS n_missing
        FROM ids GROUP BY exchange, symbol, island
        """,
        "backfill_plan": CANDLES_CTE
        + """
        , bounds AS (
            SELECT symbol, min(start) AS upper FROM candles GROUP BY symbol
        ), chunks AS (
            SELECT symbol, upper,
                   unnest(generate_series(
                     TIMESTAMP '2023-12-28 00:00:00',
                     upper - INTERVAL 1 SECOND,
                     INTERVAL 1000 MINUTE)) AS chunk_start
            FROM bounds WHERE upper > TIMESTAMP '2023-12-28 00:00:00'
        )
        SELECT symbol, chunk_start,
               least(chunk_start + INTERVAL 1000 MINUTE, upper) AS chunk_end,
               CAST(row_number() OVER (
                 PARTITION BY symbol ORDER BY chunk_start DESC) AS BIGINT)
                 AS chunk_index
        FROM chunks
        """,
        "validate_quarantine": CANDLES_INVALID_CTE
        + f"""
        SELECT * FROM candles_invalid WHERE NOT ({_VALID_COND})
        """,
    }
