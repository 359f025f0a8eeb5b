"""Versioned dedup — last-write-wins over the candle key.

Spark twin of ``ReplacingMergeTree(receipt_timestamp)`` + ``FINAL``
(clickhouse_schema.py:143-145; FINAL reads at load_history.py:287,
data_quality_check.py:118).  The reference relies on background merges
collapsing duplicate keys to the max-receipt row; here it is a
read-side view (row_number over the key) plus an optional compaction
rewrite (the ``OPTIMIZE TABLE FINAL`` analog).

Scale note: the window shuffles once on the dedup key — the same
shuffle any groupBy on the key would pay.  Because the physical layout
writes data hash-distributed and sorted by (exchange, symbol, start)
(sources/tables.py), AQE can often satisfy this with an existing
partitioning; duplicates are rare (<5%) so there is no skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trade_data_collection_service_spark.schema import CANDLE_KEY, CANDLE_VERSION


def dedup_latest(
    df: DataFrame,
    keys: list[str] | None = None,
    version_col: str = CANDLE_VERSION,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Keep, per key, the single row with max ``version_col``.

    ClickHouse's ReplacingMergeTree tie-break is arbitrary; we make it
    deterministic by additionally ordering on the value columns
    (SURVEY.md §7 "hard parts").
    """
    keys = keys or CANDLE_KEY
    tiebreakers = tiebreakers if tiebreakers is not None else ["close", "volume"]
    order = [F.col(version_col).desc()] + [
        F.col(c).desc() for c in tiebreakers if c in df.columns
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
