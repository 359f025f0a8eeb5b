"""Stream-static dimension enrichment: attach slowly-changing symbol
metadata to the live candle stream.

The reference attaches exchange/symbol attributes client-side after
reading (its ClickHouse rows carry only the keys); Spark-first, the
dimension join belongs IN the stream: a static DataFrame joined to a
streaming one is re-resolved per micro-batch (so a refreshed dim
parquet is picked up on the next trigger) and, because the dim is
small, Catalyst broadcasts it — zero shuffle added to the stream.

At scale this is the standard star-schema stream shape: the fact
stream flows partition-local; only the broadcast variable moves.  A
left join keeps candles for symbols missing from the dim (late dim
arrival must not drop fact rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def enrich_candles(candle_stream: DataFrame, symbol_dim: DataFrame) -> DataFrame:
    """candle stream ⋈ broadcast(static symbol dim) on (exchange,
    symbol); left-outer so unknown symbols pass through with null
    attributes."""
    dim = broadcast(
        symbol_dim.select(
            "exchange",
            "symbol",
            F.col("base_asset"),
            F.col("tier"),
        )
    )
    return candle_stream.join(dim, ["exchange", "symbol"], "left")
