"""PySpark-native analytics engine with the query/data-processing
capabilities of ``Alex-Lekov/trade-data-collection-service``.

The reference is an asyncio + ClickHouse OHLCV candle collection stack
(see /root/repo/SURVEY.md).  This package re-expresses its analytics
core — versioned-dedup fact table, incrementally-maintained OHLCV
rollup cascade, gap detection/repair, backfill planning, and the read
query surface — as idiomatic Spark DataFrame / SQL / Structured
Streaming programs, plus LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.
"""

__version__ = "0.1.0"
