from trade_data_collection_service_spark.sources.tables import (  # noqa: F401
    read_table,
    write_candles,
    compact,
)
