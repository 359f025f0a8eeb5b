from trade_data_collection_service_spark.functions.timeutil import (  # noqa: F401
    bucket_start,
    is_finite,
    yyyymm,
)
