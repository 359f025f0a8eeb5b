from trade_data_collection_service_spark.operators.dedup import dedup_latest  # noqa: F401
from trade_data_collection_service_spark.operators.validate import (  # noqa: F401
    quarantine,
    validate,
    validity_condition,
)
from trade_data_collection_service_spark.operators.rollup import (  # noqa: F401
    cascade,
    rollup_raw,
    rollup_reagg,
)
from trade_data_collection_service_spark.operators.gaps import (  # noqa: F401
    expected_grid,
    islands,
    missing_timestamps,
)
from trade_data_collection_service_spark.operators.backfill import backfill_plan  # noqa: F401
from trade_data_collection_service_spark.operators.watchdog import (  # noqa: F401
    rest_refill,
    table_refill,
    verify_rollup,
    watchdog_cycle,
)
