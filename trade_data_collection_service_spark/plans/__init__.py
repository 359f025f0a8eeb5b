"""Work-plan builders — DataFrame programs that *produce plans* other
stages execute (SURVEY.md §1.1 "work plan" abstraction).

- backfill chunk plans (T12): trade_data_collection_service_spark.operators.backfill
- gap refill fetch ranges (T6): trade_data_collection_service_spark.operators.gaps.refill_ranges
- repair windows (T7): trade_data_collection_service_spark.operators.repair
"""

from trade_data_collection_service_spark.operators.backfill import (  # noqa: F401
    backfill_plan,
    earliest_starts,
)
from trade_data_collection_service_spark.operators.gaps import refill_ranges  # noqa: F401
from trade_data_collection_service_spark.operators.repair import (  # noqa: F401
    repair_window,
    verify_window,
)
