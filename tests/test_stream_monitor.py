import shutil
import tempfile

from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.schema import CANDLE_SCHEMA
from trade_data_collection_service_spark.streaming.monitor import CandleStreamMonitor
from trade_data_collection_service_spark.streaming.pipeline import (
    freshness_report,
    start_candle_stream,
)


def test_monitor_observes_batches_and_freshness(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="monitor_test_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    monitor = CandleStreamMonitor(slo_seconds=3600)
    spark.streams.addListener(monitor)
    try:
        candles = candles_from_events(spark, sf_dir).select(
            *[f.name for f in CANDLE_SCHEMA.fields]
        )
        for b in range(2):
            candles.filter(F.col("trades") % 2 == b).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        q = start_candle_stream(spark, src, out, ckpt, minutes=[1])
        q.awaitTermination(240)
        assert q.exception() is None
        # listener events are delivered asynchronously; poll briefly
        import time

        for _ in range(60):
            if len(monitor.batches) >= 2 and monitor.total_rows >= candles.count():
                break
            time.sleep(1)
        s = monitor.summary()
        assert s["n_batches"] >= 2
        assert s["total_rows"] == candles.count()
        assert not s["stale"]
        fr = freshness_report(spark, out)
        rows = fr.collect()
        assert rows and all(r["lag_seconds"] >= 0 for r in rows)
    finally:
        spark.streams.removeListener(monitor)
        shutil.rmtree(tmp, ignore_errors=True)
