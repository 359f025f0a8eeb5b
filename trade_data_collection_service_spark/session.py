"""SparkSession factory with scale-appropriate defaults.

All engine code assumes a UTC session timezone (the reference stores
DateTime64(3,'UTC') everywhere, clickhouse_schema.py:128-138) and AQE
enabled so skewed shuffle partitions are re-planned at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "trade-data-collection-service-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Local testing uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster
    the same conf block applies — AQE handles partition coalescing and
    skew joins, so ``shuffle.partitions`` is an upper bound, not a
    hand-tuned constant.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local[*] runs everything in the driver JVM; the default 1g
        # heap OOMs on multi-million-row aggregations.  Only effective
        # for the first session in a process (JVM launch conf).
        .config("spark.driver.memory", driver_mem)
        # Bucketed tables (sources/tables.py) need a catalog; keep the
        # warehouse + derby metastore out of the working directory.
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        # ReservedCodeCacheSize: the default 240 MB JIT code cache
        # fills under a long suite of giant whole-stage-codegen
        # classes, after which HotSpot stops compiling and everything
        # runs interpreted — measured as monotone within-session
        # slowdown (OPTIMIZATION_r14 §2).  512 MB is the value
        # spark-submit itself warns toward for large workloads; a
        # JVM-launch conf, so only the first session in a process
        # sees it (bench/driver sessions are exactly that).
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home=/tmp/spark_graft_derby"
            " -XX:ReservedCodeCacheSize=512m",
        )
        # The SQL tab retains full plan graphs per executed query —
        # at ~200 queries with very large plans that is real driver
        # heap held for the whole session; 50 is plenty for
        # interactive debugging (guide §5: the driver should do
        # almost no data work — or hold data-sized UI state).
        .config("spark.sql.ui.retainedExecutions", "50")
        # Deterministic time semantics: everything is UTC, as in the
        # reference schema (DateTime64(3,'UTC')).
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching — essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas interchange (extensions use pandas UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Columnar storage parity with the reference's ZSTD codecs
        # (clickhouse_schema.py:125-138).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Timestamps in our tables are ms/us precision; keep parquet
        # reads vectorized.
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # The driver's events.parquet stores TIMESTAMP(NANOS), which
        # Spark's reader rejects; read nanos as long and convert
        # explicitly (candles.events_df).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
