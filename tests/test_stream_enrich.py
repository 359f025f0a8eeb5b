"""Stream-static enrichment: the broadcast dim join must not drop or
duplicate stream rows, must attach the right attributes, and must
pass unknown symbols through with nulls."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.streaming.enrich import enrich_candles


@pytest.fixture(scope="module")
def enriched(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="stream_enrich_test_")
    src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"
    candles = candles_from_events(spark, sf_dir)
    candles.write.mode("overwrite").parquet(src)

    # dim deliberately misses some symbols (only even SYM numbers)
    dim = (
        candles.select("exchange", "symbol")
        .distinct()
        .filter(F.regexp_extract("symbol", r"(\d+)$", 1).cast("int") % 2 == 0)
        .withColumn("base_asset", F.concat(F.lit("ASSET_"), F.col("symbol")))
        .withColumn("tier", F.lit(1))
    )

    stream = spark.readStream.schema(candles.schema).parquet(src)
    q = (
        enrich_candles(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched_candles")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, str(q.exception())[:3000]
    out = spark.sql("SELECT * FROM enriched_candles").collect()
    yield candles.collect(), dim.collect(), out
    shutil.rmtree(tmp, ignore_errors=True)


def test_enrichment_preserves_stream_rows(enriched):
    base, _, out = enriched
    assert len(out) == len(base)  # left join: no drops, no dup fan-out
    key = lambda r: (r["exchange"], r["symbol"], r["start"])  # noqa: E731
    assert {key(r) for r in out} == {key(r) for r in base}


def test_enrichment_attaches_dim_attrs(enriched):
    _, dim, out = enriched
    dim_syms = {(r["exchange"], r["symbol"]) for r in dim}
    assert 0 < len(dim_syms)
    hit = miss = 0
    for r in out:
        if (r["exchange"], r["symbol"]) in dim_syms:
            assert r["base_asset"] == f"ASSET_{r['symbol']}" and r["tier"] == 1
            hit += 1
        else:
            assert r["base_asset"] is None and r["tier"] is None
            miss += 1
    assert hit > 0 and miss > 0  # both branches exercised
