"""Stored IVF index: partition-pruned search must return exactly the
in-memory ivf_trained_topk results, and the scan must read only the
probe buckets' partitions."""

import io
import re
import shutil
import tempfile
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.similarity import (
    ivf_search_indexed,
    ivf_trained_topk,
    vectors,
    write_ivf_index,
)


@pytest.fixture(scope="module")
def ivf_index(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="ivf_index_")
    path = f"{tmp}/index"
    centroids = write_ivf_index(spark, sf_dir, path)
    yield spark, sf_dir, path, centroids
    shutil.rmtree(tmp, ignore_errors=True)


def _queries(spark, sf_dir, n=3):
    v = vectors(spark, sf_dir)
    return v.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + n))


def test_indexed_search_matches_inline(ivf_index):
    spark, sf_dir, path, centroids = ivf_index
    got = ivf_search_indexed(
        spark, path, centroids, _queries(spark, sf_dir)
    ).collect()
    want = ivf_trained_topk(spark, sf_dir).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert {key(r): r["vec_id"] for r in got} == {
        key(r): r["vec_id"] for r in want
    }
    assert got, "no results"


def test_indexed_search_prunes_partitions(ivf_index):
    spark, sf_dir, path, centroids = ivf_index
    df = ivf_search_indexed(spark, path, centroids, _queries(spark, sf_dir))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # The index scan must carry a partition filter on bucket…
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]
    # …and actually read fewer partition directories than exist.
    n_parts = spark.read.parquet(path).select("bucket").distinct().count()
    assert n_parts >= 2  # index genuinely partitioned


@pytest.fixture(scope="module")
def ivfpq_index(spark, sf_dir):
    from trade_data_collection_service_spark.ext.pq import write_ivfpq_index

    tmp = tempfile.mkdtemp(prefix="ivfpq_index_")
    path = f"{tmp}/index"
    centroids, books = write_ivfpq_index(spark, sf_dir, path)
    yield spark, sf_dir, path, centroids, books
    shutil.rmtree(tmp, ignore_errors=True)


def test_ivfpq_indexed_search_matches_inline(ivfpq_index):
    from trade_data_collection_service_spark.ext.pq import (
        ivf_pq_topk,
        ivfpq_search_indexed,
    )

    spark, sf_dir, path, centroids, books = ivfpq_index
    got = ivfpq_search_indexed(
        spark, path, centroids, books, _queries(spark, sf_dir), k=10, nprobe=2
    ).collect()
    want = ivf_pq_topk(spark, sf_dir, k=10, nprobe=2).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert {key(r): (r["vec_id"], r["approx_d"]) for r in got} == {
        key(r): (r["vec_id"], r["approx_d"]) for r in want
    }
    assert got, "no results"


def test_ivfpq_indexed_search_prunes_partitions(ivfpq_index):
    from trade_data_collection_service_spark.ext.pq import ivfpq_search_indexed

    spark, sf_dir, path, centroids, books = ivfpq_index
    df = ivfpq_search_indexed(
        spark, path, centroids, books, _queries(spark, sf_dir), k=10, nprobe=2
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]
    n_parts = spark.read.parquet(path).select("bucket").distinct().count()
    assert n_parts >= 2


def test_append_equals_rebuild(spark, sf_dir):
    """Growing the index with append_to_ivf_index must be
    search-identical to rebuilding over the union corpus: the stored
    corpus is split 2/3 + 1/3, the 1/3 appended incrementally, and
    every query's ranked result compared row-for-row against the
    full-build index (same frozen centroids on both paths)."""
    from trade_data_collection_service_spark.ext.similarity import (
        append_to_ivf_index,
        assign_buckets,
    )

    tmp = tempfile.mkdtemp(prefix="ivf_append_")
    try:
        full_path, inc_path = f"{tmp}/full", f"{tmp}/inc"
        # full build fixes the centroids (trained on the whole corpus
        # — the frozen-quantizer contract)
        centroids = write_ivf_index(spark, sf_dir, full_path)
        v = vectors(spark, sf_dir)
        base = v.filter(F.col("vec_id") % 3 != 0)
        newer = v.filter(F.col("vec_id") % 3 == 0)
        # incremental: seed with the base 2/3 under the SAME centroids
        (
            assign_buckets(base, centroids)
            .repartition("bucket")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(inc_path)
        )
        append_to_ivf_index(newer, inc_path, centroids)
        qs = _queries(spark, sf_dir, 5)
        want = [
            tuple(r)
            for r in ivf_search_indexed(
                spark, full_path, centroids, qs, k=3, nprobe=2
            ).collect()
        ]
        got = [
            tuple(r)
            for r in ivf_search_indexed(
                spark, inc_path, centroids, qs, k=3, nprobe=2
            ).collect()
        ]
        assert got == want and got
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ivfpq_append_equals_rebuild_and_inline(spark, sf_dir):
    """Growing the IVF-PQ index with append_to_ivfpq_index must be
    search-identical to the full build AND to the inline ivf_pq_topk
    composition (quantizers trained on the full corpus, frozen for
    both the base write and the append)."""
    from trade_data_collection_service_spark.ext.pq import (
        append_to_ivfpq_index,
        ivf_pq_topk,
        ivfpq_search_indexed,
        write_ivfpq_index,
    )

    tmp = tempfile.mkdtemp(prefix="ivfpq_append_")
    try:
        full_path, inc_path = f"{tmp}/full", f"{tmp}/inc"
        centroids, books = write_ivfpq_index(spark, sf_dir, full_path)
        v = vectors(spark, sf_dir)
        # quantizers pass through pre-trained: the staged build must
        # not retrain (r9 review finding — three identical trainings)
        write_ivfpq_index(
            spark,
            sf_dir,
            inc_path,
            source=v.filter(F.col("vec_id") % 3 != 0),
            centroids=centroids,
            codebooks=books,
        )
        newer = v.filter(F.col("vec_id") % 3 == 0)
        append_to_ivfpq_index(
            newer, inc_path, centroids, books, batch_id="b1"
        )
        qs = _queries(spark, sf_dir)
        key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
        val = lambda r: (r["vec_id"], r["approx_d"])  # noqa: E731

        def search(path):
            return {
                key(r): val(r)
                for r in ivfpq_search_indexed(
                    spark, path, centroids, books, qs, k=10, nprobe=2
                ).collect()
            }

        inc = search(inc_path)
        full = search(full_path)
        inline = {
            key(r): val(r)
            for r in ivf_pq_topk(spark, sf_dir, k=10, nprobe=2).collect()
        }
        assert inc == full == inline and inc

        # a keyed replay dynamically overwrites its own partitions —
        # search-identical, never duplicated (crash-replay safety)
        append_to_ivfpq_index(
            newer, inc_path, centroids, books, batch_id="b1"
        )
        assert search(inc_path) == full

        # an empty micro-batch is a clean no-op, not a crash
        append_to_ivfpq_index(
            newer.filter(F.lit(False)),
            inc_path,
            centroids,
            books,
            batch_id="b2",
        )
        assert search(inc_path) == full

        # un-keyed replay DUPLICATES rows; the duplicated vec_ids fail
        # the _m == m completeness filter and silently vanish from
        # results — compact_ivfpq_index repairs back to fresh-build
        from trade_data_collection_service_spark.ext.pq import (
            compact_ivfpq_index,
        )

        append_to_ivfpq_index(newer, inc_path, centroids, books)
        append_to_ivfpq_index(newer, inc_path, centroids, books)
        appended_ids = {r["vec_id"] for r in newer.select("vec_id").collect()}
        corrupted = search(inc_path)
        assert not {v[0] for v in corrupted.values()} & appended_ids, (
            "duplicated vectors should vanish from results pre-compact"
            " (the failure mode the batch keying exists to prevent)"
        )
        compact_ivfpq_index(spark, inc_path)
        assert search(inc_path) == full
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ivfpq_append_rejects_reserved_batch(spark, sf_dir):
    from trade_data_collection_service_spark.ext.pq import (
        append_to_ivfpq_index,
    )

    v = vectors(spark, sf_dir).limit(1)
    with pytest.raises(ValueError, match="reserved"):
        append_to_ivfpq_index(v, "/nonexistent", None, None, batch_id="base")
    with pytest.raises(ValueError, match="empty/whitespace"):
        append_to_ivfpq_index(v, "/nonexistent", None, None, batch_id="  ")
