"""Benchmark harness — the driver runs this per-round and records the
JSON line into BENCH_r{N}.json (see BASELINE.md for reference points).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized with a count-style action (noop write) so
the full plan executes; JVM/session startup is excluded from timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trade_data_collection_service_spark.session import get_spark


def headline_queries():
    """Name -> callable(spark, sf_dir) -> DataFrame.  A scale-stressing
    subset of the full surface: ingest-shaped aggregation, dedup
    window, the full 8-level rollup cascade, gap detection, and the
    read path."""
    import __spark_entry__ as entrymod
    from trade_data_collection_service_spark.candles import (
        candles_from_events,
        candles_with_duplicates,
    )
    from trade_data_collection_service_spark.operators import (
        cascade,
        dedup_latest,
        missing_timestamps,
    )

    q = entrymod.queries()

    def full_cascade_1d(spark, sf_dir):
        c = dedup_latest(candles_from_events(spark, sf_dir))
        return cascade(c)[1440]

    def dedup_full(spark, sf_dir):
        return dedup_latest(candles_with_duplicates(spark, sf_dir))

    def gaps_full(spark, sf_dir):
        from pyspark.sql import functions as F

        return (
            missing_timestamps(candles_from_events(spark, sf_dir))
            .groupBy("exchange", "symbol")
            .agg(F.count(F.lit(1)).alias("n_missing"))
        )

    out = {
        "candles_1m": q["candles_1m"],
        "dedup_full": dedup_full,
        "cascade_1d": full_cascade_1d,
        "gaps_full": gaps_full,
        "recent_topn": q["recent_topn"],
        "latest_per_symbol": q["latest_per_symbol"],
        "backfill_plan": q["backfill_plan"],
    }
    # Extension headliners when present (added in later milestones).
    for name in (
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        "tpch_q6",
        "tpch_q10",
        "events_json",
        "sma_20",
        "vwap_daily",
        "doc_dedup_exact",
        "doc_minhash_lsh",
        "emb_cosine_topk",
        "doc_quality",
        # round-2 additions (VERDICT r1 item 8 + new operators)
        "asof_price",
        "repair_window",
        "doc_simhash_pairs",
        "emb_neardup",
        "emb_ivf_trained_topk",
        "watchdog_cycle",
        # round-2 wave 2: curation + analytics + cluster ops
        "doc_dup_clusters",
        "corpus_curated",
        "event_sessions",
        "bollinger_20",
        "emb_quantized_topk",
        # round-2 wave 3: decorrelation anchors + interval join
        "tpch_q4",
        "tpch_q18",
        "tpch_q19",
        "event_attribution",
        # round-2 wave 4: curation + sketch + analytics breadth
        "doc_decontaminate",
        "doc_pack_sequences",
        "price_quantile_sketch",
        "max_drawdown",
        "top_volume_per_symbol",
        # round-4 additions
        "emb_pq_topk",
        "emb_ivf_pq_topk",
        "emb_ivfadc_topk",
        "doc_bm25_topk",
        "doc_chunks",
        "doc_token_cms",
        "event_anomaly",
        "tpch_q17",
        "tpch_q21",
        "tpch_q8",
        "volume_bars",
        # round-5 additions: deepest new join tree + stored-index ANN,
        # window-algebra funnel, ingestion-time incremental dedup
        "tpch_q9",
        "emb_ivfpq_indexed_topk",
        "event_funnel",
        "doc_incremental_neardup",
        # round-5 wave 3: pair-join correlation, count-distinct
        # fan-out, chunk-grain dedup, OLS beta, keyword extraction,
        # register-table rolling actives, ANN recall eval
        "returns_corr",
        "rolling_active_users",
        "doc_chunk_dupes",
        "symbol_beta",
        "doc_tfidf_terms",
        "rolling_active_hll",
        "ann_recall",
        # round-5 wave 4: frame-sum rolling risk family
        "rolling_beta_60",
        "rolling_corr_60",
        "drawdown_curve",
        # round-6: distributed EMA recurrence scan + flow/census ops
        "ema_20",
        "macd_12_26_9",
        "donchian_20",
        "event_transitions",
        "event_paths_topk",
        "doc_ngram_topk",
        "asof_price_tolerance",
        # round-8: passage-dedup family (ExactSubstr-style)
        "doc_duplicate_spans",
        "doc_dedup_passages",
        "returns_autocorr",
        "conversion_latency",
        # round-9: one-pass nprobe sweep + CCNet LM tiers + bigram LM
        "ann_recall_curve",
        "doc_lm_buckets",
        "doc_bigram_logprob",
        "doc_lm_score_backoff",
        # round-10 (six entries): trigram backoff, NB domain
        # classifier, one-pass LSH threshold curve, hybrid RRF
        # retrieval, alpha-sampled mixture, stored-BM25-index search
        "doc_lm_score_tri",
        "doc_source_nb",
        "doc_neardup_curve",
        "emb_hybrid_rrf",
        "doc_temperature_mix",
        "doc_bm25_indexed_topk",
        # round-11 second wave: curation compositions, layout/join
        # scale features, and the GD-trained quality filter (the
        # eval entry runs the full train+score+confusion composition)
        "doc_dedup_normalized",
        "doc_source_cap",
        "doc_split_leakage",
        "zorder_range_scan",
        "bloom_semijoin_scan",
        "doc_quality_lr_eval",
        "doc_lr_filtered",
        "doc_dup_flow",
        "event_ab_chisq",
        # round-12: NB serve/append splits + the real header decode
        # + the filter-calibration readout
        "doc_source_nb_indexed",
        "doc_source_nb_appended",
        "multimodal_headers",
        "doc_quality_lr_calibration",
        # round-13: the sparse-identity NB scorer (the nb_sparse
        # bench block carries the dense/sparse crossover pair; this
        # row keeps the entry in the per-round suite record)
        "doc_source_nb_sparse",
        # round-14: real WAV/BMP payload decode
        "multimodal_samples",
    ):
        if name in q:
            out[name] = q[name]
    return out


def steady_state_queries(cleanup: list):
    """Steady-state incremental dedup (VERDICT r5 next-round #5): the
    ``doc_incremental_neardup`` query times index-build + batch query
    together; an ingestion SLA quotes the PER-BATCH marginal cost
    against an index that already exists.  The index is built during
    the (untimed) warm pass and reused by the measured pass, so the
    reported number is the steady-state figure."""
    import tempfile

    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext import dedup as XD

    # every steady-state cache is keyed by sf_dir (r12 review): a
    # constant key would serve a second benched dataset with the
    # first dataset's index/model
    state: dict[str, str] = {}

    def steady(spark, sf_dir):
        corpus = XD.documents_neardup(spark, sf_dir)
        if sf_dir not in state:
            tmp = tempfile.mkdtemp(prefix="bench_neardup_idx_")
            cleanup.append(tmp)
            state[sf_dir] = tmp + "/idx"
            XD.write_neardup_index(
                corpus.filter(F.col("doc_id") % 3 != 0), state[sf_dir]
            )
        return XD.incremental_neardup_pairs(
            corpus.filter(F.col("doc_id") % 3 == 0), state[sf_dir]
        )

    state2: dict[str, str] = {}

    def steady_spans(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if sf_dir not in state2:
            tmp = tempfile.mkdtemp(prefix="bench_gram_idx_")
            cleanup.append(tmp)
            state2[sf_dir] = tmp + "/idx"
            XD.write_gram_index(
                docs.filter(F.col("doc_id") % 3 != 0), state2[sf_dir], k=5
            )
        return XD.incremental_duplicate_spans(
            docs.filter(F.col("doc_id") % 3 == 0), state2[sf_dir], k=5
        )

    state3: dict = {}

    def steady_ivfpq_serve(spark, sf_dir):
        """Serve-only IVF-PQ (VERDICT r8 #6): the three most
        expensive benched queries are dominated by in-query codebook
        training (the oracle contract); the number a deployment cares
        about is search against a STORED index with STORED codebooks.
        Index + codebooks are built during the untimed warm pass
        (train_codebooks returns eagerly-checkpointed frames, so
        reuse costs nothing); the measured pass is probe-bucket →
        pruned partition read → LUT scoring only."""
        from trade_data_collection_service_spark.ext import pq as XQ
        from trade_data_collection_service_spark.ext.similarity import (
            vectors,
        )

        if sf_dir not in state3:
            tmp = tempfile.mkdtemp(prefix="bench_ivfpq_idx_")
            cleanup.append(tmp)
            st = {"idx": tmp + "/index"}
            st["centroids"], st["books"] = XQ.write_ivfpq_index(
                spark, sf_dir, st["idx"]
            )
            state3[sf_dir] = st
        st = state3[sf_dir]
        qs = vectors(spark, sf_dir).filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") < 103)
        )
        return XQ.ivfpq_search_indexed(
            spark,
            st["idx"],
            st["centroids"],
            st["books"],
            qs,
            k=10,
            nprobe=2,
        )

    state4: dict = {}

    def steady_hybrid_serve(spark, sf_dir):
        """Serve-only hybrid RRF (VERDICT r10 #1): the oracle entry
        emb_hybrid_indexed_rrf times BOTH index builds plus the
        serve; a retrieval deployment's steady-state cost is the
        serve alone — query-term posting lists + probed IVF-PQ
        bucket partitions + the depth-bounded fusion.  Both indexes
        are built in the untimed warm pass and reused."""
        from trade_data_collection_service_spark.ext import (
            similarity as XSIM,
        )
        from trade_data_collection_service_spark.ext import pq as XQ
        from trade_data_collection_service_spark.ext import text as XTX

        if sf_dir not in state4:
            tmp = tempfile.mkdtemp(prefix="bench_hybrid_idx_")
            cleanup.append(tmp)
            st = {"sparse": tmp + "/bm25"}
            XTX.write_bm25_index(
                spark.read.parquet(f"{sf_dir}/documents.parquet"),
                st["sparse"],
            )
            st["dense"] = tmp + "/ivfpq"
            st["centroids"], st["books"] = XQ.write_ivfpq_index(
                spark, sf_dir, st["dense"]
            )
            state4[sf_dir] = st
        st = state4[sf_dir]
        return XSIM.hybrid_rrf_indexed_topk(
            spark,
            sf_dir,
            st["sparse"],
            st["dense"],
            st["centroids"],
            st["books"],
        )

    state5: dict = {}

    def steady_lr_serve(spark, sf_dir):
        """Serve-only trained quality filter: doc_quality_lr_eval
        (the benched oracle entry) trains the 20-step model in-query
        (the oracle contract); a deployed filter trains once and
        scores forever.  Weights are learned in the untimed warm
        pass; the measured pass is one map-only scoring aggregate."""
        from trade_data_collection_service_spark.ext.lr import (
            quality_lr_eval,
            train_quality_lr,
        )

        if sf_dir not in state5:
            state5[sf_dir] = train_quality_lr(
                spark.read.parquet(f"{sf_dir}/documents.parquet")
            )
        return quality_lr_eval(spark, sf_dir, weights=state5[sf_dir])

    state6: dict = {}

    def steady_nb_serve(spark, sf_dir):
        """Serve-only NB source classifier: doc_source_nb (the
        benched oracle entry) trains its term censuses in-query (the
        oracle contract); a deployed tagger trains once and scores
        forever.  The index is built in the untimed warm pass; the
        measured pass is one tokenize + census-join + argmax against
        the model at rest."""
        from trade_data_collection_service_spark.ext.text import (
            nb_score_indexed,
            write_nb_index,
        )

        if sf_dir not in state6:
            tmp = tempfile.mkdtemp(prefix="bench_nb_idx_")
            cleanup.append(tmp)
            state6[sf_dir] = tmp + "/index"
            write_nb_index(
                spark.read.parquet(f"{sf_dir}/documents.parquet"),
                state6[sf_dir],
            )
        return nb_score_indexed(
            spark,
            state6[sf_dir],
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
        )

    state7: dict = {}

    def steady_bm25_serve(spark, sf_dir):
        """Serve-only BM25 (VERDICT r13 #4): the posting index is
        built in the untimed warm pass; the measured pass is the
        production retrieval path alone — query-vocab In-list pushed
        into the term-sorted posting scan, weight join, top-k."""
        from trade_data_collection_service_spark.ext.text import (
            bm25_search_indexed,
            write_bm25_index,
        )

        if sf_dir not in state7:
            tmp = tempfile.mkdtemp(prefix="bench_bm25_idx_")
            cleanup.append(tmp)
            state7[sf_dir] = tmp + "/index"
            write_bm25_index(
                spark.read.parquet(f"{sf_dir}/documents.parquet"),
                state7[sf_dir],
            )
        return bm25_search_indexed(spark, state7[sf_dir])

    return {
        "doc_incremental_neardup_steady": steady,
        "doc_incremental_spans_steady": steady_spans,
        "doc_lr_serve_steady": steady_lr_serve,
        "doc_nb_serve_steady": steady_nb_serve,
        "doc_bm25_serve_steady": steady_bm25_serve,
        "emb_ivfpq_serve_steady": steady_ivfpq_serve,
        "emb_hybrid_serve_steady": steady_hybrid_serve,
    }


def skew_join_queries():
    """Planted-skew shuffle-join pair (VERDICT r4 next-round #7): the
    same join + aggregate over lineitem with a key where ~10% of rows
    share one value, plain vs functions.skew.salted_join.  Both sides
    carry a merge hint so the measurement is the shuffle-join shape
    (broadcast would hide the skew).  Identical one-row result; the
    timing delta IS the salting claim as a number."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.functions.skew import salted_join

    RIGHT_MULT = 20  # rows per key on the replicated side

    def _frames(spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        left = li.withColumn(
            "k",
            F.when(F.col("l_orderkey") % 10 == 0, F.lit(0)).otherwise(
                F.pmod(F.hash("l_orderkey"), F.lit(5000)) + 1
            ),
        )
        right = (
            spark.range(5001)
            .select(
                F.col("id").cast("int").alias("k"),
                F.explode(
                    F.array(*[F.lit(i) for i in range(RIGHT_MULT)])
                ).alias("m"),
            )
            .hint("merge")
        )
        return left, right

    def _agg(joined):
        # decimal-exact: a float sum is addition-order-dependent, so
        # plain and salted partitionings could round differently —
        # decimal summation makes "identical one-row result" literal
        v = F.round(F.col("l_extendedprice") * F.col("m"), 2).cast(
            "decimal(38,2)"
        )
        return joined.groupBy().agg(F.sum(v).alias("s"))

    def plain(spark, sf_dir):
        left, right = _frames(spark, sf_dir)
        return _agg(left.join(right, "k"))

    def salted(spark, sf_dir):
        left, right = _frames(spark, sf_dir)
        return _agg(salted_join(left, right, ["k"], salt=8))

    return {"skew_join_plain": plain, "skew_join_salted": salted}


def run_skew_probe(sf_dir: str, reps: int = 3) -> dict | None:
    """Measure the skew pair in a FRESH subprocess JVM (VERDICT r11
    what's-wrong #1): measured inside the main bench session the
    salted reps grew monotonically (r11 recording: 2.33 → 7.20 →
    17.88 s) while the identical pair is rep-stable in a clean JVM
    (plain ~3.3 s, salted ~2.5 s over 5 reps) — the growth is
    suite-tail driver-JVM state, not the operator.  Delegates to the
    shared :func:`_fresh_jvm_probe` runner (one implementation of
    the subprocess protocol; r14 review), keeping the recorded shape
    unchanged."""
    reps_map = _fresh_jvm_probe(
        "SKEWPROBE",
        ["skew_join_plain", "skew_join_salted"],
        sf_dir,
        reps=reps,
        timeout=900,
    )
    if not reps_map:
        return None
    return {
        "isolation": "fresh subprocess JVM",
        "reps_sec": reps_map,
        "median_sec": {
            k: v[len(v) // 2] for k, v in reps_map.items()
        },
    }


def run_skew_pollution_diag(spark, sf_dir: str, reps: int = 3) -> dict:
    """Optional diagnostic (SPARK_GRAFT_SKEW_DIAG=1): re-run the skew
    pair inside the MAIN bench session after the whole suite, with
    driver GC time sampled around it, so the r11 growth has a named
    cause on the record instead of a hand-wave."""
    q = skew_join_queries()

    def _gc_ms() -> int:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return sum(
            beans.get(i).getCollectionTime() for i in range(beans.size())
        )

    out: dict = {"context": "main bench session, post-suite"}
    for name in ("skew_join_plain", "skew_join_salted"):
        g0 = _gc_ms()
        out[name] = [
            round(run_one(spark, q[name], sf_dir), 4) for _ in range(reps)
        ]
        out[name + "_gc_ms"] = _gc_ms() - g0
    return out


def bloom_join_queries():
    """Bloom semi-join reduction pair (functions/bloom.py): the same
    selective fact⋈dim + aggregate, plain vs Bloom-prefiltered, both
    merge-hinted so the measurement is the sort-merge-join shape the
    pre-filter exists for (a broadcast join would filter for free and
    hide the claim).  Identical result; the delta is the shuffle the
    Bloom filter deleted.  The filter is built ONCE and reused (a
    dim's Bloom is as reusable as its broadcast — the serving shape);
    building inline costs two dim-sized jobs, which at bench scale
    would dominate the tiny fact shuffle it deletes."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.functions.bloom import (
        bloom_build,
        bloom_semijoin,
    )

    def _frames(spark, sf_dir):
        fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_suppkey", "l_extendedprice"
        )
        dim = (
            spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .filter(F.col("s_nationkey") % 5 == 3)
            .select("s_suppkey")
            .hint("merge")
        )
        return fact, dim

    def _agg(joined):
        v = F.round(F.col("l_extendedprice"), 2).cast("decimal(38,2)")
        return joined.groupBy().agg(
            F.sum(v).alias("s"), F.count(F.lit(1)).alias("n")
        )

    def plain(spark, sf_dir):
        fact, dim = _frames(spark, sf_dir)
        return _agg(
            fact.join(dim, fact["l_suppkey"] == dim["s_suppkey"])
        )

    built = {}

    def bloomed(spark, sf_dir):
        fact, dim = _frames(spark, sf_dir)
        if sf_dir not in built:
            built[sf_dir] = bloom_build(dim, "s_suppkey")
        return _agg(
            bloom_semijoin(
                fact, dim, "l_suppkey", "s_suppkey", bloom=built[sf_dir]
            )
        )

    return {"bloom_join_plain": plain, "bloom_join_bloomed": bloomed}


def run_bloom_bytes(spark, sf_dir: str) -> dict | None:
    """The Bloom semi-join claim as a number: shuffle-write bytes of
    the plain vs pre-filtered merge join (bloom_join_queries pair,
    filter pre-built outside the measurement).  Wall time at bench
    scale is a wash — the deleted shuffle is tiny here — so the
    BYTES ratio is the honest evidence that the reduction scales
    with the fact, not the host."""
    pair = bloom_join_queries()
    out: dict = {}
    for label, name in (
        ("plain", "bloom_join_plain"),
        ("bloomed", "bloom_join_bloomed"),
    ):
        fn = pair[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        m0 = _shuffle_stage_mark(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        delta = _shuffle_bytes_since(spark, m0)
        out[label] = {
            "wall_sec": round(wall, 4),
            "shuffle_bytes": delta if delta and delta > 0 else None,
        }
    pb = out["plain"]["shuffle_bytes"]
    bb = out["bloomed"]["shuffle_bytes"]
    if pb and bb:
        out["bytes_ratio"] = round(bb / pb, 4)
    return out


def run_zorder_bytes(spark, sf_dir: str, cleanup: list) -> dict | None:
    """The Z-order claim as a deterministic number: how many row
    groups SURVIVE stats-based pruning for the same 2-D box over
    (a) the z-ordered layout (covering-cell partition pruning, then
    per-row-group min/max on both dims) vs (b) the classic one-key-
    sorted layout, where the second dimension's bound prunes nothing
    because every row group spans the full y range.

    Counted from the parquet FOOTERS (pyarrow metadata — the same
    min/max stats Spark's reader prunes on), not from runtime byte
    counters: the status-store flush races a fast query, and at
    fixture scale per-file overhead distorts byte ratios anyway.
    The row-group fraction is the number that transfers to 100 TB.
    Two boxes: ``both_bounded`` (one-key layout still prunes on x)
    and ``y_only`` (x unbounded — the one-key layout must read
    EVERYTHING)."""
    import glob
    import tempfile

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.functions.zorder import (
        covering_buckets,
        read_layout,
        write_zordered,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    tmp = tempfile.mkdtemp(prefix="bench_zorder_")
    cleanup.append(tmp)
    zpath, xpath = f"{tmp}/z", f"{tmp}/x"
    write_zordered(li, zpath, "l_partkey", "l_suppkey")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(xpath)
    )
    xmax = int(li.agg(F.max("l_partkey")).collect()[0][0])
    boxes = {
        "both_bounded": ((40, 159), (2, 15)),
        "y_only": ((0, xmax), (2, 15)),
    }

    def _rg_counts(files, box, with_y=True):
        total = survive = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            xi, yi = names.index("l_partkey"), names.index("l_suppkey")
            for g in range(md.num_row_groups):
                total += 1
                sx = md.row_group(g).column(xi).statistics
                sy = md.row_group(g).column(yi).statistics
                ok = sx.min <= box[0][1] and sx.max >= box[0][0]
                if with_y:
                    ok = ok and sy.min <= box[1][1] and sy.max >= box[1][0]
                if ok:
                    survive += 1
        return total, survive

    layout = read_layout(zpath)
    out: dict = {}
    for box_label, box in boxes.items():
        cells = set(covering_buckets(layout, *box))
        z_all = glob.glob(f"{zpath}/z_bucket=*/*.parquet")
        z_kept = [
            f
            for f in z_all
            if int(f.split("z_bucket=")[1].split("/")[0]) in cells
        ]
        zt_all, _ = _rg_counts(z_all, box)
        _, zs = _rg_counts(z_kept, box)
        xt, xs = _rg_counts(glob.glob(f"{xpath}/*.parquet"), box)
        out[box_label] = {
            "zordered": {
                "row_groups_total": zt_all,
                "row_groups_read": zs,
                "fraction": round(zs / zt_all, 4) if zt_all else None,
            },
            "one_key_sorted": {
                "row_groups_total": xt,
                "row_groups_read": xs,
                "fraction": round(xs / xt, 4) if xt else None,
            },
        }
        zf = out[box_label]["zordered"]["fraction"]
        xf = out[box_label]["one_key_sorted"]["fraction"]
        if zf and xf:
            out[box_label]["fraction_ratio"] = round(zf / xf, 4)
    return out


def run_streaming(spark, sf_dir: str):
    """Streaming-mode throughput (VERDICT r4 next-round #5): replay the
    candle set (with duplicate versions) through start_candle_stream as
    4 micro-batches, full 5-level rollup maintenance per batch, and
    report delivered candles / wall second."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.candles import (
        candles_with_duplicates,
    )
    from trade_data_collection_service_spark.schema import CANDLE_SCHEMA
    from trade_data_collection_service_spark.streaming.pipeline import (
        start_candle_stream,
    )

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
        candles = candles_with_duplicates(spark, sf_dir).select(
            *[f.name for f in CANDLE_SCHEMA.fields]
        )
        n_delivered = candles.count()
        for b in range(4):
            part = candles.filter(
                (
                    (F.unix_timestamp("receipt_timestamp") / 3).cast("long")
                    + F.col("trades")
                )
                % 4
                == b
            )
            part.coalesce(1).write.mode("append").parquet(src)
        t0 = time.perf_counter()
        q = start_candle_stream(
            spark, src, out, ckpt, available_now=True,
            minutes=[1, 5, 15, 60, 1440],
        )
        q.awaitTermination(600)
        if q.exception() is not None:
            raise RuntimeError(str(q.exception())[:500])
        wall = time.perf_counter() - t0
        return round(n_delivered / wall, 1), round(wall, 4)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_streaming_latency(
    spark, sf_dir: str, n_batches: int = 10
) -> dict | None:
    """Event-to-visible latency of the streaming pipeline (VERDICT
    r12 #8): throughput was already benched, but the reference's SLO
    is LATENCY-shaped — candles must be queryable within 2 minutes of
    arrival (data_quality_check.py:130 freshness alert).  Here
    'event' is the moment a micro-batch's file lands committed in the
    source directory (the exchange-push analog) and 'visible' is the
    moment the stream's progress shows those rows consumed — the
    foreachBatch sink has returned, so the rows are queryable in the
    raw table and every rollup level.  One file is dropped at a time
    (maxFilesPerTrigger=1, continuous trigger), latency measured per
    micro-batch, p50/p95 reported against the 120 s SLO.

    Consumption is tracked from progress metadata only (batchId →
    numInputRows, deduped by batchId so recentProgress rotation can't
    double-count) — polling never reads the output tables, so the
    measurement does not perturb the pipeline it measures."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.candles import (
        candles_with_duplicates,
    )
    from trade_data_collection_service_spark.schema import CANDLE_SCHEMA
    from trade_data_collection_service_spark.streaming.pipeline import (
        start_candle_stream,
    )

    tmp = tempfile.mkdtemp(prefix="bench_stream_lat_")
    q = None
    try:
        src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
        os.makedirs(src, exist_ok=True)
        candles = candles_with_duplicates(spark, sf_dir).select(
            *[f.name for f in CANDLE_SCHEMA.fields]
        )
        bucket = (
            (F.unix_timestamp("receipt_timestamp") / 3).cast("long")
            + F.col("trades")
        ) % n_batches
        parts = [
            candles.filter(bucket == b).localCheckpoint(eager=False)
            for b in range(n_batches)
        ]
        sizes = [p.count() for p in parts]
        q = start_candle_stream(
            spark,
            src,
            out,
            ckpt,
            available_now=False,
            minutes=[1, 5, 15, 60, 1440],
        )
        seen: dict = {}

        def consumed() -> int:
            for p in q.recentProgress:
                seen[p["batchId"]] = int(p["numInputRows"])
            return sum(seen.values())

        latencies = []
        timed_sizes = []
        delivered = 0
        for b in range(n_batches):
            if sizes[b] == 0:
                # an empty bucket makes expected == delivered, so the
                # wait loop would exit on the first poll and record a
                # near-zero latency that skews p50/p95 optimistically
                # (r13 review) — nothing was delivered, nothing to time
                continue
            parts[b].coalesce(1).write.mode("append").parquet(src)
            expected = delivered + sizes[b]
            a = time.perf_counter()
            while time.perf_counter() - a < 180:
                if q.exception() is not None:
                    raise RuntimeError(str(q.exception())[:500])
                if consumed() >= expected:
                    break
                time.sleep(0.05)
            else:
                print(
                    f"bench streaming latency: batch {b} not visible"
                    " within 180s — aborting probe",
                    file=sys.stderr,
                )
                break
            latencies.append(round(time.perf_counter() - a, 3))
            timed_sizes.append(sizes[b])
            delivered = expected
        if not latencies:
            return None
        lat = sorted(latencies)
        n = len(lat)
        return {
            "n_batches": n,
            "batch_rows_mean": round(sum(timed_sizes) / n, 1),
            "p50_sec": lat[n // 2],
            "p95_sec": lat[min(n - 1, int(round(0.95 * (n - 1))))],
            "max_sec": lat[-1],
            "latencies_sec": latencies,
            "slo_sec": 120.0,
            "within_slo": lat[-1] < 120.0,
        }
    finally:
        if q is not None:
            try:
                q.stop()
            except Exception:
                pass
        shutil.rmtree(tmp, ignore_errors=True)


def _completed_stages(spark) -> list | None:
    """Completed-stage records from the local status REST endpoint
    (the AppStatusStore's public face).  None when the UI is
    disabled — callers degrade to wall-time-only measurements."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as r:
            return json.load(r)
    except Exception:
        return None


def _shuffle_stage_mark(spark) -> int | None:
    """Largest completed stage id right now (-1 when none yet).

    r14 measurement fix (guide §1): the old protocol diffed the
    CUMULATIVE shuffle-write sum over *retained* stages, which only
    stays correct while no stage is ever evicted — forcing
    ``spark.ui.retainedStages=100000`` for the whole ~13k-stage
    suite, i.e. driver-heap listener state growing all session (one
    of the suspected warm-suite drift sources).  Marking the max
    stage id and summing only stages STARTED after the mark is
    eviction-proof for any window small enough to fit default
    retention (the dozen stages of one measured query), so the big
    retention override is gone."""
    stages = _completed_stages(spark)
    if stages is None:
        return None
    return max((int(st.get("stageId", -1)) for st in stages), default=-1)


def _shuffle_bytes_since(spark, mark: int | None) -> int | None:
    """Shuffle-write bytes of completed stages with id > ``mark``."""
    if mark is None:
        return None
    stages = _completed_stages(spark)
    if stages is None:
        return None
    return sum(
        int(st.get("shuffleWriteBytes", 0))
        for st in stages
        if int(st.get("stageId", -1)) > mark
    )


def run_spans_gram_bytes(spark, sf_dir: str) -> dict | None:
    """Hashed-gram shuffle-byte claim as a number (VERDICT r8 #4):
    duplicate_spans with literal k-token string keys vs 128-bit md5
    keys (output-identical, pytest-proven) — record the shuffle-write
    bytes and wall of each.  Measured at the oracle's k=5 AND at
    k=25 (the Lee et al. regime uses ~50-token windows): short grams
    lz4-compress well in the shuffle, so the k=5 saving is modest;
    the long-gram row is where fixed 16-byte keys earn their keep."""
    from trade_data_collection_service_spark.ext.dedup import (
        duplicate_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {}
    for k in (5, 25):
        row: dict = {}
        for label, hashed in (("literal", False), ("hashed", True)):
            df = duplicate_spans(docs, k=k, hash_grams=hashed)
            df.write.format("noop").mode("overwrite").save()  # warm
            m0 = _shuffle_stage_mark(spark)
            t0 = time.perf_counter()
            duplicate_spans(docs, k=k, hash_grams=hashed).write.format(
                "noop"
            ).mode("overwrite").save()
            wall = time.perf_counter() - t0
            # id-windowed delta (r14): only stages newer than the mark
            # count, so default stage retention suffices and a failed
            # poll degrades to wall-time-only rather than nonsense
            delta = _shuffle_bytes_since(spark, m0)
            row[label] = {
                "wall_sec": round(wall, 4),
                "shuffle_bytes": delta if delta and delta > 0 else None,
            }
        lit_b = row["literal"]["shuffle_bytes"]
        h_b = row["hashed"]["shuffle_bytes"]
        if lit_b and h_b:
            row["bytes_ratio"] = round(h_b / lit_b, 4)
        out[f"k{k}"] = row
    return out


def run_bpe_train(spark, n_merges: int = 500, batch: int = 32) -> dict:
    """Tokenizer-build envelope (VERDICT r6 next-round #3): merges/sec
    for a 500-rule BPE train with batched merge rounds.  The fixture
    corpora saturate BPE long before 500 rules (documents/part text is
    a 16-31 distinct-word synthetic vocabulary — every word reaches a
    single symbol within ~150 merges), so the corpus here is a
    deterministic hash-derived Zipf vocabulary at realistic richness
    (~4k distinct words, hex alphabet), generated distributed — the
    figure measures the TRAINER (round count, scheduler overhead,
    fold cost), not fixture text.  ``rounds`` vs ``merges`` is the
    job-count saving over the one-rule-per-round classic loop
    (batched ≡ sequential, pytest-proven in tests/test_bpe.py)."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.bpe import (
        train_bpe_from_vocab,
    )

    vocab = (
        spark.range(4000)
        .select(
            F.expr(
                "substring(md5(cast(id as string)), 1,"
                " cast(id % 8 + 3 as int))"
            ).alias("word"),
            (F.lit(1) + F.lit(1_000_000) / (F.col("id") + 1))
            .cast("long")
            .alias("weight"),
        )
        .groupBy("word")
        .agg(F.sum("weight").alias("weight"))
    )
    # vocab stays LAZY: the word census executes inside each mode's
    # timed window, exactly as BENCH_r07 recorded it — checkpointing
    # it out would read cross-round as a phantom BPE speedup.  The
    # fast run executes second on a warm JVM; its census is cached at
    # the FS level at most, and the ~seconds census is the same
    # constant in both figures.
    stats: dict = {}
    t0 = time.perf_counter()
    merges, _ = train_bpe_from_vocab(vocab, n_merges, batch=batch, stats=stats)
    wall = time.perf_counter() - t0
    # exact=False (VERDICT r7 #7): whole-disjoint-prefix batching —
    # rule order may diverge from sequential (documented, pytest
    # tests/test_bpe.py::test_fast_mode_whole_prefix_batching); this
    # is the envelope that closes a 32k-merge build to ~1k jobs.
    fstats: dict = {}
    t0 = time.perf_counter()
    fmerges, _ = train_bpe_from_vocab(
        vocab, n_merges, batch=batch, stats=fstats, exact=False
    )
    fwall = time.perf_counter() - t0
    # fast-mode envelope at depth (VERDICT r8 #8): the "32k merges in
    # ~1-2k jobs" extrapolation rested on a 500-merge run; validate
    # that merges/round holds at 2000 merges.  The synthetic vocab may
    # exhaust its mergeable pairs first — merges < requested is then
    # the honest recording, not a failure.
    f2k = None
    if os.environ.get("SPARK_GRAFT_SKIP_BPE2000") != "1":
        f2stats: dict = {}
        t0 = time.perf_counter()
        f2merges, _ = train_bpe_from_vocab(
            vocab, 2000, batch=batch, stats=f2stats, exact=False
        )
        f2wall = time.perf_counter() - t0
        f2k = {
            "merges": len(f2merges),
            "rounds": f2stats["rounds"],
            "wall_sec": round(f2wall, 2),
            "merges_per_sec": round(len(f2merges) / f2wall, 2),
            "merges_per_round": round(
                len(f2merges) / max(f2stats["rounds"], 1), 1
            ),
        }
    return {
        "merges": len(merges),
        "rounds": stats["rounds"],
        "batch": batch,
        "wall_sec": round(wall, 2),
        "merges_per_sec": round(len(merges) / wall, 2),
        "jobs_saved_vs_sequential": len(merges) - stats["rounds"],
        "fast": {
            "merges": len(fmerges),
            "rounds": fstats["rounds"],
            "wall_sec": round(fwall, 2),
            "merges_per_sec": round(len(fmerges) / fwall, 2),
            "merges_per_round": round(len(fmerges) / max(fstats["rounds"], 1), 1),
        },
        "fast2000": f2k,
    }


def run_bpe_encode(spark, sf_dir: str, n_merges: int = 64) -> dict:
    """Tokenizer-APPLY envelope (r9): train a small fast-mode rule set
    on the documents table, then encode the same table with
    ``encode_corpus`` — the corpus-scale apply side (distinct-word
    segmentation + one positioned join back).  Only the encode is in
    the timed window; tokens/sec is the deployment figure (the token
    budget of a curation pipeline is enforced with exactly this
    pass)."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.bpe import (
        encode_corpus,
        train_bpe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    merges, _ = train_bpe(docs, n_merges=n_merges, exact=False)
    t0 = time.perf_counter()
    n_docs, n_tokens = (
        encode_corpus(docs, merges)
        .agg(F.count(F.lit(1)), F.sum("n_tokens"))
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    return {
        "merges": len(merges),
        "docs": int(n_docs),
        "tokens": int(n_tokens),
        "wall_sec": round(wall, 2),
        "tokens_per_sec": round(n_tokens / wall, 1),
    }


def _ingest_cost_model(points: list[tuple[str, int, float]]) -> dict:
    """Linear fit of per-batch ingest wall time (VERDICT r12 #6, r13
    #6): t(n) = fixed_sec + per_item_sec·n, least-squares over the
    steady-state batches.  The single-size steady number conflated
    ~2 s of fixed trigger cost with per-item work; the fit
    extrapolates to production batch sizes: asymptotic throughput is
    1/per_item_sec and throughput reaches 80% of asymptotic at
    n = 4·fixed/per_item (set n/(fixed+k·n) = 0.8/k).

    With THREE batch sizes (r13 #6) the fit gains a residual check a
    two-point line can't have: ``max_residual_pct`` is the worst
    |predicted − observed| / observed, and above 10% the fit is
    demoted to ``"non-linear, investigate"`` — the model's linearity
    is then a measured claim, not an assumption.  A non-positive
    slope (measurement noise at these batch sizes) records the raw
    points with fit=None rather than a nonsense extrapolation."""
    out: dict = {
        "points": [
            {"batch": label, "n_items": int(n), "wall_sec": round(t, 2)}
            for label, n, t in points
        ]
    }
    ns = [float(n) for _, n, _ in points]
    ts = [float(t) for _, _, t in points]
    if len(points) < 2 or len(set(ns)) < 2:
        out["fit"] = None
        return out
    # least squares (exact interpolation when len == 2)
    m = len(ns)
    mean_n, mean_t = sum(ns) / m, sum(ts) / m
    sxx = sum((n - mean_n) ** 2 for n in ns)
    sxy = sum((n - mean_n) * (t - mean_t) for n, t in zip(ns, ts))
    k = sxy / sxx
    if k <= 0:
        out["fit"] = None
        return out
    fixed = mean_t - k * mean_n
    resid = [
        abs((fixed + k * n) - t) / t for n, t in zip(ns, ts) if t > 0
    ]
    max_resid = max(resid) if resid else 0.0
    fit = {
        "fixed_sec": round(fixed, 3),
        "per_kitem_sec": round(k * 1000, 4),
        "asymptotic_items_per_sec": round(1 / k, 1),
        "crossover_80pct_batch": (
            int(round(4 * fixed / k)) if fixed > 0 else 0
        ),
        "max_residual_pct": round(100 * max_resid, 2),
    }
    if len(points) >= 3 and max_resid > 0.10:
        fit["verdict"] = "non-linear, investigate"
    out["fit"] = fit
    return out


def run_doc_ingest_bench(spark, sf_dir: str, cleanup: list) -> dict:
    """Dedup-on-arrival throughput (r9): seed the near-dup index with
    2/3 of the corpus (untimed), then time ONE ingest_batch of the
    remaining 1/3 — cross dedup vs the stored index + intra-batch LSH
    + batch-keyed index append + accepted-docs write, the full
    ingestion loop a curation deployment runs per micro-batch."""
    import tempfile

    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.dedup import (
        documents_neardup,
        write_neardup_index,
    )
    from trade_data_collection_service_spark.streaming.doc_ingest import (
        ingest_batch,
    )

    corpus = documents_neardup(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="bench_doc_ingest_")
    cleanup.append(tmp)
    write_neardup_index(
        corpus.filter(F.col("doc_id") % 3 != 0), f"{tmp}/idx"
    )
    batch = corpus.filter(F.col("doc_id") % 3 == 0)
    n_batch = batch.count()
    t0 = time.perf_counter()
    n_accepted = ingest_batch(batch, f"{tmp}/idx", f"{tmp}/out", "bench")
    wall = time.perf_counter() - t0
    # Steady-state marginal throughput (VERDICT r11 #8) + cost model
    # (VERDICT r12 #6): the single number above includes first-trigger
    # warmup (job setup, index file listing, codegen) that a
    # deployment pays once, not per batch.  Re-seed with HALF the
    # corpus, run a small WARMUP batch, then time two
    # steady-state batches of DIFFERENT sizes (1/16 and 6/16 of the
    # corpus, disjoint odd-id residues) — the large one is the steady
    # figure, the pair feeds the linear (fixed_sec, per_kdoc_sec) fit
    # so the number extrapolates across batch sizes.
    tmp2 = tempfile.mkdtemp(prefix="bench_doc_ingest_steady_")
    cleanup.append(tmp2)
    write_neardup_index(
        corpus.filter(F.col("doc_id") % 2 == 0), f"{tmp2}/idx"
    )
    steady = None
    points: list[tuple[str, int, float]] = []
    batches = (
        # a small warmup batch absorbs trigger setup; the three timed
        # batches span 4x in size (1:2:4 residue classes) so the
        # fit's slope rises above rep noise AND the mid point carries
        # a real residual check (VERDICT r13 #6 — a line through two
        # points can't falsify linearity)
        ("warm", F.col("doc_id") % 16 == 1),
        ("small", F.col("doc_id") % 16 == 3),
        ("mid", (F.col("doc_id") % 16).isin(5, 7)),
        ("large", (F.col("doc_id") % 16).isin(9, 11, 13, 15)),
    )
    for i, (label, cond) in enumerate(batches):
        sub = corpus.filter(cond)
        n_sub = sub.count()
        t1 = time.perf_counter()
        ingest_batch(sub, f"{tmp2}/idx", f"{tmp2}/out", f"bench-{i}")
        dt = time.perf_counter() - t1
        if label != "warm":
            points.append((label, n_sub, dt))
        if label == "large":
            steady = {
                "steady_docs_per_sec": round(n_sub / dt, 1),
                "steady_batch_docs": int(n_sub),
                "steady_wall_sec": round(dt, 2),
            }
    return {
        "batch_docs": int(n_batch),
        "accepted": int(n_accepted),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_batch / wall, 1),
        **(steady or {}),
        "cost_model": _ingest_cost_model(points),
    }


def run_doc_ingest_lm_bench(spark, sf_dir: str, cleanup: list) -> dict:
    """Dedup + LM-quality gate-on-arrival throughput (r10, VERDICT r9
    #3): seed the near-dup index AND train+store the bigram LM on 2/3
    of the corpus (untimed), then time ONE gated ingest_batch of the
    remaining 1/3 — the full CCNet curation loop (near-dup reject +
    perplexity-tier reject) as one micro-batch.  Compare against the
    ungated doc_ingest row: the delta is the marginal cost of the LM
    join (O(batch bigrams) LEFT-joins against the stored censuses)."""
    import tempfile

    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.dedup import (
        documents_neardup,
        write_neardup_index,
    )
    from trade_data_collection_service_spark.ext.text import (
        read_lm_index,
        train_bigram_lm,
        write_lm_index,
    )
    from trade_data_collection_service_spark.streaming.doc_ingest import (
        ingest_batch,
    )

    corpus = documents_neardup(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="bench_doc_ingest_lm_")
    cleanup.append(tmp)
    seed = corpus.filter(F.col("doc_id") % 3 != 0)
    write_neardup_index(seed, f"{tmp}/idx")
    write_lm_index(train_bigram_lm(seed), f"{tmp}/lm")
    lm = read_lm_index(spark, f"{tmp}/lm")
    # CCNet-style tier threshold, estimated on the TRAINING corpus
    # (untimed setup, like the index/LM build): the seed's 1/3
    # self-score quantile — CCNet's drop-the-tail boundary — so the
    # gate demonstrably splits the batch instead of rubber-stamping it
    from trade_data_collection_service_spark.ext.text import lm_score

    thr = lm_score(seed, lm).approxQuantile(
        "avg_logprob", [1.0 / 3.0], 0.01
    )[0]
    batch = corpus.filter(F.col("doc_id") % 3 == 0)
    n_batch = batch.count()
    t0 = time.perf_counter()
    n_accepted = ingest_batch(
        batch,
        f"{tmp}/idx",
        f"{tmp}/out",
        "bench",
        lm=lm,
        lm_min_logprob=thr,
    )
    wall = time.perf_counter() - t0
    return {
        "batch_docs": int(n_batch),
        "accepted": int(n_accepted),
        "lm_min_logprob": round(thr, 6),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_batch / wall, 1),
    }


def run_emb_ingest_bench(spark, sf_dir: str, cleanup: list) -> dict:
    """Searchable-on-arrival throughput (r9): seed the IVF-PQ store
    with 2/3 of the vectors (untimed, quantizers trained + persisted
    once), then time ONE ingest_embeddings of the remaining 1/3 —
    quantizer read-back + map-side assign/encode + batch-keyed index
    append + vector-store write, the per-micro-batch loop of
    streaming/emb_ingest.py."""
    import tempfile

    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.similarity import vectors
    from trade_data_collection_service_spark.streaming.emb_ingest import (
        ingest_embeddings,
        init_emb_store,
    )

    tmp = tempfile.mkdtemp(prefix="bench_emb_ingest_")
    cleanup.append(tmp)
    init_emb_store(
        spark,
        sf_dir,
        f"{tmp}/idx",
        source=vectors(spark, sf_dir).filter(F.col("vec_id") % 3 != 0),
    )
    batch = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") % 3 == 0
    )
    n_batch = batch.count()
    t0 = time.perf_counter()
    n = ingest_embeddings(batch, f"{tmp}/idx", f"{tmp}/out", "bench")
    wall = time.perf_counter() - t0
    # Steady-state marginal throughput (the doc_ingest discipline,
    # VERDICT r11 #8) + two-size cost model (VERDICT r12 #6): a
    # small warmup batch against a half-seeded store, then THREE
    # steady batches of different sizes (1/16, 2/16, 4/16) for the
    # (fixed_sec, per_kvec_sec) fit + residual check (r13 #6).
    tmp2 = tempfile.mkdtemp(prefix="bench_emb_ingest_steady_")
    cleanup.append(tmp2)
    init_emb_store(
        spark,
        sf_dir,
        f"{tmp2}/idx",
        source=vectors(spark, sf_dir).filter(F.col("vec_id") % 2 == 0),
    )
    steady = {}
    points: list[tuple[str, int, float]] = []
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batches = (
        ("warm", F.col("vec_id") % 16 == 1),
        ("small", F.col("vec_id") % 16 == 3),
        ("mid", (F.col("vec_id") % 16).isin(5, 7)),
        ("large", (F.col("vec_id") % 16).isin(9, 11, 13, 15)),
    )
    for i, (label, cond) in enumerate(batches):
        sub = emb.filter(cond)
        n_sub = sub.count()
        t1 = time.perf_counter()
        ingest_embeddings(sub, f"{tmp2}/idx", f"{tmp2}/out", f"bench-{i}")
        dt = time.perf_counter() - t1
        if label != "warm":
            points.append((label, n_sub, dt))
        if label == "large":
            steady = {
                "steady_vectors_per_sec": round(n_sub / dt, 1),
                "steady_batch_vectors": int(n_sub),
                "steady_wall_sec": round(dt, 2),
            }
    return {
        "batch_vectors": int(n_batch),
        "appended": int(n),
        "wall_sec": round(wall, 2),
        "vectors_per_sec": round(n_batch / wall, 1),
        **steady,
        "cost_model": _ingest_cost_model(points),
    }


def run_nb_sparse_bench(spark, sf_dir: str) -> dict:
    """Dense vs sparse NB scoring (VERDICT r12 #7), on BOTH regimes:
    the shared-vocabulary fixture (where r12 measured the sparse
    rewrite 0–30% slower — the recorded negative result; dense stays
    the library default) and a disjoint-vocabulary variant (every
    token prefixed with its source id, so the sparse inner term join
    emits ~1 source per term instead of n_sources — the regime the
    flag exists for).  Model build rides inside both timings
    identically; the delta is the scoring path."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.text import (
        _nb_model,
        _nb_score,
        _nb_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    disjoint = docs.filter(F.col("source").isNotNull()).withColumn(
        "text",
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda t: F.concat_ws("_", F.col("source"), t),
            ),
            " ",
        ),
    )

    from trade_data_collection_service_spark.ext.text import (
        nb_auto_sparse,
    )

    def _run(corpus, sparse) -> float:
        census, partials = _nb_model(corpus)
        stats, vocab = _nb_stats(census, partials)
        # plan construction sits INSIDE the timer: lazy (free) for
        # the explicit branches, and for sparse=None it runs the
        # density-decision job — so auto_sec is genuinely end to end
        # (r14 review: constructing outside the timer hid the
        # decision cost)
        t0 = time.perf_counter()
        df = _nb_score(corpus, census, stats, vocab, sparse=sparse)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out: dict = {}
    for label, corpus in (("shared", docs), ("disjoint", disjoint)):
        row: dict = {}
        for mode, sparse in (("dense", False), ("sparse", True)):
            _run(corpus, sparse)  # warm
            row[f"{mode}_sec"] = round(_run(corpus, sparse), 4)
        row["sparse_over_dense"] = round(
            row["sparse_sec"] / row["dense_sec"], 4
        )
        # r14 auto-switch (VERDICT r13 #7): record which branch the
        # density heuristic picks on this fixture, whether that IS
        # the measured winner, and what the auto path costs end to
        # end (decision read included)
        census, _partials = _nb_model(corpus)
        pick = nb_auto_sparse(census)
        _run(corpus, None)  # warm
        row["auto_sec"] = round(_run(corpus, None), 4)
        row["auto_picked"] = "sparse" if pick["sparse"] else "dense"
        row["auto_density"] = pick["density"]
        # single-shot timings at suite scale carry ~±20% noise, so a
        # "winner" is only declared outside a 25% tie band — the pick
        # is judged wrong only when it loses a CLEAR race
        ratio = row["sparse_over_dense"]
        winner = (
            "sparse" if ratio <= 0.8
            else "dense" if ratio >= 1.25
            else "tie"
        )
        row["measured_winner"] = winner
        row["auto_picked_winner"] = (
            winner == "tie" or row["auto_picked"] == winner
        )
        out[label] = row
    return out


def _fresh_jvm_probe(
    tag: str,
    names: list[str],
    sf_dir: str,
    reps: int = 3,
    prelude: str = "",
    timeout: int = 2400,
) -> dict | None:
    """Measure named queries in ONE fresh subprocess JVM (the
    run_skew_probe protocol, generalized): warm once, then
    ``reps``-rep sorted timings per query.  Names resolve against the
    bench suite first (steady-state entries live only there), then
    the full oracle registry.  ``prelude`` is python source run
    before the SparkSession exists — the lease-off probe uses it to
    monkeypatch the maintenance lease away."""
    import subprocess

    code = (
        "import json, shutil, bench\n"
        "from trade_data_collection_service_spark.session import get_spark\n"
        + prelude
        + "spark = get_spark('bench-probe')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "cleanup = []\n"
        "suite = {**bench.headline_queries(),\n"
        "         **bench.steady_state_queries(cleanup),\n"
        "         **bench.bloom_join_queries(),\n"
        "         **bench.skew_join_queries()}\n"
        "import __spark_entry__ as entrymod\n"
        "q = entrymod.queries()\n"
        f"names = {list(names)!r}\n"
        "out = {}\n"
        "for n in names:\n"
        "    fn = suite.get(n) or q.get(n)\n"
        "    if fn is None:\n"
        "        continue\n"
        f"    bench.run_one(spark, fn, {sf_dir!r})\n"
        "    out[n] = sorted(\n"
        f"        round(bench.run_one(spark, fn, {sf_dir!r}), 4)\n"
        f"        for _ in range({int(reps)})\n"
        "    )\n"
        f"print({tag!r} + ' ' + json.dumps(out))\n"
        "for p in cleanup:\n"
        "    shutil.rmtree(p, ignore_errors=True)\n"
        "spark.stop()\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=_repo_root(),
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith(tag + " "):
                return json.loads(line[len(tag) + 1 :])
        print(
            f"bench {tag}: no result line (rc={proc.returncode}):"
            f" {proc.stderr[-500:]}",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover
        print(f"bench {tag} failed: {e}", file=sys.stderr)
    return None


# The oracle entries whose in-query maintenance path takes the
# index lease (write/append under maintenance_lease) — the set whose
# r13 1.1-1.6x raw regressions were slot-vs-lease-ambiguous.
_LEASE_ENTRIES = (
    "doc_incremental_neardup",
    "doc_incremental_spans",
    "doc_bm25_indexed_topk",
    "doc_bm25_appended_topk",
    "emb_hybrid_indexed_rrf",
    "emb_ivfpq_indexed_topk",
    "emb_ivfpq_appended_topk",
    "emb_ivf_appended_topk",
)

def run_lease_overhead(sf_dir: str, reps: int = 5) -> dict | None:
    """Isolate the maintenance-lease cost on the lease-taking entries
    (VERDICT r13 #3): the same entry measured lease-ON and lease-OFF
    (monkeypatched to a no-op context manager — every maintenance op
    still runs, only the lease create/read-back/release I/O
    disappears), with the two configs INTERLEAVED rep-by-rep inside
    the SAME fresh subprocess JVM (two entries per JVM, the
    isolated-top10 budget).  The first protocol — one whole JVM per
    config — measured the OFF side up to 70% slower purely from
    run-order/JVM-state drift (r14 first canonical recording), so
    alternation is what makes the delta attributable to the lease.
    overhead_pct > ~5 on any entry means the lease should batch its
    heartbeat or be taken once per entry rather than per maintenance
    op; ~0 attributes the r13 raw regressions to the host slot.

    reps defaults to 5 (was 3): across the three r14 probe runs the
    3-rep medians put single entries past the 5% threshold four
    times, never the same entry twice — each flag was ±10% rep-spread
    noise, not lease cost (closing run's 8.93% crosser re-measured
    0.57%).  Five interleaved reps tighten the median enough for a
    single-entry 5% reading to be worth acting on, at ~2–4 min extra
    probe wall time."""
    import subprocess

    names = list(_LEASE_ENTRIES)
    got: dict[str, dict] = {}
    for i in range(0, len(names), 2):
        chunk = names[i : i + 2]
        code = (
            "import contextlib, json, bench\n"
            "from trade_data_collection_service_spark.session import"
            " get_spark\n"
            "from trade_data_collection_service_spark.ext import"
            " dedup as _D\n"
            "_real = _D.maintenance_lease\n"
            "class _NoopLease:\n"
            "    maintainer = 'lease-off-probe'\n"
            "    def heartbeat(self):\n"
            "        pass\n"
            "@contextlib.contextmanager\n"
            "def _noop(spark, path, op, timeout_sec=None):\n"
            "    yield _NoopLease()\n"
            "spark = get_spark('lease-probe')\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            "import __spark_entry__ as entrymod\n"
            "q = entrymod.queries()\n"
            "out = {}\n"
            f"for n in {chunk!r}:\n"
            f"    bench.run_one(spark, q[n], {sf_dir!r})\n"
            "    on, off = [], []\n"
            f"    for _ in range({int(reps)}):\n"
            "        _D.maintenance_lease = _real\n"
            "        on.append(round("
            f"bench.run_one(spark, q[n], {sf_dir!r}), 4))\n"
            "        _D.maintenance_lease = _noop\n"
            "        off.append(round("
            f"bench.run_one(spark, q[n], {sf_dir!r}), 4))\n"
            "    _D.maintenance_lease = _real\n"
            "    out[n] = {'on': sorted(on), 'off': sorted(off)}\n"
            "print('LEASEPAIR ' + json.dumps(out))\n"
            "spark.stop()\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                cwd=_repo_root(),
                capture_output=True,
                text=True,
                timeout=2400,
            )
            for line in reversed(proc.stdout.splitlines()):
                if line.startswith("LEASEPAIR "):
                    got.update(json.loads(line[len("LEASEPAIR "):]))
                    break
            else:
                print(
                    "bench lease probe: no result line"
                    f" (rc={proc.returncode}): {proc.stderr[-400:]}",
                    file=sys.stderr,
                )
        except Exception as e:  # pragma: no cover
            print(f"bench lease probe failed: {e}", file=sys.stderr)
    if not got:
        return None
    entries: dict[str, dict] = {}
    worst = 0.0
    for name, pair in got.items():
        a, b = pair["on"], pair["off"]
        m_on, m_off = a[len(a) // 2], b[len(b) // 2]
        pct = round(100 * (m_on - m_off) / m_off, 2) if m_off > 0 else None
        entries[name] = {
            "lease_on_sec": m_on,
            "lease_off_sec": m_off,
            "on_reps_sec": a,
            "off_reps_sec": b,
            "overhead_pct": pct,
        }
        if pct is not None:
            worst = max(worst, pct)
    return {
        "isolation": "ON/OFF interleaved per rep in one fresh"
        f" subprocess JVM per 2 entries, {reps}-rep medians",
        "entries": entries,
        "max_overhead_pct": round(worst, 2),
        "action_threshold_pct": 5.0,
    }


def run_isolated_top10(
    sf_dir: str, timings: dict[str, float], n: int = 10, reps: int = 3
) -> dict | None:
    """Fresh-JVM medians for the most expensive suite entries
    (VERDICT r13 #5): the warm in-session suite drifts ~10% between
    same-HEAD runs (JVM state), so cross-round per-query deltas on
    the big entries were drift-limited.  The skew probe protocol —
    fresh subprocess, 3-rep medians — applied to the top-``n`` by
    this round's suite timing; the warm suite remains the throughput
    record, these medians are the cross-round comparison basis."""
    ranked = sorted(
        (
            (name, t)
            for name, t in timings.items()
            if t > 0 and not name.startswith("skew_join")
        ),
        key=lambda kv: -kv[1],
    )[:n]
    names = [name for name, _ in ranked]
    if not names:
        return None
    # two entries per subprocess (warm + reps ≈ 8 heavy executions —
    # the skew probe's proven budget): one shared JVM for all ten
    # would rebuild the suite-tail state drift this probe exists to
    # remove (r14 review)
    got: dict[str, list[float]] = {}
    for i in range(0, len(names), 2):
        chunk = names[i : i + 2]
        part = _fresh_jvm_probe("ISOTOP", chunk, sf_dir, reps=reps)
        if part:
            got.update(part)
    if not got:
        return None
    return {
        "isolation": "fresh subprocess JVM per 2 entries,"
        f" {reps}-rep medians",
        "picked_by": "suite timing, descending",
        "entries": {
            name: {
                "suite_sec": timings.get(name),
                "reps_sec": v,
                "median_sec": v[len(v) // 2],
            }
            for name, v in got.items()
        },
    }


# Pinned recall floor for the indexed ANN ladder (VERDICT r13 #8).
# The eval is 3 queries x recall@3 (granularity 1/9): the measured
# curve at sf0.1 is mean 0.444/0.556/0.778/0.889 for nprobe 1..4, so
# the floor sits one granularity step under the nprobe=4 value — a
# real quality regression (codebook/bucket damage) lands >= one step
# below, while the current index passes.
_ANN_RECALL_FLOOR = 0.85


def run_ann_quality(spark, sf_dir: str) -> dict | None:
    """Recall@k for the IVF ladder, recorded per round next to its
    latency (VERDICT r13 #8): latency without recall lets an index
    'win' by returning garbage.  Reads the one-pass nprobe sweep
    (ann_recall_curve — bounded: queries x nprobe rows) and flags if
    the max-nprobe mean drops below the pinned floor; the flag rides
    the compact stdout line the driver parses."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    curve = q["ann_recall_curve"](spark, sf_dir).collect()
    by_nprobe: dict[int, list[float]] = {}
    for r in curve:
        by_nprobe.setdefault(int(r["nprobe"]), []).append(
            float(r["recall_at_k"])
        )
    means = {
        np_: round(sum(v) / len(v), 4)
        for np_, v in sorted(by_nprobe.items())
    }
    if not means:
        return None
    max_np = max(means)
    # the floor is pinned against the CANONICAL sf0.1 curve (recall
    # depends on corpus size vs the fixed bucket count, so smaller
    # fixtures legitimately sit lower); at other scales the means are
    # recorded but the pass/fail verdict stays None
    at_canonical = "sf0.1" in sf_dir
    ok = (
        means[max_np] >= _ANN_RECALL_FLOOR if at_canonical else None
    )
    if ok is False:
        print(
            f"bench ann_quality: recall@k mean {means[max_np]} at"
            f" nprobe={max_np} fell below the {_ANN_RECALL_FLOOR}"
            " floor — indexed ANN quality regressed",
            file=sys.stderr,
        )
    return {
        "mean_recall_by_nprobe": {str(k): v for k, v in means.items()},
        "floor": _ANN_RECALL_FLOOR,
        "floor_nprobe": max_np,
        "floor_scale": "sf0.1",
        "ok": ok,
    }


# Headline queries whose growth exponent is MEASURED, not argued
# (VERDICT r12 #2): sf0.01 -> sf0.1 is 10x the data, so a wall-time
# ratio far above 10x means a super-linear term (hidden quadratic,
# skewed key, driver-sized state) that plan inspection missed.  The
# flag threshold is 15x: linear-with-fixed-overhead lands well BELOW
# 10x (the sf0.01 run amortizes the same job-setup cost over less
# data), so >15x is a real alarm, not noise.
_SCALING_QUERIES = (
    "candles_1m",
    "cascade_1d",
    "dedup_full",
    "watchdog_cycle",
    "doc_dedup_exact",
    "doc_minhash_lsh",
    "doc_duplicate_spans",
    "corpus_curated",
    "emb_ivfpq_indexed_topk",
    "doc_source_nb",
    "doc_lr_filtered",
    "tpch_q1",
    "tpch_q9",
    # serve-steady paths (VERDICT r13 #4): the plans production runs
    # HOT — index built in the untimed warm pass at each scale, so
    # the measured exponent is the serve alone, not the build
    "doc_nb_serve_steady",
    "doc_bm25_serve_steady",
    "emb_ivfpq_serve_steady",
)


def run_scaling_curve(
    spark, sf_dir: str, suite: dict, timings: dict[str, float], reps: int = 3
) -> dict | None:
    """Measured scaling curve for the headline queries (VERDICT r12
    #2): wall at sf0.01 vs the suite's sf0.1 timing, per query.  The
    sf0.1 side reuses the already-measured suite number (same
    warm-then-measure discipline); the sf0.01 side is measured here
    with ``reps``-rep medians because sub-second timings are
    rep-noisy.  Returns None when the run is not at sf0.1 or the
    sf0.01 fixture directory is missing."""
    base = os.path.dirname(sf_dir.rstrip("/"))
    small_dir = os.path.join(base, "sf0.01")
    if "sf0.1" not in sf_dir or not os.path.isdir(small_dir):
        return None
    out: dict[str, dict] = {}
    flagged = []
    for name in _SCALING_QUERIES:
        fn = suite.get(name)
        big = timings.get(name)
        if fn is None or big is None or big <= 0:
            continue
        try:
            run_one(spark, fn, small_dir)  # warm at the small scale
            small_reps = sorted(
                round(run_one(spark, fn, small_dir), 4)
                for _ in range(reps)
            )
        except Exception as e:  # pragma: no cover
            print(f"bench scaling {name} failed: {e}", file=sys.stderr)
            continue
        small = small_reps[len(small_reps) // 2]
        ratio = round(big / small, 2) if small > 0 else None
        superlinear = bool(ratio is not None and ratio > 15.0)
        out[name] = {
            "sf001_sec": small,
            "sf001_reps_sec": small_reps,
            "sf01_sec": big,
            "ratio": ratio,
            "superlinear": superlinear,
        }
        if superlinear:
            flagged.append(name)
    if flagged:
        print(
            f"bench scaling: SUPER-LINEAR growth flagged for {flagged}"
            " (>15x wall for 10x data) — name the term in COVERAGE.md"
            " or fix the plan",
            file=sys.stderr,
        )
    return {
        "data_ratio": 10.0,
        "flag_ratio": 15.0,
        "queries": out,
        "flagged": flagged,
    }


def _repo_root() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _current_round(root: str | None = None) -> int | None:
    """Round currently being BUILT.  VERDICT.md judges round N and is
    committed together with BENCH_r{N}.json at the start of round
    N+1, so current = verdict round + 1 — a BENCH file of the current
    round can only be a stale artifact of a re-run after the driver
    flush, and must never be chosen as the "prior" (ADVICE r7:
    comparing a round's calibration against its own recording makes
    host_factor a self-ratio of ~1, masking the normalization)."""
    import re

    try:
        with open(os.path.join(root or _repo_root(), "VERDICT.md")) as f:
            m = re.search(r"Round\s+(\d+)", f.read(400))
        return int(m.group(1)) + 1 if m else None
    except Exception:
        return None


def _write_full_bench_json(result: dict, root: str | None = None) -> str | None:
    """Returns the written sidecar path (None when no sidecar is
    recorded — non-sf0.1 runs, unknown round, write failure);
    summary_line() embeds it as the stdout pointer to the full
    record.

    VERDICT r9 #5: the driver's BENCH_r{N}.json stores only a
    front-truncated stdout tail (its ``parsed`` field is null), so
    per-query round-over-round diffs required archaeology in
    COVERAGE.md prose.  Persist the COMPLETE result dict to
    ``docs/bench/BENCH_r{N:02d}.full.json`` — committed with the
    round, preferred by :func:`_latest_prior_bench` over the
    truncated driver artifact.  Only driver-scale (sf0.1) runs are
    recorded: local sf0.01 iteration runs must not overwrite the
    round's canonical numbers."""
    root = root or _repo_root()
    rnd = _current_round(root)
    sf = result.get("sf")
    if rnd is None or not isinstance(sf, (int, float)) or abs(sf - 0.1) > 1e-9:
        return None
    try:
        dest = os.path.join(root, "docs", "bench")
        os.makedirs(dest, exist_ok=True)
        path = os.path.join(dest, f"BENCH_r{rnd:02d}.full.json")
        if _is_committed_recording(path, root):
            # VERDICT r10 #3: the canonical round recording is the
            # builder's COMMITTED run — a later re-run (the driver's
            # own post-round bench, a judge's re-measure) must never
            # clobber it; divert to a SHA-stamped sidecar the
            # prior-round loader's `.full.json` regex ignores.  The
            # sidecar itself is append-only too (r11 review): a
            # second re-run at the same SHA (or two 'unknown'-SHA
            # runs) counts up instead of clobbering the first.
            stem = f"BENCH_r{rnd:02d}.full.rerun-{_head_sha(root)}"
            path = os.path.join(dest, f"{stem}.json")
            k = 2
            while os.path.exists(path):
                path = os.path.join(dest, f"{stem}-{k}.json")
                k += 1
        with open(path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"bench: full JSON written to {path}", file=sys.stderr)
        return path
    except Exception as e:  # pragma: no cover
        print(f"bench: full JSON write failed: {e}", file=sys.stderr)
        return None


# Flagship queries pinned into the compact stdout summary — a stable
# taste of the suite the driver can diff without the full sidecar.
_SUMMARY_QUERIES = (
    "candles_1m",
    "cascade_1d",
    "tpch_q1",
    "doc_dedup_exact",
    "doc_minhash_lsh",
    "emb_cosine_topk",
    "watchdog_cycle",
    "skew_join_salted",
)


def _compact_calibration(cal: dict | None) -> dict | None:
    """Basket calibration, compacted for the summary line: per-anchor
    medians only — prior_calibration inflates the ``anchors`` map back
    to basket shape when the full sidecar is missing."""
    if not isinstance(cal, dict) or not isinstance(cal.get("basket"), dict):
        return cal
    return {
        "query": "basket",
        "median_sec": cal.get("median_sec"),
        "anchors": {
            k: (v or {}).get("median_sec")
            for k, v in cal["basket"].items()
        },
    }


def summary_line(result: dict, full_json: str | None) -> str:
    """The FINAL stdout line, sized for the driver's tail capture.

    VERDICT r11 #1: since r6 the driver's BENCH_r{N}.json has carried
    ``"parsed": null`` because the single-line full-result JSON
    outgrew its tail capture (the full dict is >10 kB at 100+ benched
    queries).  The driver parses the LAST stdout line as the round's
    bench record, so that line must stay compact: headline scalars, a
    pinned flagship subset of the per-query map, and a pointer to the
    committed full sidecar.  test_bench_summary.py asserts <1 kB on a
    worst-case-shaped result.
    """
    out = {
        "metric": result.get("metric"),
        "value": result.get("value"),
        "unit": result.get("unit"),
        "sf": result.get("sf"),
        "value_host_normalized": result.get("value_host_normalized"),
        "host_factor": result.get("host_factor"),
        "candles_per_sec": result.get("candles_per_sec"),
        "streaming_candles_per_sec": result.get(
            "streaming_candles_per_sec"
        ),
        # calibration rides inline (r12 review): if the committed
        # full sidecar is ever missing, the next round's
        # prior_calibration falls back to the driver-captured line —
        # without this block, host_factor would silently turn off and
        # the outlier protocol would compare raw cross-host timings.
        # Basket form is COMPACTED to per-anchor medians (reps arrays
        # and factor detail stay in the full sidecar) so the line
        # holds its <1 kB budget.
        "calibration": _compact_calibration(result.get("calibration")),
        # ANN quality floor flag (VERDICT r13 #8): the driver-parsed
        # line carries the verdict; the per-nprobe means stay in the
        # full sidecar
        "ann_quality_ok": (result.get("ann_quality") or {}).get("ok"),
        "n_queries": len(result.get("queries") or {}),
        "queries": {
            k: v
            for k, v in (result.get("queries") or {}).items()
            if k in _SUMMARY_QUERIES
        },
        "full_json": full_json,
    }
    return json.dumps(out)


def _head_sha(root: str) -> str:
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=root,
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
        return out or "unknown"
    except Exception:
        return "unknown"


def _is_committed_recording(path: str, root: str) -> bool:
    """True iff ``path`` exists, is git-tracked, and matches HEAD —
    i.e. it is a round's committed canonical bench recording.  A
    missing or uncommitted file is fair game (the builder iterating
    on its own in-progress run); when git can't answer, refuse to
    overwrite (the safe direction: a stray sidecar is recoverable, a
    clobbered committed recording needed `git show` archaeology in
    r10)."""
    import subprocess

    if not os.path.exists(path):
        return False
    rel = os.path.relpath(path, root)
    try:
        tracked = (
            subprocess.run(
                ["git", "ls-files", "--error-unmatch", rel],
                cwd=root,
                capture_output=True,
                timeout=10,
            ).returncode
            == 0
        )
        if not tracked:
            return False
        unmodified = (
            subprocess.run(
                ["git", "diff", "--quiet", "HEAD", "--", rel],
                cwd=root,
                capture_output=True,
                timeout=10,
            ).returncode
            == 0
        )
        return unmodified
    except Exception:
        return True


def _full_bench_json(rnd: int, root: str) -> dict | None:
    """Load docs/bench/BENCH_r{rnd}.full.json (written by
    :func:`_write_full_bench_json`) as a prior-round document shaped
    like the driver artifact: the complete dict rides the ``parsed``
    field, so prior_query_timings/prior_headline_scalars read exact
    per-query numbers instead of regexing a truncated tail."""
    path = os.path.join(root, "docs", "bench", f"BENCH_r{rnd:02d}.full.json")
    try:
        with open(path) as f:
            full = json.load(f)
    except Exception:
        return None
    if not isinstance(full, dict):
        return None
    return {"sf": full.get("sf"), "parsed": full}


def _latest_prior_bench(root: str | None = None) -> tuple[int, dict] | None:
    """Highest-round BENCH_r{N}.json STRICTLY BELOW the round being
    benchmarked (ADVICE r7) — the genuine prior round's recording.
    When the current round can't be inferred (no VERDICT.md), the
    highest-numbered BENCH file is assumed to be a stale artifact of
    the in-progress round and excluded (ADVICE r8) — erring toward a
    one-round-older prior beats a self-ratio host_factor of ~1."""
    import glob
    import re

    root = root or _repo_root()
    cur = _current_round(root)
    rounds: dict[int, str | None] = {}
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds[int(m.group(1))] = path
    # rounds whose only recording is the committed full JSON (the
    # driver artifact may lag a round or be missing entirely)
    for path in glob.glob(
        os.path.join(root, "docs", "bench", "BENCH_r*.full.json")
    ):
        m = re.search(r"BENCH_r(\d+)\.full\.json$", path)
        if m:
            rounds.setdefault(int(m.group(1)), None)
    if cur is None and rounds:
        cur = max(rounds)
        print(
            "bench: VERDICT.md round unknown — excluding "
            f"BENCH_r{cur:02d}.json as the presumed in-progress round",
            file=sys.stderr,
        )
    best = None
    for rnd, path in rounds.items():
        if cur is not None and rnd >= cur:
            continue
        if best is not None and rnd <= best[0]:
            continue
        # the committed full JSON beats the driver's truncated tail
        doc = _full_bench_json(rnd, root)
        if doc is None and path is not None:
            try:
                with open(path) as f:
                    doc = json.load(f)
            except Exception:
                continue
        if doc is None:
            continue
        best = (rnd, doc)
    return best


def prior_query_timings(
    sf: float | None = None, root: str | None = None
) -> dict[str, float]:
    """Per-query seconds from the prior round's BENCH recording, for
    outlier detection (VERDICT r7 #3).  The driver stores the bench
    line's tail, possibly truncated at the FRONT — regex out whatever
    name/seconds pairs survive.  When ``sf`` is given, a prior
    recorded at a DIFFERENT scale factor yields {} — cross-scale
    ratios are not outliers."""
    import re

    best = _latest_prior_bench(root)
    if best is None:
        return {}
    doc = best[1]
    if sf is not None and isinstance(doc, dict):
        prior_sf = doc.get("sf")
        if isinstance(prior_sf, (int, float)) and abs(prior_sf - sf) > 1e-9:
            return {}
    parsed = doc.get("parsed") if isinstance(doc, dict) else None
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return {
            k: float(v)
            for k, v in parsed["queries"].items()
            if isinstance(v, (int, float)) and v > 0
        }
    hay = (doc.get("tail", "") or "") if isinstance(doc, dict) else ""
    hay = _without_calibration_spans(hay)
    out: dict[str, float] = {}
    for m in re.finditer(r'"([A-Za-z_][A-Za-z0-9_]*)":\s*([0-9]+\.[0-9]+)', hay):
        name, val = m.group(1), float(m.group(2))
        # calibration/envelope scalars share the float shape; query
        # names never collide with them in practice, and a spurious
        # entry only ever triggers a harmless extra re-measure
        if name not in ("median_sec", "wall_sec", "merges_per_sec",
                        "value", "host_factor", "value_host_normalized",
                        "sf", "candles_per_sec",
                        "streaming_candles_per_sec", "streaming_wall_sec"):
            out[name] = val
    return out


def prior_headline_scalars(
    sf: float | None = None, root: str | None = None
) -> dict[str, float]:
    """candles_per_sec / streaming_candles_per_sec from the prior
    round's recording, for the throughput outlier protocol (VERDICT
    r8 #5: the single-shot streaming figure mis-recorded a 0.74×
    "regression" in r8 that isolated re-runs disproved).  Same
    sf-gating as prior_query_timings."""
    import re

    best = _latest_prior_bench(root)
    if best is None:
        return {}
    doc = best[1]
    if sf is not None and isinstance(doc, dict):
        prior_sf = doc.get("sf")
        if isinstance(prior_sf, (int, float)) and abs(prior_sf - sf) > 1e-9:
            return {}
    names = ("candles_per_sec", "streaming_candles_per_sec")
    parsed = doc.get("parsed") if isinstance(doc, dict) else None
    out: dict[str, float] = {}
    if isinstance(parsed, dict):
        for n in names:
            if isinstance(parsed.get(n), (int, float)) and parsed[n] > 0:
                out[n] = float(parsed[n])
    hay = (doc.get("tail", "") or "") if isinstance(doc, dict) else ""
    for n in names:
        if n in out:
            continue
        m = re.search(rf'"{n}":\s*([0-9]+(?:\.[0-9]+)?)', hay)
        if m and float(m.group(1)) > 0:
            out[n] = float(m.group(1))
    return out


def _json_object_span(hay: str, key: str) -> tuple[int, int] | None:
    """(start, end) character span of ``"key": {...}`` in a possibly
    front-truncated JSON line, found by brace-balancing (the driver's
    tail capture can cut the front of the line, so full-document
    json.loads is not an option).  None when absent/unbalanced."""
    start = hay.find(f'"{key}":')
    if start < 0:
        return None
    brace = hay.find("{", start)
    if brace < 0:
        return None
    depth = 0
    in_str = False
    esc = False
    for i in range(brace, len(hay)):
        c = hay[i]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return (start, i + 1)
    return None


def _extract_json_object(hay: str, key: str) -> dict | None:
    """The parsed dict at :func:`_json_object_span`, or None."""
    span = _json_object_span(hay, key)
    if span is None:
        return None
    brace = hay.find("{", span[0])
    try:
        out = json.loads(hay[brace : span[1]])
    except Exception:
        return None
    return out if isinstance(out, dict) else None


def _without_calibration_spans(hay: str) -> str:
    """Excise the calibration object (and, for a tail truncated
    mid-calibration, any surviving ``anchors`` sub-object) before the
    name:seconds regex runs (r13 review): the basket anchors are REAL
    query names (tpch_q6, sma_20, …), so leaving them in would record
    isolated start-of-run calibration medians as prior in-suite
    timings and trip spurious outlier re-measures."""
    for key in ("calibration", "anchors"):
        span = _json_object_span(hay, key)
        if span is not None:
            hay = hay[: span[0]] + hay[span[1] :]
    return hay


def prior_calibration(root: str | None = None) -> dict | None:
    """Prior ROUND's recorded calibration (full dict, basket
    included), so this run can self-normalize for host speed (VERDICT
    r6 next-round #5; basket form since r13 per VERDICT r12 #1).  The
    driver wraps the bench line in {tail: "...", parsed: ...}; parse
    whichever form is present, defensively.  The compact stdout line
    carries the basket as {"anchors": {name: median}} — inflate it
    back to the basket shape so compute_host_factor reads one form."""
    best_doc = _latest_prior_bench(root)
    if best_doc is None:
        return None
    rnd, doc = best_doc
    cal = None
    parsed = doc.get("parsed") if isinstance(doc, dict) else None
    if isinstance(parsed, dict):
        cal = parsed.get("calibration")
    if not isinstance(cal, dict) and isinstance(doc, dict):
        cal = _extract_json_object(doc.get("tail", "") or "", "calibration")
    if not isinstance(cal, dict) and isinstance(doc, dict):
        cal = doc.get("calibration")
    if not isinstance(cal, dict) or not cal.get("median_sec"):
        return None
    out = {"round": rnd, **cal}
    out["median_sec"] = float(out["median_sec"])
    if "basket" not in out and isinstance(out.get("anchors"), dict):
        out["basket"] = {
            k: {"median_sec": v}
            for k, v in out["anchors"].items()
            if isinstance(v, (int, float)) and v > 0
        }
    return out


def run_one(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # Force full execution of every column (count alone can prune).
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _between_entries_gc(spark) -> None:
    """Steady-state housekeeping BETWEEN timed entries (guide §1.3).

    A long warm suite allocates unreferenced driver-JVM state faster
    than the old-gen GC cadence hands it to ContextCleaner's
    weak-reference queue: leftover localCheckpoint blocks (the r14
    drift probe counted a residue of 31 pinned RDDs / ~155 MB by the
    suite tail), shuffle statuses and broadcast pieces.  One explicit
    GC between entries drains that queue.  Measured (r14 drift probe,
    95 suite entries, paired within-run sentinel): without it the
    light sentinel query drifts 0.63 → 0.90 s (1.42×) over the
    session; with per-entry GC it stays flat (0.87×, i.e. noise).

    Never unpersists or clears caches: steady-state entries hold
    EAGER localCheckpoints across calls (truncated lineage — their
    blocks are irrecoverable once dropped), and GC only collects
    state nothing references.  Runs strictly outside every timed
    region, so no measured number includes it; every query still
    computes from the parquet inputs alone."""
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # pragma: no cover
        pass


# Shape-diverse calibration anchors (VERDICT r12 #1): the old
# single-query yardstick (tpch_q6) spread +-30% across its own 3 reps
# and ~2x across round slots, so host_factor amplified noise instead
# of cancelling it (r12: a phantom 2.2x "regression" that every raw
# anchor refuted).  One anchor per plan shape — scan-agg, shuffle-join,
# window, text-explode, ingest-agg — and the factor is the MEDIAN of
# per-anchor ratios, so one anchor landing on a noisy slot cannot move
# the factor.  All five are byte-stable oracle queries.
_CALIBRATION_ANCHORS = (
    "tpch_q6",          # scan + filter + scalar agg
    "tpch_q3",          # shuffle join + group agg
    "sma_20",           # partitioned window frame
    "doc_token_stats",  # text tokenize + explode
    "candles_1m",       # ingest-shaped wide agg
    # r14 bench finding: the five sub-second anchors all track CORE
    # speed, so on a fast slot they overstated the factor for heavy
    # multi-stage entries that are bounded by JVM/Python fixed costs
    # (r14: anchors ~2x faster, heavy entries ~1x — the basket read
    # 0.51 while the sum moved 0.94).  One HEAVY anchor keeps the
    # median honest for the entries that dominate the suite.  Its
    # first cross-round ratio reads from the r14 suite timing
    # (source='suite', flagged soft); basket-vs-basket from r15 on.
    "doc_dup_clusters",  # heavy: LSH + iterative components, ~5 s
)


def run_calibration(spark, sf_dir: str, reps: int = 3) -> dict:
    """Host-speed yardstick, measured in isolation at the very start
    of the run before the suite touches the JVM.  Cross-round ratios
    of the per-anchor medians separate host-level variance from plan
    regressions without after-the-fact adjudication
    (docs/ARCHITECTURE.md host-variance protocol, self-recorded).

    VERDICT r12 #1: a BASKET of shape-diverse anchors replaces the
    single tpch_q6 query; per-anchor 3-rep medians are recorded and
    :func:`compute_host_factor` takes the median of per-anchor ratios.
    ``median_sec`` remains as the basket-wide scalar (sum of anchor
    medians) so older tail parsers still find a number — it is NOT
    used for the host factor when per-anchor priors exist."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    basket: dict[str, dict] = {}
    for name in _CALIBRATION_ANCHORS:
        fn = q[name]
        run_one(spark, fn, sf_dir)  # warm: file listing, codegen
        reps_s = sorted(
            round(run_one(spark, fn, sf_dir), 4) for _ in range(reps)
        )
        basket[name] = {
            "median_sec": reps_s[len(reps_s) // 2],
            "reps_sec": reps_s,
        }
    return {
        "query": "basket",
        "basket": basket,
        "median_sec": round(
            sum(b["median_sec"] for b in basket.values()), 4
        ),
    }


def compute_host_factor(
    calibration: dict | None,
    prior_cal: dict | None,
    prior_queries: dict[str, float] | None = None,
) -> dict | None:
    """Basket host factor (VERDICT r12 #1): the MEDIAN of per-anchor
    (current median / prior median) ratios — a single anchor landing
    on a noisy scheduler slot moves one ratio, not the factor.

    Prior per-anchor medians come, in preference order, from: the
    prior round's calibration basket (same isolated start-of-run
    measurement — the only like-for-like source); the prior round's
    legacy single-query calibration (contributes its one anchor,
    source='calibration'); the prior round's in-suite timing for the
    anchor (single-shot, measured mid-suite — noisier, flagged
    source='suite' so the sidecar shows which ratios are soft).
    Returns {"host_factor", "ratios": {anchor: {ratio, prior_sec,
    source}}} or None when no anchor has both sides."""
    basket = (calibration or {}).get("basket") or {}
    prior_basket = (prior_cal or {}).get("basket") or {}
    ratios: dict[str, dict] = {}
    for name, cur in basket.items():
        cur_med = (cur or {}).get("median_sec")
        if not cur_med:
            continue
        prior_med, source = (
            (prior_basket.get(name) or {}).get("median_sec"),
            "basket",
        )
        if not prior_med and prior_cal and prior_cal.get("query") == name:
            prior_med, source = prior_cal.get("median_sec"), "calibration"
        if not prior_med and prior_queries:
            prior_med, source = prior_queries.get(name), "suite"
        if not prior_med:
            continue
        ratios[name] = {
            "ratio": round(cur_med / prior_med, 4),
            "prior_sec": prior_med,
            "source": source,
        }
    if not ratios:
        # legacy-vs-legacy (both rounds single-query): the old rule
        cur_med = (calibration or {}).get("median_sec")
        prior_med = (prior_cal or {}).get("median_sec")
        if cur_med and prior_med:
            return {
                "host_factor": round(cur_med / prior_med, 4),
                "ratios": {},
            }
        return None
    vals = sorted(r["ratio"] for r in ratios.values())
    n = len(vals)
    med = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2
    return {"host_factor": round(med, 4), "ratios": ratios}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # r14: the 100k retainedStages override is gone — the shuffle-byte
    # probes now sum only stages newer than a per-measurement mark
    # (_shuffle_stage_mark), which default retention covers, so the
    # driver no longer accumulates listener state for every stage of
    # the ~13k-stage suite (guide §5: the warm-suite drift suspect).
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        calibration = run_calibration(spark, sf_dir)
    except Exception as e:  # pragma: no cover
        print(f"bench calibration failed: {e}", file=sys.stderr)
        calibration = None
    cleanup: list[str] = []
    timings: dict[str, float] = {}
    # skew_join_* deliberately NOT in the in-session suite: measured
    # in a fresh subprocess JVM by run_skew_probe (VERDICT r11 —
    # in-session reps grew 2.3→7.2→17.9 s from suite-tail JVM state).
    suite = {
        **headline_queries(),
        **steady_state_queries(cleanup),
        **bloom_join_queries(),
    }
    for name, fn in suite.items():
        try:
            # warm once (file listing, code paths), measure second run
            run_one(spark, fn, sf_dir)
            timings[name] = round(run_one(spark, fn, sf_dir), 4)
        except Exception as e:  # pragma: no cover
            print(f"bench {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
        _between_entries_gc(spark)
    skew_probe = None
    if os.environ.get("SPARK_GRAFT_SKIP_SKEW") != "1":
        skew_probe = run_skew_probe(sf_dir)
        if skew_probe:
            timings.update(skew_probe["median_sec"])
        else:
            # Contract guard (r14): a published `queries` entry may
            # never disappear — if the fresh-JVM probe flakes
            # (subprocess timeout on a bad slot), fall back to an
            # in-session measurement so skew_join_* stay present;
            # the isolation note records which protocol produced it.
            fallback = skew_join_queries()
            for name, fn in fallback.items():
                try:
                    _between_entries_gc(spark)
                    run_one(spark, fn, sf_dir)
                    timings[name] = round(run_one(spark, fn, sf_dir), 4)
                except Exception as e:  # pragma: no cover
                    print(
                        f"bench skew fallback {name} failed: {e}",
                        file=sys.stderr,
                    )
            skew_probe = {
                "isolation": "IN-SESSION FALLBACK (fresh-JVM probe"
                " failed); medians are warm-suite measurements"
            }
        if os.environ.get("SPARK_GRAFT_SKEW_DIAG") == "1":
            try:
                skew_probe = dict(skew_probe or {})
                skew_probe["pollution_diag"] = run_skew_pollution_diag(
                    spark, sf_dir
                )
            except Exception as e:  # pragma: no cover
                print(f"bench skew diag failed: {e}", file=sys.stderr)
    # Outlier re-measurement (VERDICT r7 #3: volume_bars regressed
    # 3.96x in a single UNREPEATED measurement on unchanged code):
    # any query >=1.5x off its prior-round recording — after
    # host-speed normalization, so a uniformly faster/slower host
    # doesn't re-measure the whole suite — gets two more reps and
    # publishes the 3-rep median, with the raw reps recorded so a
    # genuine regression is distinguishable from a one-shot blip.
    prior = prior_calibration()
    prior_q = prior_query_timings(
        float(sf) if sf.replace(".", "").isdigit() else None
    )
    # Basket host factor (VERDICT r12 #1): median of per-anchor
    # ratios; per-anchor detail rides the full sidecar so the judge
    # can see which ratios came from like-for-like basket priors vs
    # soft in-suite single-shots.
    factor_detail = compute_host_factor(calibration, prior, prior_q)
    host_factor = factor_detail["host_factor"] if factor_detail else None
    if calibration is not None and factor_detail is not None:
        calibration = dict(calibration)
        calibration["factor_detail"] = factor_detail
    re_measured: dict[str, dict] = {}
    for name, t1 in list(timings.items()):
        t0 = prior_q.get(name)
        if name not in suite or t0 is None or t1 <= 0 or t0 <= 0:
            continue
        ratio = t1 / (t0 * (host_factor or 1.0))
        if 1 / 1.5 < ratio < 1.5:
            continue
        try:
            reps = [t1]
            for _ in range(2):
                # GC before each rep: the re-measure loop runs at the
                # suite tail, exactly where the session-state drift
                # peaked (r14: published medians of late reps were
                # inflated 2-5x over the healthy first timing)
                _between_entries_gc(spark)
                reps.append(round(run_one(spark, suite[name], sf_dir), 4))
            reps.sort()
        except Exception as e:  # pragma: no cover
            print(f"bench re-measure {name} failed: {e}", file=sys.stderr)
            continue
        timings[name] = reps[1]
        re_measured[name] = {
            "prior_sec": t0,
            "first_sec": t1,
            "reps_sec": reps,
        }
    total = round(sum(t for t in timings.values() if t > 0), 4)
    prior_scalars = prior_headline_scalars(
        float(sf) if sf.replace(".", "").isdigit() else None
    )
    streaming_cps = streaming_wall = None
    streaming_latency = None
    if os.environ.get("SPARK_GRAFT_SKIP_STREAMING") != "1":
        try:
            streaming_cps, streaming_wall = run_streaming(spark, sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"bench streaming failed: {e}", file=sys.stderr)
        try:
            streaming_latency = run_streaming_latency(spark, sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"bench streaming latency failed: {e}", file=sys.stderr)
    # Throughput outlier protocol (VERDICT r8 #5): the streaming loop
    # was the one headline still taken as a single shot.  Throughput
    # scales inversely with time, so the host-normalized expectation
    # is prior / host_factor; >=1.5x off either way -> two more runs,
    # publish the 3-rep median (of candles/sec; wall follows).
    if streaming_cps and prior_scalars.get("streaming_candles_per_sec"):
        expect = prior_scalars["streaming_candles_per_sec"] / (
            host_factor or 1.0
        )
        if not (1 / 1.5 < streaming_cps / expect < 1.5):
            first_cps = streaming_cps
            reps = [(streaming_cps, streaming_wall)]
            for _ in range(2):
                try:
                    reps.append(run_streaming(spark, sf_dir))
                except Exception as e:  # pragma: no cover
                    print(f"bench streaming re-run failed: {e}", file=sys.stderr)
            reps.sort()
            # 3 reps -> median; if a re-run failed and only 2 remain,
            # publish the LOWER throughput — never launder a possible
            # regression upward by picking best-of-two
            pick = reps[len(reps) // 2] if len(reps) == 3 else reps[0]
            streaming_cps, streaming_wall = pick
            re_measured["streaming_candles_per_sec"] = {
                "prior": prior_scalars["streaming_candles_per_sec"],
                "first_cps": first_cps,
                "reps_cps": [r[0] for r in reps],
            }
    bpe = None
    if os.environ.get("SPARK_GRAFT_SKIP_BPE") != "1":
        try:
            bpe = run_bpe_train(spark)
        except Exception as e:  # pragma: no cover
            print(f"bench bpe failed: {e}", file=sys.stderr)
    bpe_enc = None
    if os.environ.get("SPARK_GRAFT_SKIP_BPE") != "1":
        try:
            bpe_enc = run_bpe_encode(spark, sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"bench bpe encode failed: {e}", file=sys.stderr)
    ingest = None
    ingest_lm = None
    emb_ingest = None
    if os.environ.get("SPARK_GRAFT_SKIP_INGEST") != "1":
        try:
            ingest = run_doc_ingest_bench(spark, sf_dir, cleanup)
        except Exception as e:  # pragma: no cover
            print(f"bench doc ingest failed: {e}", file=sys.stderr)
        try:
            ingest_lm = run_doc_ingest_lm_bench(spark, sf_dir, cleanup)
        except Exception as e:  # pragma: no cover
            print(f"bench doc ingest lm failed: {e}", file=sys.stderr)
        try:
            emb_ingest = run_emb_ingest_bench(spark, sf_dir, cleanup)
        except Exception as e:  # pragma: no cover
            print(f"bench emb ingest failed: {e}", file=sys.stderr)
    # Host-speed self-normalization: host_factor > 1 means this host
    # ran the fixed yardstick slower than the prior round's host, so
    # cross-round query ratios should be divided by it before being
    # read as regressions.  (prior/host_factor computed above, before
    # the outlier pass.)
    value_host_normalized = None
    if host_factor:
        value_host_normalized = round(total / host_factor, 4)
    # Throughput anchor vs BASELINE.md: the reference's backfill path
    # tops out at ~4-6k candles/s (load_history.py:33,427); ours is
    # candles derived+aggregated per second in the candles_1m stage.
    throughput = None
    try:
        from trade_data_collection_service_spark.candles import candles_from_events

        n_candles = candles_from_events(spark, sf_dir).count()
        if timings.get("candles_1m", 0) > 0:
            throughput = round(n_candles / timings["candles_1m"], 1)
        # candles_per_sec = n_candles (deterministic per sf) divided
        # by the candles_1m timing, so the query outlier pass above
        # already protects it — EXCEPT when the prior-vs-now drift
        # shows only in the derived ratio (e.g. prior tail lost the
        # candles_1m entry).  Same >=1.5x rule, re-measuring the
        # underlying query (VERDICT r8 #5).
        if (
            throughput
            and prior_scalars.get("candles_per_sec")
            and "candles_1m" not in re_measured
        ):
            expect = prior_scalars["candles_per_sec"] / (host_factor or 1.0)
            if not (1 / 1.5 < throughput / expect < 1.5):
                first = timings["candles_1m"]
                reps = sorted(
                    [first]
                    + [
                        round(run_one(spark, suite["candles_1m"], sf_dir), 4)
                        for _ in range(2)
                    ]
                )
                timings["candles_1m"] = reps[1]
                re_measured["candles_1m"] = {
                    "prior_sec": None,
                    "first_sec": first,
                    "reps_sec": reps,
                    "trigger": "candles_per_sec drift",
                }
                throughput = round(n_candles / reps[1], 1)
                total = round(
                    sum(t for t in timings.values() if t > 0), 4
                )
                if host_factor:
                    value_host_normalized = round(total / host_factor, 4)
    except Exception:
        pass
    scaling = None
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        try:
            scaling = run_scaling_curve(spark, sf_dir, suite, timings)
        except Exception as e:  # pragma: no cover
            print(f"bench scaling failed: {e}", file=sys.stderr)
    nb_sparse = None
    if os.environ.get("SPARK_GRAFT_SKIP_NBSPARSE") != "1":
        try:
            nb_sparse = run_nb_sparse_bench(spark, sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"bench nb sparse failed: {e}", file=sys.stderr)
    lease_overhead = None
    if os.environ.get("SPARK_GRAFT_SKIP_LEASE") != "1":
        try:
            lease_overhead = run_lease_overhead(sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"bench lease overhead failed: {e}", file=sys.stderr)
    isolated_top10 = None
    if os.environ.get("SPARK_GRAFT_SKIP_ISOTOP") != "1":
        try:
            isolated_top10 = run_isolated_top10(sf_dir, timings)
        except Exception as e:  # pragma: no cover
            print(f"bench isolated top10 failed: {e}", file=sys.stderr)
    ann_quality = None
    if os.environ.get("SPARK_GRAFT_SKIP_ANNQ") != "1":
        try:
            ann_quality = run_ann_quality(spark, sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"bench ann quality failed: {e}", file=sys.stderr)
    spans_gram = None
    if os.environ.get("SPARK_GRAFT_SKIP_SPANSBYTES") != "1":
        try:
            spans_gram = run_spans_gram_bytes(spark, sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"bench spans gram bytes failed: {e}", file=sys.stderr)
    bloom_bytes = None
    if os.environ.get("SPARK_GRAFT_SKIP_BLOOMBYTES") != "1":
        try:
            bloom_bytes = run_bloom_bytes(spark, sf_dir)
        except Exception as e:  # pragma: no cover
            print(f"bench bloom bytes failed: {e}", file=sys.stderr)
    zorder_bytes = None
    if os.environ.get("SPARK_GRAFT_SKIP_ZORDERBYTES") != "1":
        try:
            zorder_bytes = run_zorder_bytes(spark, sf_dir, cleanup)
        except Exception as e:  # pragma: no cover
            print(f"bench zorder bytes failed: {e}", file=sys.stderr)
    result = {
        "metric": "headline-suite wall time (warm, noop-sink)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "candles_per_sec": throughput,
        "streaming_candles_per_sec": streaming_cps,
        "streaming_wall_sec": streaming_wall,
        "streaming_latency": streaming_latency,
        "calibration": calibration,
        "prior_calibration": prior,
        "host_factor": host_factor,
        "value_host_normalized": value_host_normalized,
        "re_measured": re_measured,
        "scaling_curve": scaling,
        "nb_sparse": nb_sparse,
        "lease_overhead": lease_overhead,
        "isolated_top10": isolated_top10,
        "ann_quality": ann_quality,
        "skew_probe": skew_probe,
        "spans_gram_shuffle": spans_gram,
        "bloom_join_shuffle": bloom_bytes,
        "zorder_rowgroup_pruning": zorder_bytes,
        "bpe_train": bpe,
        "bpe_encode": bpe_enc,
        "doc_ingest": ingest,
        "doc_ingest_lm": ingest_lm,
        "emb_ingest": emb_ingest,
    }
    # Full result goes to the committed sidecar; stdout ends with ONE
    # compact line the driver's tail capture can actually hold
    # (VERDICT r11 #1 — BENCH_r06..r11 all recorded "parsed": null).
    full_path = _write_full_bench_json(result)
    print(summary_line(result, full_path))
    import shutil

    for path in cleanup:
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
