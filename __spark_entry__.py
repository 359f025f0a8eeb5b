"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every query here maps to an operator row in SURVEY.md §2; candle
queries run over the deterministic candle derivation from ``events``
(FIXTURES.md §1.1, trade_data_collection_service_spark/candles.py —
the DuckDB CTE twin lives next to the Spark derivation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import (
    CANDLES_CTE,
    CANDLES_DUP_CTE,
    CANDLES_INVALID_CTE,
    candles_from_events,
    candles_with_duplicates,
    candles_with_invalid,
)
from trade_data_collection_service_spark.operators import (
    backfill_plan,
    cascade,
    dedup_latest,
    islands,
    missing_timestamps,
    quarantine,
    rollup_raw,
)
from trade_data_collection_service_spark.operators import queries as Q
from trade_data_collection_service_spark.ext import cluster as XC
from trade_data_collection_service_spark.ext import dedup as XD
from trade_data_collection_service_spark.ext import pipeline as XP
from trade_data_collection_service_spark.ext import pq as XQ
from trade_data_collection_service_spark.ext import similarity as XS
from trade_data_collection_service_spark.ext import text as XT
from trade_data_collection_service_spark.ext import tpch as XH
from trade_data_collection_service_spark.ext.multimodal import (
    media_features,
    media_frame_sample,
    media_gif_pixels,
    media_headers,
    media_jpeg_pixels,
    media_png_pixels,
    media_samples,
)
from trade_data_collection_service_spark.functions.sketch import ALPHA

SF0001 = "/root/testdata/sf0.001"

# Scratch dirs created by stored-index query entries (incremental
# neardup/spans, indexed IVF/PQ).  Registered here and removed at
# interpreter exit so repeated sweeps don't accumulate /tmp state
# (ADVICE r8 — bench.py's steady-state entries already do this).
_SCRATCH_DIRS: list[str] = []


def _scratch_dir(prefix: str) -> str:
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH_DIRS:
        atexit.register(
            lambda: [
                shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH_DIRS
            ]
        )
    _SCRATCH_DIRS.append(d)
    return d

ROLLUP_COLS = [
    "exchange",
    "symbol",
    "candle_start",
    "open",
    "open_time",
    "high",
    "low",
    "close",
    "close_time",
    "volume",
    "trades",
]


def _utc(spark: SparkSession) -> None:
    """Pin the session to UTC (runtime-settable) — timestamp
    truncation above minute grain (days for VWAP, months for
    partitioning) is timezone-sensitive, and the DuckDB oracle
    computes in naive/UTC.  The driver's session config is not ours,
    so every contract entry sets this defensively."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → 1m candles → validate → dedup → rollup
    cascade to 15m (SURVEY.md §7 minimum end-to-end slice)."""
    _utc(spark)
    c = dedup_latest(candles_from_events(spark, SF0001))
    levels = cascade(c, [1, 5, 15])
    return levels[15].select(*ROLLUP_COLS)


# ---------------------------------------------------------------------------
# queries(): Spark side
# ---------------------------------------------------------------------------


def _q_candles_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candles_from_events(spark, sf_dir)


def _q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_latest(candles_with_duplicates(spark, sf_dir))


def _q_rollup_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return rollup_raw(c, 5).select(*ROLLUP_COLS)


def _q_cascade_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Built through the 5m level; the oracle aggregates 1m -> 15m
    # directly — hash equality proves cascade exactness (A6).
    c = candles_from_events(spark, sf_dir)
    return cascade(c, [1, 5, 15])[15].select(*ROLLUP_COLS)


def _q_earliest_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.earliest_per_symbol(candles_from_events(spark, sf_dir), "EXCH_A", "1m")


def _q_minmax_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.minmax_window(candles_from_events(spark, sf_dir), "EXCH_A", "SYM0")


def _q_count_distinct_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.count_distinct_in_window(
        candles_from_events(spark, sf_dir),
        "EXCH_A",
        "SYM0",
        "2024-01-05 00:00:00",
        "2024-01-12 00:00:00",
    )


def _q_latest_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.latest_per_symbol(candles_from_events(spark, sf_dir))


def _q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.distinct_pairs(candles_from_events(spark, sf_dir))


def _q_recent_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.recent_candles(
        candles_from_events(spark, sf_dir), "EXCH_A", "SYM0", "1m", 200
    ).select("symbol", "start", "open", "high", "low", "close", "volume")


def _q_symbol_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    syms = candles_from_events(spark, sf_dir).select("symbol").distinct()
    return Q.symbols_filtered(syms, None, "SYM", ["SYM3"])


def _q_readme_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    now = c.agg(F.max("start").alias("__now"))
    return (
        c.crossJoin(F.broadcast(now))
        .filter(
            F.col("symbol").isin(["SYM0", "SYM1"])
            & (F.col("start") >= F.col("__now") - F.expr("INTERVAL 6 HOURS"))
        )
        .select("symbol", "start", "open", "high", "low", "close", "volume")
        .orderBy("symbol", "start")
    )


def _q_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.freshness(candles_from_events(spark, sf_dir))


def _q_listing_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Split near month end so some (exchange, symbol) pairs exist on
    # only one side — a real diff in both directions.
    return Q.listing_diff(candles_from_events(spark, sf_dir), "2024-01-30 23:00:00")


def _q_price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.functions.sketch import (
        histogram_quantiles,
    )

    return histogram_quantiles(
        candles_from_events(spark, sf_dir), ["symbol"], "close"
    )


def _q_listing_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.listing_stable(
        candles_from_events(spark, sf_dir), "2024-01-30 23:00:00"
    )


def _q_gap_missing_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        missing_timestamps(c)
        .groupBy("exchange", "symbol")
        .agg(F.count(F.lit(1)).alias("n_missing"))
        .orderBy("exchange", "symbol")
    )


def _q_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir).filter(
        (F.col("exchange") == "EXCH_A") & (F.col("symbol") == "SYM0")
    )
    return islands(missing_timestamps(c))


def _q_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return backfill_plan(
        c, "2023-12-28 00:00:00", 1000, "2024-02-01 00:00:00"
    )


def _q_validate_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quarantine(candles_with_invalid(spark, sf_dir))


def _candles_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one (exchange, symbol) over one week — bounded grid for the
    # gap-filled read queries
    return candles_from_events(spark, sf_dir).filter(
        (F.col("exchange") == "EXCH_A")
        & (F.col("symbol") == "SYM0")
        & (F.col("start") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
        & (F.col("start") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )


def _q_gap_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.resample import gap_filled

    return gap_filled(_candles_week(spark, sf_dir))


def _q_gap_filled_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.resample import (
        gap_filled_ffill,
    )

    return gap_filled_ffill(_candles_week(spark, sf_dir)).select(
        "exchange", "symbol", "start", "close", "is_gap", "close_ffill"
    )


def _q_gap_filled_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.resample import (
        gap_filled_interp,
    )

    return gap_filled_interp(_candles_week(spark, sf_dir))


def _q_sma_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import sma

    return sma(candles_from_events(spark, sf_dir), 20)


def _q_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import vwap_daily

    return vwap_daily(candles_from_events(spark, sf_dir))


def _q_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import twap_daily

    return twap_daily(candles_from_events(spark, sf_dir))


def _q_doc_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup against a STORED corpus index: the stored
    2/3 of the planted near-dup corpus is indexed to parquet
    (shingle postings + LSH band triples + counts), then the
    incoming 1/3 is deduped against it without re-shingling the
    stored side.  The oracle recomputes the same split symbolically;
    batch-parity vs minhash_lsh_pairs is additionally pytest-proven
    (tests/test_ext_dedup.py)."""
    idx = _scratch_dir("neardup_idx_q_") + "/idx"
    corpus = XD.documents_neardup(spark, sf_dir)
    XD.write_neardup_index(corpus.filter(F.col("doc_id") % 3 != 0), idx)
    return XD.incremental_neardup_pairs(
        corpus.filter(F.col("doc_id") % 3 == 0), idx
    )


def _q_candle_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        candle_patterns,
    )

    return candle_patterns(candles_from_events(spark, sf_dir))


def _q_rsi_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import rsi

    return rsi(candles_from_events(spark, sf_dir), 14)


def _q_stochastic_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        stochastic,
    )

    return stochastic(candles_from_events(spark, sf_dir), 14, 3)


def _q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import obv

    return obv(candles_from_events(spark, sf_dir))


def _q_returns_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        returns_corr,
    )

    return returns_corr(candles_from_events(spark, sf_dir))


def _q_minute_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute venue spread rows — the batch side of the streaming
    spread feed (streaming/spread.py shares this exact pivot)."""
    from trade_data_collection_service_spark.operators.analytics import (
        minute_spread,
    )

    ms = minute_spread(candles_from_events(spark, sf_dir))
    return ms.select(
        "symbol",
        "start",
        "close_a",
        "close_b",
        # Published spread follows the exchange_spread decimal
        # contract: round(a-b, 6) normalized through DECIMAL(18,6)
        # so the compared value is an exact 6-dp decimal in both
        # engines, not a raw IEEE rounding of a double.
        F.round(F.col("close_a") - F.col("close_b"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("spread"),
    ).orderBy("symbol", "start")


def _q_exchange_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        exchange_spread,
    )

    return exchange_spread(candles_from_events(spark, sf_dir))


def _q_intraday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        intraday_profile,
    )

    return intraday_profile(candles_from_events(spark, sf_dir))


def _q_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        volume_profile,
    )

    return volume_profile(candles_from_events(spark, sf_dir), 5.0)


def _q_rolling_corr_60(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        rolling_corr,
    )

    return rolling_corr(candles_from_events(spark, sf_dir), 60)


def _q_rolling_sharpe_60(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        rolling_sharpe,
    )

    return rolling_sharpe(candles_from_events(spark, sf_dir), 60)


def _q_drawdown_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        drawdown_curve,
    )

    return drawdown_curve(candles_from_events(spark, sf_dir))


def _q_rolling_beta_60(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        rolling_beta,
    )

    return rolling_beta(candles_from_events(spark, sf_dir), 60)


def _q_doc_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XT.source_quality(spark, sf_dir)


def _q_doc_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.mixture_weights(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _q_doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α-sampled source mixture (ext/pipeline.temperature_mixture_
    weights, Conneau et al. 2020 §3.1): target share q_s ∝ p_s^0.3 —
    the multilingual-pretraining up-sample-the-tail recipe; the
    uniform `doc_source_mix` is its α→0 limit.  Dimension-sized
    groupBy + broadcast scalars; p^α rounded 12 dp and decimal-summed
    so the normalizer is engine-exact."""
    return XP.temperature_mixture_weights(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _q_symbol_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        symbol_beta,
    )

    return symbol_beta(candles_from_events(spark, sf_dir))


def _q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.rolling_active_users(
        spark.read.parquet(f"{sf_dir}/events.parquet"), 7
    )


def _q_doc_chunk_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.chunk_dupes(XD.documents_neardup(spark, sf_dir), 32)


def _q_doc_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XT.tfidf_terms(spark, sf_dir, 5)


def _q_rolling_active_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming register-table reader: same
    register algebra (streaming/actives.py), folded daily + trailing
    7-day — the sketch-based companion to the exact
    ``rolling_active_users``."""
    from trade_data_collection_service_spark.candles import events_df
    from trade_data_collection_service_spark.streaming.actives import (
        daily_user_registers,
        fold_active_users,
    )

    return fold_active_users(
        daily_user_registers(events_df(spark, sf_dir)), 7
    )


def _q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XT.unigram_logprob(spark, sf_dir)


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@3 of trained-IVF (nprobe=1) vs exact cosine ground
    truth over the same 3 queries — ANN index-quality evaluation as
    an oracle-checked operator (ext/similarity.ann_recall)."""
    return XS.ann_recall(spark, sf_dir)


def _q_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@3 vs nprobe ∈ [1,4] in ONE corpus pass
    (ext/similarity.ann_recall_curve): IVF candidate sets nest in
    nprobe, so the corpus is bucketed/scored once against the
    max-nprobe probe set and each per-nprobe top-k falls out of a
    probe_rank <= nprobe grid over the already-scored candidates —
    the FAISS nprobe tuning sweep without 4 separate searches."""
    return XS.ann_recall_curve(spark, sf_dir)


def _q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average conditional bigram log-probability under the
    corpus's own MLE bigram model (ext/text.bigram_logprob) — the
    distributed first rung of CCNet's KenLM quality ladder: one
    per-doc window lag + two map-side-combined censuses + equi
    joins, never a broadcast of the vocabulary² bigram table."""
    return XT.bigram_logprob(spark, sf_dir)


def _q_doc_lm_score_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff LM serving (ext/text.lm_score): train the
    bigram LM on 2/3 of the corpus, score the UNSEEN 1/3 — unseen
    bigrams fall back to ln(0.4·c(w)/total) with OOV counts floored
    at 1, and n_backoff counts the fall-throughs (the domain-shift
    diagnostic).  This exercises the backoff branch the in-corpus
    doc_bigram_logprob never reaches."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = XT.train_bigram_lm(docs.filter(F.col("doc_id") % 3 != 0))
    return XT.lm_score(docs.filter(F.col("doc_id") % 3 == 0), lm)


def _q_doc_lm_score_tri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 stupid-backoff LM serving (ext/text.lm_score_tri,
    Brants et al. 2007: tri → 0.4·bi → 0.16·uni with OOV floor 1):
    train the trigram LM on 2/3 of the corpus, score the unseen 1/3 —
    the next rung of CCNet's KenLM ladder above doc_lm_score_backoff,
    with per-level fall-through counters.  One corpus tokenize pass
    feeds all three censuses; contexts are census marginals; serving
    is equi LEFT-joins (the vocabulary³ table is never broadcast)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = XT.train_trigram_lm(docs.filter(F.col("doc_id") % 3 != 0))
    return XT.lm_score_tri(docs.filter(F.col("doc_id") % 3 == 0), lm)


def _q_emb_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval fused by Reciprocal Rank Fusion
    (ext/similarity.hybrid_rrf_topk, Cormack et al. 2009): per query
    doc, BM25 top-depth over the corpus + exact-cosine top-depth over
    the aligned embeddings, fused 1/(60+rank) per side — the RAG/
    eval-mining retrieval stack as one declarative plan."""
    return XS.hybrid_rrf_topk(spark, sf_dir)


def _q_doc_bm25_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored BM25 posting index, written then searched
    (ext/text.write_bm25_index / bm25_search_indexed) — the sparse
    twin of emb_ivfpq_indexed_topk's index-at-rest story: serve time
    touches only the query terms' posting lists (In-filter pushed to
    the term-sorted parquet scan) + broadcast scalars, never the
    corpus text.  Identical results to the from-text bm25_topk, so
    the DuckDB twin is the same SQL."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = _scratch_dir("bm25_idx_q_") + "/index"
    XT.write_bm25_index(docs, path)
    return XT.bm25_search_indexed(spark, path)


def _q_emb_hybrid_indexed_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval served from STORED indexes
    (ext/similarity.hybrid_rrf_indexed_topk's serving twin — VERDICT
    r10 #1): sparse side reads only the query terms' posting lists
    from the BM25 index at rest, dense side reads only the probed
    bucket partitions of the IVF-PQ index, fused by the shared RRF
    tail.  The DuckDB twin composes the inline ivf_pq SQL (indexed
    dense serve ≡ inline composition, pytest-proven) with the
    from-text BM25 SQL (indexed sparse serve ≡ from-text scorer by
    shared bm25_weight) and the same fusion."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sparse = _scratch_dir("bm25_hyb_q_") + "/index"
    XT.write_bm25_index(docs, sparse)
    dense = _scratch_dir("ivfpq_hyb_q_") + "/index"
    centroids, books = XQ.write_ivfpq_index(spark, sf_dir, dense)
    return XS.hybrid_rrf_indexed_topk(
        spark, sf_dir, sparse, dense, centroids, books
    )


def _q_emb_hybrid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality readout for the hybrid retriever
    (ext/similarity.retrieval_eval — r11): recall@10 / MRR / nDCG@10
    of the fused ranking against the exact-cosine top-10 ground truth
    (the brute dense pass, self-excluded) — the per-query evaluation
    surface that makes rrf_k/depth tunable the way doc_neardup_curve
    made LSH thresholds tunable."""
    results = XS.hybrid_rrf_topk(spark, sf_dir).select(
        "q_id", "doc_id", "rank"
    )
    truth = XS.brute_force_topk(spark, sf_dir, n_queries=3, k=10).select(
        "q_id", F.col("vec_id").alias("doc_id")
    )
    return XS.retrieval_eval(results, truth, k=10)


def _q_doc_bm25_appended_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally grown BM25 posting index, searched (ext/text.
    append_to_bm25_index — r11): base 2/3 of the corpus written, the
    remaining 1/3 appended as a batch-keyed ledger partition (df/dl/
    stats ride as per-batch PARTIALS, additive because the doc sets
    are disjoint), then served.  Append ≡ rebuild ≡ the from-text
    scorer (pytest-proven), so the DuckDB twin is doc_bm25_topk's
    own SQL — the sparse sibling of emb_ivfpq_appended_topk."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = _scratch_dir("bm25_app_q_") + "/index"
    XT.write_bm25_index(docs.filter(F.col("doc_id") % 3 != 0), path)
    XT.append_to_bm25_index(
        docs.filter(F.col("doc_id") % 3 == 0), path, batch_id=1
    )
    return XT.bm25_search_indexed(spark, path)


def _q_doc_lm_score_hash4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-4 LM rung over a hash-bucketed census (ext/text.
    hashed_ngram_logprob — VERDICT r10 #4): the KenLM-at-scale shape
    for n-gram orders >= 4 — census width bounded by the bucket count
    (count-min with depth 1) instead of vocabulary⁴; per-doc MLE
    conditional avg ln(c(b4)/c(b3)) with the lm_score rounding
    discipline.  Both engines hash with the same md5-prefix bucket,
    so counts and scores are bit-identical."""
    return XT.hashed4_logprob(spark, sf_dir)


def _q_doc_lm_score_hash5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The order-5 rung — CCNet's actual KenLM order — at the same
    bounded census width (ext/text.hashed_ngram_logprob, n=5): the
    hashed-census machinery generalizes by one more lag; an exact
    5-gram census would be a vocabulary⁵ table."""
    return XT.hashed_ngram_logprob(spark, sf_dir, n=5)


def _q_doc_hash4_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashed census's collision report (ext/text.
    hashed4_collisions): distinct 4-grams vs occupied buckets at the
    configured width — the measured approximation cost that makes the
    fixed-width order-4 census an engineering trade instead of a
    silent error."""
    return XT.hashed4_collisions(spark, sf_dir)


def _q_doc_hash5_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The order-5 collision readout (ext/text.hashed_ngram_collisions,
    n=5): at sparse orders most gram counts are 1, so even a
    single-digit collision rate surfaces as positive per-doc scores —
    this 1-row report is the alarm the hashed rung owes its users at
    EVERY registered order."""
    return XT.hashed_ngram_collisions(spark, sf_dir, n=5)


def _q_doc_source_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(actual_source × pred_source) confusion counts over the NB
    classifier (ext/text.source_nb_confusion — VERDICT r10 #7): the
    per-class evaluation surface; dimension²-bounded groupBy on top
    of the same scoring pass."""
    return XT.source_nb_confusion(spark, sf_dir)


def _q_doc_resampled_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled corpus mix (ext/pipeline.
    resampled_mixture — VERDICT r10 #8): per-doc keep-probability =
    min(1, base_rate · weight_source) drawn with the deterministic
    md5 coin; reports target vs achieved share per source — the
    oracle-proven composition of temperature_mixture_weights and
    importance_sample."""
    return XP.resampled_mixture(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _q_doc_source_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive-Bayes source/domain classifier
    (ext/text.source_nb) — the domain-bucketing rung of the curation
    ladder (CCNet tags domains before mixing; DCLM/DoReMi reweight
    per-domain): Laplace-smoothed per-source term censuses, a tiny
    broadcast source dimension, one equi LEFT-join, min-struct
    argmax.  All logs rounded 12 dp + decimal-weighted so both
    engines pick identical winners."""
    return XT.source_nb(spark, sf_dir)


def _q_doc_source_nb_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME NB classifier scored through the sparse identity
    (ext/text._nb_score sparse=True — VERDICT r12 #7, r15 delta-pivot
    rewrite): per term row the delta part tf·(lp(t,s) − lp_miss(s))
    against the pivoted census, plus one per-doc dl·lp_miss(s) term —
    decimal-exact regrouping of the dense sum with the dense plan
    SHAPE (one broadcast join + one per-doc aggregation; the r13
    union/base-grid shuffles are gone).  Identical scores and argmax,
    so the DuckDB twin is doc_source_nb's own SQL."""
    return XT.source_nb(spark, sf_dir, sparse=True)


def _q_doc_source_nb_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-model NB serving (ext/text.write_nb_index /
    nb_score_indexed — VERDICT r11 #4): the trained term censuses
    written term-sorted at rest, the corpus scored against them with
    one tokenize pass + one (source, term) equi-join — the training
    corpus is never re-scanned at serve time.  Counts at rest are
    exact integers, so stored ≡ in-query bit-for-bit and the DuckDB
    twin is doc_source_nb's own SQL."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = _scratch_dir("nb_idx_q_") + "/index"
    # r15 (guide §1.2): the entry trains AND scores on the same
    # corpus, so the tokenize pass is shared — one checkpointed
    # term-frequency frame feeds the census build and the scoring sum
    # (identical counts; results unchanged).  The stored-model serve
    # function itself still never re-reads the training text.
    tf3 = XT.nb_term_freqs(docs).localCheckpoint(eager=False)
    XT.write_nb_index(docs, path, tf3=tf3)
    return XT.nb_score_indexed(spark, path, docs, tf3=tf3)


def _q_doc_source_nb_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally grown NB model, then served (ext/text.
    append_to_nb_index): base 2/3 of the corpus censused and written,
    the remaining 1/3 appended as a batch-keyed ledger partition
    (census counts and per-source partials are additive across
    disjoint doc sets), then the whole corpus scored against the
    combined partials — classify-on-arrival, the sparse-model
    sibling of doc_bm25_appended_topk.  Append ≡ rebuild ≡ the
    in-query classifier (pytest-proven), so the DuckDB twin is the
    NB twin."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = _scratch_dir("nb_app_q_") + "/index"
    # r15 (guide §1.2): one checkpointed term-frequency frame feeds
    # the base census (2/3 slice), the appended batch census (1/3
    # slice) and the full-corpus scoring sum — one tokenize pass
    # instead of two full-corpus-equivalents; counts and scores are
    # unchanged.
    tf3 = XT.nb_term_freqs(docs).localCheckpoint(eager=False)
    XT.write_nb_index(
        docs.filter(F.col("doc_id") % 3 != 0),
        path,
        tf3=tf3.filter(F.col("doc_id") % 3 != 0),
    )
    XT.append_to_nb_index(
        docs.filter(F.col("doc_id") % 3 == 0),
        path,
        batch_id="r12",
        tf3=tf3.filter(F.col("doc_id") % 3 == 0),
    )
    return XT.nb_score_indexed(spark, path, docs, tf3=tf3)


def _q_doc_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail LM-quality tiers (Wenzek et al. 2020,
    ext/text.lm_quality_buckets): positional ntile over per-doc
    unigram log-probability — rank-based so both engines split
    identically (threshold percentiles would put boundary docs on
    different sides of a float comparison).  Pins the exact/ntile
    path EXPLICITLY: the library default is the window-free sketch
    path (VERDICT r11 #6), which a DuckDB twin cannot replicate
    bit-for-bit (percentile sketch internals differ)."""
    return XT.lm_quality_buckets(spark, sf_dir, sampled_thresholds=False)


_SYMBOLS = [f"SYM{i}" for i in range(8)]


def _q_pivot_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: daily volume matrix (exchange, day) × symbol.
    Spark's pivot with an EXPLICIT value list stays a single two-phase
    aggregation (no extra distinct-values job, no second shuffle);
    decimal sums keep the matrix cells engine-exact."""
    c = candles_from_events(spark, sf_dir)
    vol = F.round("volume", 6).cast("decimal(28,6)")
    piv = (
        c.groupBy("exchange", F.date_trunc("day", "start").alias("day"))
        .pivot("symbol", _SYMBOLS)
        .agg(F.sum(vol).cast("double"))
    )
    return piv.orderBy("exchange", "day")


def _q_volume_rollup_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS / ROLLUP surface: volume totals at (exchange,
    symbol), (exchange), and grand-total grain in ONE pass — Spark
    expands the sets in a single Expand+aggregate (one shuffle), the
    OLAP-cube idiom."""
    c = candles_from_events(spark, sf_dir)
    vol = F.round("volume", 6).cast("decimal(28,6)")
    return (
        c.rollup("exchange", "symbol")
        .agg(
            F.sum(vol).cast("double").alias("total_volume"),
            F.count(F.lit(1)).alias("n_candles"),
        )
        .select(
            F.coalesce("exchange", F.lit("ALL")).alias("exchange"),
            F.coalesce("symbol", F.lit("ALL")).alias("symbol"),
            "total_volume",
            "n_candles",
        )
        .orderBy("exchange", "symbol")
    )


def _q_volume_cube_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE completes the grouping-sets surface next to ROLLUP: all
    four grains of (symbol, month) — (s,m), (s), (m), () — in one
    Expand+aggregate pass (one shuffle)."""
    c = candles_from_events(spark, sf_dir)
    vol = F.round("volume", 6).cast("decimal(28,6)")
    month = F.date_format(F.date_trunc("month", "start"), "yyyy-MM")
    return (
        c.withColumn("month", month)
        .cube("symbol", "month")
        .agg(
            F.sum(vol).cast("double").alias("total_volume"),
            F.count(F.lit(1)).alias("n_candles"),
        )
        .select(
            F.coalesce("symbol", F.lit("ALL")).alias("symbol"),
            F.coalesce("month", F.lit("ALL")).alias("month"),
            "total_volume",
            "n_candles",
        )
        .orderBy("symbol", "month")
    )


def _q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-max drawdown per symbol: the deepest close-vs-peak drop.
    The running peak is a rows-unbounded-preceding MAX window (exact —
    max has no float-fold ambiguity, unlike sums), the per-row
    drawdown ratio is closed-form double arithmetic, and the final
    MIN aggregation is again order-safe."""
    c = candles_from_events(spark, sf_dir)
    w = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("close").over(w)
    dd = F.col("close") / peak - F.lit(1.0)
    return (
        c.withColumn("dd", dd)
        .groupBy("exchange", "symbol")
        .agg(
            F.round(F.min("dd"), 6).alias("max_drawdown"),
            F.round(F.max("close"), 6).alias("peak_close"),
        )
        .orderBy("exchange", "symbol")
    )


def _q_top_volume_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 volume candles per symbol — rank-per-group via
    row_number over a per-symbol window; rows beyond rank 5 are
    dropped before leaving the exchange (WindowGroupLimit), so the
    full history never sorts globally.  Ranking is on ROUNDED volume
    with a start-time tiebreak (floats are never ranked raw)."""
    c = candles_from_events(spark, sf_dir)
    volr = F.round("volume", 6)
    w = Window.partitionBy("exchange", "symbol").orderBy(
        volr.desc(), F.col("start").asc()
    )
    return (
        c.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(
            "exchange",
            "symbol",
            "rk",
            volr.alias("volume"),
            "start",
            F.round("close", 6).alias("close"),
        )
        .orderBy("exchange", "symbol", "rk")
    )


def _q_bollinger_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import bollinger

    return bollinger(candles_from_events(spark, sf_dir), 20)


def _q_daily_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        daily_volatility,
    )

    return daily_volatility(candles_from_events(spark, sf_dir))


def _q_atr_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import atr

    return atr(candles_from_events(spark, sf_dir), 14)


def _q_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range join (inequality-only predicate): classify candles into
    # price bands via a broadcast nested-loop join against a tiny
    # bands dimension — the right physical plan when the range side
    # is small; larger range sides bucket on overlapping keys first.
    c = candles_from_events(spark, sf_dir)
    bands = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 150.0), (3, 150.0, 1e12)],
        ["band", "lo", "hi"],
    )
    return (
        c.join(
            F.broadcast(bands),
            (F.col("close") >= F.col("lo")) & (F.col("close") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_candles"),
            F.min("close").alias("min_close"),
            F.max("close").alias("max_close"),
        )
        .orderBy("band")
    )


def _q_asof_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AS-OF join: the close price as of each event's timestamp, per
    # (exchange, symbol) — oracle twin is DuckDB's native ASOF JOIN.
    from trade_data_collection_service_spark.candles import events_df
    from trade_data_collection_service_spark.operators.asof import asof_join

    ev = events_df(spark, sf_dir).select(
        "event_id",
        F.when(F.col("event_type") < "m", F.lit("EXCH_A"))
        .otherwise(F.lit("EXCH_B"))
        .alias("exchange"),
        F.concat(F.lit("SYM"), (F.col("user_id") % 8).cast("string")).alias("symbol"),
        "ts",
    )
    c = candles_from_events(spark, sf_dir)
    out = asof_join(
        ev,
        c,
        ["exchange", "symbol"],
        "ts",
        "start",
        ["start", "close"],
    )
    return out.select(
        "event_id", "exchange", "symbol", "asof_start", "asof_close"
    )


def _q_doc_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.ext.text import quality_of

    return XP.importance_sample(
        quality_of(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    )


def _q_volume_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.resample import volume_bars

    return volume_bars(candles_from_events(spark, sf_dir), 500.0)


def _q_asof_price_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Forward AS-OF: the first candle at or after each event — events
    # in the final minute of a series have no following candle and
    # keep nulls (both sides are LEFT: DuckDB `ASOF LEFT JOIN`).
    from trade_data_collection_service_spark.candles import events_df
    from trade_data_collection_service_spark.operators.asof import asof_join

    ev = events_df(spark, sf_dir).select(
        "event_id",
        F.when(F.col("event_type") < "m", F.lit("EXCH_A"))
        .otherwise(F.lit("EXCH_B"))
        .alias("exchange"),
        F.concat(F.lit("SYM"), (F.col("user_id") % 8).cast("string")).alias("symbol"),
        "ts",
    )
    c = candles_from_events(spark, sf_dir)
    out = asof_join(
        ev,
        c,
        ["exchange", "symbol"],
        "ts",
        "start",
        ["start", "close"],
        direction="forward",
    )
    return out.select(
        "event_id", "exchange", "symbol", "asof_start", "asof_close"
    )


def _q_repair_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T7 end-to-end: corrupt a 15m rollup window (drop even days,
    # double volume on the rest), repair it from raw, return the
    # repaired window.  The oracle aggregates raw directly — hash
    # equality proves the repair restored exact truth.
    from trade_data_collection_service_spark.operators.repair import repair_window

    ws, we = "2024-01-05 00:00:00", "2024-01-20 00:00:00"
    # The candle base feeds three consumers (good rollup, corrupt
    # variant, repair truth); materialize it once — in deployment the
    # raw candle table IS stored (events are transport-only), so the
    # checkpoint stands in for reading the stored table, not an extra.
    c = candles_from_events(spark, sf_dir).localCheckpoint(eager=False)
    good = rollup_raw(c, 15)
    in_win = (
        (F.col("exchange") == "EXCH_A")
        & (F.col("symbol") == "SYM0")
        & (F.col("candle_start") >= F.lit(ws).cast("timestamp"))
        & (F.col("candle_start") < F.lit(we).cast("timestamp"))
    )
    corrupted = good.filter(~in_win).unionByName(
        good.filter(in_win)
        .filter(F.dayofmonth("candle_start") % 2 == 1)
        .withColumn("volume", F.round(F.col("volume") * 2, 6))
    )
    repaired = repair_window(corrupted, c, 15, "EXCH_A", "SYM0", ws, we)
    return repaired.filter(in_win).select(*ROLLUP_COLS)


def _q_watchdog_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T5-T7 composed end-to-end (VERDICT r1 item 5; reference main
    # loop data_quality_check.py:672-697): delete a 2-day window of
    # SYM3 from the raw table, then run one full watchdog pass —
    # freshness → gap detect → island refill (mock-exchange transport
    # backed by the truth table) → rollup recompute → verify.  The
    # returned repaired 5m rollup is compared against the oracle's
    # clean-table aggregation: hash equality proves the cycle restored
    # exact truth.
    from trade_data_collection_service_spark.operators.watchdog import (
        table_refill,
        watchdog_cycle,
    )

    # Four plan subtrees consume the candle base (gap detection,
    # repair union, refill truth, verify); without a materialization
    # point each re-runs the events→candles aggregation.  In
    # deployment the candle table is stored; the lazy checkpoint is
    # that stored table's stand-in (measured 10.4 s → ~4 s at sf0.1).
    c = candles_from_events(spark, sf_dir).localCheckpoint(eager=False)
    lost = (
        (F.col("symbol") == "SYM3")
        & (F.col("start") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("start") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
    )
    corrupted = c.filter(~lost)
    report = watchdog_cycle(corrupted, table_refill(c), rollup_minutes=5)
    return report.repaired_rollup.select(*ROLLUP_COLS)


def _q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    # `quantile_cont`, both R-7) — the exact-percentile analytics the
    # approximate ClickHouse `quantile` family would approximate.
    c = candles_from_events(spark, sf_dir)
    return (
        c.groupBy("symbol")
        .agg(
            F.round(F.percentile("close", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("close", F.lit(0.95)), 6).alias("p95"),
            F.round(F.percentile("close", F.lit(0.99)), 6).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("symbol")
    )


def _q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XD.exact_dedup(XD.documents_neardup(spark, sf_dir))


def _q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XD.minhash_lsh_pairs(XD.documents_neardup(spark, sf_dir))


def _q_doc_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-exact rung of the dedup ladder (ext/dedup.py::
    normalized_dedup): case/punctuation/whitespace variants fold via
    the normalizing digest; runs over the normdup fixture so the
    byte-exact digest provably misses what this one catches
    (n_variants > 1 groups)."""
    return XD.normalized_dedup(XD.documents_normdup(spark, sf_dir))


def _q_doc_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota (ext/pipeline.py::source_cap): top-25 docs
    per source by quality — Catalyst's WindowGroupLimit keeps each
    map task's local top-25 before the shuffle (plan-asserted in
    tests/test_plans.py)."""
    return XP.source_cap(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), cap=25
    )


def _q_doc_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination audit (ext/pipeline.py::split_leakage):
    LSH-verified near-dup pairs that straddle the per-doc train/val/
    test split, with the grouped-split verdict showing provenance
    hashing closes the leak."""
    return XP.split_leakage(XD.documents_neardup(spark, sf_dir))


def _q_zorder_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered layout + 2-D box query
    (functions/zorder.py): writes lineitem Morton-clustered on
    (l_partkey, l_suppkey), then answers the box via driver-derived
    covering-cell partition pruning + pushed min/max row-group
    pruning.  The DuckDB twin queries the UNCLUSTERED table — the
    layout must be invisible in the results (pruning correctness,
    not just pruning speed)."""
    from trade_data_collection_service_spark.functions.zorder import (
        write_zordered,
        zorder_range_query,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    )
    path = _scratch_dir("zorder-") + "/li"
    write_zordered(li, path, "l_partkey", "l_suppkey")
    out = zorder_range_query(spark, path, (40, 159), (2, 15))
    # per-row-round -> decimal sums: a raw double sum is addition-
    # order-dependent (partitioning- and engine-visible at the ulp),
    # the one nondeterminism the oracle contract forbids
    return (
        out.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.round(F.col("l_quantity"), 2).cast("decimal(18,2)")
            ).cast("double").alias("sum_qty"),
            F.sum(
                F.round(F.col("l_extendedprice"), 2).cast(
                    "decimal(18,2)"
                )
            ).cast("double").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


def _q_doc_quality_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality filter, the MODEL: 20 full-batch GD steps of
    hard-sigmoid logistic regression run as engine aggregates
    (ext/lr.py) — the DuckDB twin replays the identical trajectory
    as 20 chained CTEs, so the hash match proves the distributed
    training loop step-for-step."""
    from trade_data_collection_service_spark.ext.lr import (
        quality_lr_weights,
    )

    return quality_lr_weights(spark, sf_dir)


def _q_doc_quality_lr_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality filter, the SERVE path: score every doc with
    the learned weights (map-only once trained)."""
    from trade_data_collection_service_spark.ext.lr import (
        quality_lr_scores,
    )

    return quality_lr_scores(spark, sf_dir)


def _q_doc_quality_lr_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability curve of the trained filter (ext/lr.
    quality_lr_calibration — r12): decile bins of the 6-dp score vs
    actual keep rate — the calibration readout that turns a score
    threshold into an expected yield."""
    from trade_data_collection_service_spark.ext.lr import (
        quality_lr_calibration,
    )

    return quality_lr_calibration(spark, sf_dir)


def _q_doc_quality_lr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality filter, the EVAL: confusion counts + accuracy/
    precision/recall against the training labels."""
    from trade_data_collection_service_spark.ext.lr import quality_lr_eval

    return quality_lr_eval(spark, sf_dir)


def _q_doc_lr_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality filter composed INTO the pipeline
    (ext/lr.py::quality_lr_filter): importance-sample with the
    learned score as keep-probability, per-source keep report —
    the learned analog of doc_importance_sample."""
    from trade_data_collection_service_spark.ext.lr import (
        quality_lr_filter,
    )

    return quality_lr_filter(spark, sf_dir)


def _q_doc_dup_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate flow matrix (ext/dedup.py::dup_flow):
    verified near-dup pairs by unordered source pair — the
    provenance readout behind per-domain dedup policy."""
    return XD.dup_flow(XD.documents_neardup(spark, sf_dir))


def _q_event_ab_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis (ext/pipeline.py::ab_conversion_chisq):
    hash-assigned A/B over click events, attribution-window
    conversion, 2×2 chi-square — chi² ≈ 0 expected (the fixture's
    assignment is null by construction)."""
    from trade_data_collection_service_spark.candles import events_df

    return XP.ab_conversion_chisq(events_df(spark, sf_dir))


def _q_bloom_semijoin_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction (functions/bloom.py): lineitem
    pre-filtered map-side by a Bloom built from a selective supplier
    subset, then exactly joined — the DuckDB twin is the PLAIN join,
    so a single false negative (a dropped true match) would flip the
    hash.  Revenue uses the decimal-exact per-row-round idiom
    (ext/tpch.py q6)."""
    from trade_data_collection_service_spark.functions.bloom import (
        bloom_semijoin,
    )

    fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    dim = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_nationkey") % 5 == 3)
        .select("s_suppkey")
    )
    rev = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    return (
        bloom_semijoin(fact, dim, "l_suppkey", "s_suppkey")
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("s_suppkey")
    )


def _q_doc_neardup_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XD.neardup_quality(spark, sf_dir)


def _q_doc_neardup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall vs Jaccard threshold in ONE LSH+verify pass
    (ext/dedup.neardup_quality_curve, the dedup twin of
    ann_recall_curve): banding and the bucket cap are
    threshold-independent, so the whole tuning curve is conditional
    aggregates over pairs verified once at the loosest grid point;
    dense grid — empty levels emit zero counts, precision NULL."""
    return XD.neardup_quality_curve(spark, sf_dir)


def _q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XD.ngram_jaccard_pairs(XD.documents_neardup(spark, sf_dir))


def _q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = XD.documents_neardup(spark, sf_dir)
    pairs = XD.minhash_lsh_pairs(docs)
    return XC.assign_clusters(docs, pairs).orderBy("doc_id")


def _q_doc_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = XD.documents_neardup(spark, sf_dir)
    pairs = XD.minhash_lsh_pairs(docs)
    clusters = XC.assign_clusters(docs, pairs)
    scored = XT.quality_of(docs).select("doc_id", "quality_score")
    return XC.keep_best_per_cluster(scored, clusters)


def _q_doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.stratified_sample(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _q_doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.train_split(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _q_doc_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: hash key is the SOURCE, so a source's docs
    (and the near-dups that cluster within it) land on one side
    (ext/pipeline.py::grouped_train_split)."""
    return XP.grouped_train_split(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _q_doc_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.vocab_topk(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.pii_scrub(XP.documents_with_pii(spark, sf_dir))


def _q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df

    return XP.sessionize(events_df(spark, sf_dir))


def _q_event_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df

    return XP.sessionize_native(events_df(spark, sf_dir))


def _q_doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.heavy_hitters(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XT.repetition(spark, sf_dir)


def _q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df

    return XP.window_funnel(events_df(spark, sf_dir))


def _q_event_funnel_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df

    return XP.funnel_rates(events_df(spark, sf_dir))


def _q_event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df

    return XP.retention_matrix(events_df(spark, sf_dir))


def _q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.decontaminate(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.pack_sequences(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + event-time interval join (click→purchase within 4h).

    Same logical plan the stream-stream join uses
    (streaming/interval_join.py) — SMJ on user_id, range predicate
    post-join; the streaming twin's parity is pytest-proven."""
    from trade_data_collection_service_spark.streaming.interval_join import (
        batch_attribution,
    )

    return batch_attribution(spark, sf_dir).orderBy(
        "user_id", "click_id", "purchase_id"
    )


def _q_events_hll_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df
    from trade_data_collection_service_spark.functions.sketch import hll_distinct

    ev = events_df(spark, sf_dir).withColumn("day", F.date_trunc("day", "ts"))
    exact = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("n_users_exact")
    )
    est = hll_distinct(ev, ["day"], "user_id")
    return exact.join(est, "day").orderBy("day")


def _q_doc_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.reservoir_per_group(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "lang", "doc_id", 10
    )


def _q_doc_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clusters as doc_dup_clusters, computed by the alternating
    large-star/small-star contraction instead of label propagation —
    both converge to min-reachable-id, so they share ONE oracle."""
    docs = XD.documents_neardup(spark, sf_dir)
    pairs = XD.minhash_lsh_pairs(docs)
    labels = XC.connected_components_star(pairs)
    return (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .orderBy("doc_id")
    )


def _q_corpus_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline as ONE declarative plan:
    near-dup clusters → keep best doc per cluster → quality filter →
    deterministic split assignment.  What a user runs to turn a raw
    crawl into a training corpus."""
    docs = XD.documents_neardup(spark, sf_dir)
    pairs = XD.minhash_lsh_pairs(docs)
    clusters = XC.assign_clusters(docs, pairs)
    scored = XT.quality_of(docs).select("doc_id", "quality_score")
    kept = XC.keep_doc_per_cluster(scored, clusters)
    split = XP.train_split(docs)
    return (
        kept.filter(F.col("quality_score") >= 0.5)
        .join(split, "doc_id")
        .select("doc_id", "lang", "split", "n_docs", "quality_score")
        .orderBy("doc_id")
    )


def _q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XD.simhash(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XD.simhash_near_pairs(XD.documents_neardup(spark, sf_dir))


def _q_doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XT.bm25_topk(spark, sf_dir)


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.chunk_documents(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


CMS_PROBES = ("fast", "data", "stream", "the", "a")


def _q_doc_token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream + point estimates for a
    probe vocabulary, joined with exact counts (the count-min
    guarantee est >= exact is thus oracle-visible row by row)."""
    from trade_data_collection_service_spark.functions.sketch import (
        cms_estimate,
        cms_sketch,
    )

    docs = XT.with_tokens(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = docs.select(F.explode("tokens").alias("token"))
    sk = cms_sketch(toks, "token")
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], ["token"])
    est = cms_estimate(sk, probes, "token")
    exact = (
        toks.filter(F.col("token").isin(*CMS_PROBES))
        .groupBy(F.col("token").alias("probe"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, "probe", "left")
        .select(
            "probe",
            "est_count",
            F.coalesce("exact_count", F.lit(0)).cast("long").alias("exact_count"),
        )
        .orderBy("probe")
    )


def _q_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XP.event_anomaly(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_emb_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition — trained coarse quantizer prunes to nprobe
    buckets, PQ LUT scores codes inside them (ext/pq.ivf_pq_topk)."""
    return XQ.ivf_pq_topk(spark, sf_dir)


def _q_emb_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — residual-encoding IVF-PQ, the exact FAISS form
    (ext/pq.ivfadc_topk): PQ codebooks train on x − coarse_centroid,
    query LUTs are per probed bucket."""
    return XQ.ivfadc_topk(spark, sf_dir)


def _q_emb_ivfpq_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored IVF-PQ index, written then searched — the 100 TB
    deployment shape itself under the oracle: write_ivfpq_index
    materializes m code bytes + bucket per vector partitionBy(bucket),
    ivfpq_search_indexed reads ONLY the probed bucket partitions
    (plan-asserted in tests/test_ivf_index.py) and scores with the
    asymmetric LUT.  Results are identical to the inline ivf_pq_topk
    composition, so the DuckDB twin is the same SQL."""
    from trade_data_collection_service_spark.ext.similarity import vectors

    path = _scratch_dir("ivfpq_idx_q_") + "/index"
    centroids, books = XQ.write_ivfpq_index(spark, sf_dir, path)
    qs = vectors(spark, sf_dir).filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 103)
    )
    return XQ.ivfpq_search_indexed(
        spark, path, centroids, books, qs, k=10, nprobe=2
    )


def _q_emb_ivfpq_appended_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally grown IVF-PQ index, searched: base 2/3 of the
    corpus written (quantizers trained on the FULL corpus — the
    write_ivfpq_index contract), the remaining 1/3 appended under the
    frozen centroids + codebooks (ext/pq.py::append_to_ivfpq_index,
    the FAISS `add` contract on the compressed form), then searched.
    Append ≡ rebuild ≡ the inline ivf_pq_topk composition
    (pytest-proven chain, tests/test_ivf_index.py), so the DuckDB
    twin is the inline SQL."""
    from trade_data_collection_service_spark.ext.pq import (
        append_to_ivfpq_index,
        ivfpq_search_indexed,
        write_ivfpq_index,
    )
    from trade_data_collection_service_spark.ext.similarity import vectors

    path = _scratch_dir("ivfpq_app_q_") + "/index"
    v = vectors(spark, sf_dir)
    centroids, books = write_ivfpq_index(
        spark, sf_dir, path, source=v.filter(F.col("vec_id") % 3 != 0)
    )
    append_to_ivfpq_index(
        v.filter(F.col("vec_id") % 3 == 0), path, centroids, books,
        batch_id="b1",
    )
    qs = v.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 103))
    return ivfpq_search_indexed(
        spark, path, centroids, books, qs, k=10, nprobe=2
    )


def _q_doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicate-passage spans over the documents
    table (ext/dedup.py::duplicate_spans): maximal runs of 5-token
    windows occurring >= 2 times corpus-wide, detected hot-gram-safe
    (r9: map-side-combined census + equi-join, VERDICT r8 #2) over
    128-bit hashed gram keys (hash_grams, VERDICT r8 #4 — pytest-
    proven identical to literal grams, so the twin is unchanged)."""
    return XD.duplicate_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        k=5,
        hash_grams=True,
    )


def _q_doc_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply side of doc_duplicate_spans: documents rebuilt with the
    duplicated passages stripped (ext/dedup.py::strip_duplicate_
    spans), on the r9 hot-gram-safe hashed-gram detect path."""
    return XD.strip_duplicate_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        k=5,
        hash_grams=True,
    )


def _q_doc_dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-copy passage dedup (Lee et al. 2021 policy) over the
    documents table (ext/dedup.py::dedup_passages_keep_first), on the
    r9 hot-gram-safe hashed-gram detect path."""
    return XD.dedup_passages_keep_first(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        k=5,
        hash_grams=True,
    )


def _q_doc_incremental_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time passage dedup under the oracle: the corpus is
    split 2/3 stored + 1/3 batch, the stored side's gram census
    written to an index (ext/dedup.py::write_gram_index), and the
    batch detected against it WITHOUT re-reading stored text
    (incremental_duplicate_spans).  Incremental == full-corpus run
    restricted to the batch docs (pytest-proven), so the DuckDB twin
    is the span chain with hits filtered to batch docs.  r9: the
    index is written and read with 128-bit hashed gram keys
    (hash_grams) on the hot-gram-safe detect path."""
    path = _scratch_dir("gram_idx_q_") + "/index"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    XD.write_gram_index(
        docs.filter(F.col("doc_id") % 3 != 0), path, k=5, hash_grams=True
    )
    return XD.incremental_duplicate_spans(
        docs.filter(F.col("doc_id") % 3 == 0), path, k=5, hash_grams=True
    )


def _q_emb_ivf_appended_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally GROWN IVF index under the oracle (VERDICT r6 #6 /
    r7 #5): the corpus is split 2/3 + 1/3, the base written with the
    full-corpus-trained frozen centroids, the remaining third added
    via append_to_ivf_index (assign-only, existing partitions never
    rewritten — the FAISS ``add`` contract), then searched.  Append is
    search-identical to a rebuild over the union corpus (pytest:
    tests/test_ivf_index.py::test_append_equals_rebuild), and a
    full-corpus index search equals the inline ivf_trained_topk
    composition, so the DuckDB twin is emb_ivf_trained_topk's SQL.
    bucket is cast to int to match the inline twin's published
    dtype (assign_buckets derives it from the k-means cluster id)."""
    from trade_data_collection_service_spark.ext.kmeans import fit
    from trade_data_collection_service_spark.ext.similarity import (
        append_to_ivf_index,
        assign_buckets,
        ivf_search_indexed,
        vectors,
    )

    path = _scratch_dir("ivf_app_q_") + "/index"
    cents, _ = fit(spark, sf_dir, k=8, max_iters=2, round_to=6)
    centroids = cents.select(
        F.col("cluster").alias("vec_id"), F.col("centroid").alias("emb")
    ).withColumn("nrm", XS._norm("emb"))
    v = vectors(spark, sf_dir)
    base = v.filter(F.col("vec_id") % 3 != 0)
    newer = v.filter(F.col("vec_id") % 3 == 0)
    (
        assign_buckets(base, centroids)
        .repartition("bucket")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    append_to_ivf_index(newer, path, centroids)
    qs = v.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 103))
    out = ivf_search_indexed(spark, path, centroids, qs, k=3, nprobe=1)
    return out.withColumn("bucket", F.col("bucket").cast("int"))


def _q_emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, end to end: per-subspace Lloyd's
    codebooks (m=4 x 16 codes, 2 iterations), long-format encode, and
    asymmetric LUT search for the first 5 corpus vectors.  Completes
    the oracle-checked ANN ladder (brute force → IVF → int8 → PQ);
    the DuckDB twin unrolls the identical sliced k-means (VERDICT r2
    next-round #3)."""
    books = XQ.train_codebooks(spark, sf_dir, m=4, k=16, max_iters=2)
    encoded = XQ.pq_encode(spark, sf_dir, books, m=4)
    return XQ.pq_search(
        spark, sf_dir, books, encoded, n_queries=5, k=10, m=4
    )


def _q_donchian_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        donchian,
    )

    return donchian(candles_from_events(spark, sf_dir)).orderBy(
        "exchange", "symbol", "start"
    )


def _q_ema_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed adjusted-EMA prefix scan (operators/ema.py) — the
    DuckDB twin runs the textbook sequential recurrence as a
    recursive CTE, so the hash match proves the blocked scan equals
    the definition."""
    from trade_data_collection_service_spark.operators.ema import ema

    return ema(candles_from_events(spark, sf_dir))


def _q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.ema import macd

    return macd(candles_from_events(spark, sf_dir))


def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df

    return XP.event_transitions(events_df(spark, sf_dir))


def _q_event_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df

    return XP.event_paths_topk(events_df(spark, sf_dir))


def _q_doc_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return XT.ngram_topk(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _q_asof_price_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 2-minute staleness tolerance (pandas
    merge_asof semantics), against a candle stream thinned to every
    5th minute so the tolerance actually bites: events whose latest
    candle is older than 2 minutes publish null payloads."""
    from trade_data_collection_service_spark.candles import events_df
    from trade_data_collection_service_spark.operators.asof import asof_join

    ev = events_df(spark, sf_dir).select(
        "event_id",
        F.when(F.col("event_type") < "m", F.lit("EXCH_A"))
        .otherwise(F.lit("EXCH_B"))
        .alias("exchange"),
        F.concat(F.lit("SYM"), (F.col("user_id") % 8).cast("string")).alias(
            "symbol"
        ),
        "ts",
    )
    c = candles_from_events(spark, sf_dir).filter(
        F.expr("(close_unixtime div 60) % 5 = 0")
    )
    out = asof_join(
        ev,
        c,
        ["exchange", "symbol"],
        "ts",
        "start",
        ["start", "close"],
        tolerance="2 minutes",
    )
    return out.select(
        "event_id", "exchange", "symbol", "asof_start", "asof_close"
    )


def _q_returns_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.operators.analytics import (
        returns_autocorr,
    )

    return returns_autocorr(candles_from_events(spark, sf_dir))


def _q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trade_data_collection_service_spark.candles import events_df

    ev = events_df(spark, sf_dir)
    return XP.conversion_latency(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


def _with_utc(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _utc(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_utc(fn) for name, fn in _queries().items()}


# r16 ROTATION PLAN (write _R16_WINDOW next round): first, anything
# r16 changes; then the oldest entries by driver-evidence vintage —
# after r15 that is the remaining r11-vintage set: RECOMPUTE it as
# CORRECTNESS_r11 keys minus _R12_WINDOW minus _R13_WINDOW minus
# _R14_WINDOW minus _R15_WINDOW, recorded order (39 entries at the
# time of writing — but recompute, never trust the prose count), and
# fill the remaining slots with the oldest r12-vintage entries
# (CORRECTNESS_r12 keys minus _R13_WINDOW minus _R14_WINDOW minus
# _R15_WINDOW), recorded order.  NEVER hand-edit the lists —
# recompute from the CORRECTNESS_r* files (hand-edits drifted twice
# in r10).
#
# r15 driver window (computed EXACTLY per the committed r14 plan
# comment above): the 27 entries r15 changes — the 13 ANN entries
# whose coarse/PQ argmins are literal-folded map-only expressions
# (kmeans.assign / assign_buckets / assign_buckets_l2 /
# train_codebooks / pq_encode / _ivfpq_rows, incl. the hybrid and
# appended/indexed consumers), the five doc_source_nb* entries (the
# sparse branch rewritten to the delta-pivot dense shape; the
# indexed/appended entries share one checkpointed nb_term_freqs
# tokenize pass), the five LR entries (the _gd coalesce width now
# scales with defaultParallelism), and the four lease-taking
# stored-index entries touched by the write_neardup_index /
# incremental_neardup_pairs signature checkpoints and the
# _local_lease_path urllib parse (doc_incremental_neardup,
# doc_incremental_spans, doc_bm25_indexed/appended_topk; the other
# four lease entries are already in the ANN set) — then the 20
# remaining r10-vintage entries (CORRECTNESS_r10 keys minus r11 keys
# minus _R12/13/14_WINDOW minus the changed set: emb_ivf_topk of the
# 21 leftovers moved into changed-first), then the 3 oldest
# r11-vintage entries to exactly 50.  After this window no registry
# entry's driver evidence predates r11 except the 19 r10-vintage
# entries this window itself re-proves.  The full registry surface
# is swept locally via tools/check_oracle.py at sf0.01 and sf0.1
# each round (docs/COVERAGE.md; sweep lines carry the HEAD SHA) —
# the window is a budget cap, not the evidence.
_R15_WINDOW = [
    "emb_ivf_topk",
    "emb_ivf_trained_topk",
    "emb_ivf_pq_topk",
    "emb_ivfadc_topk",
    "emb_ivfadc_rerank_topk",
    "emb_pq_topk",
    "emb_ivfpq_indexed_topk",
    "emb_ivfpq_appended_topk",
    "emb_ivf_appended_topk",
    "emb_semdedup",
    "ann_recall",
    "ann_recall_curve",
    "emb_hybrid_indexed_rrf",
    "doc_source_nb",
    "doc_source_nb_sparse",
    "doc_source_nb_confusion",
    "doc_source_nb_indexed",
    "doc_source_nb_appended",
    "doc_quality_lr",
    "doc_quality_lr_scores",
    "doc_quality_lr_eval",
    "doc_quality_lr_calibration",
    "doc_lr_filtered",
    "doc_incremental_neardup",
    "doc_incremental_spans",
    "doc_bm25_indexed_topk",
    "doc_bm25_appended_topk",
    "doc_fingerprint",
    "doc_importance_sample",
    "doc_lang_id",
    "doc_ngram_jaccard",
    "doc_pack_sequences",
    "doc_pii_scrub",
    "doc_quality",
    "doc_reservoir",
    "doc_sample_stratified",
    "doc_simhash",
    "doc_simhash_pairs",
    "doc_token_stats",
    "doc_train_split",
    "doc_vocab_topk",
    "earliest_per_symbol",
    "emb_cosine_topk",
    "emb_neardup",
    "emb_quantized_topk",
    "event_attribution",
    "events_json",
    "doc_dup_flow",
    "doc_dedup_normalized",
    "doc_source_cap",
]

#
# r14 driver window (VERDICT r13 #1, computed EXACTLY per the
# committed r13 plan comment): the 20 entries r14 changes — the new
# multimodal_png_pixels/multimodal_gif_pixels/multimodal_jpeg_pixels
# (real PNG inflate + unfilter, GIF LZW and baseline-JPEG Huffman +
# IDCT pixel decodes, added mid-round after the original rotation,
# so they take the changed-first slots and the three newest-vintage
# fill entries at the tail were dropped to keep the 50 cap; the r15
# recomputation rule re-surfaces those three as r10-vintage
# leftovers) and the new multimodal_samples (real WAV-PCM16/BMP
# payload decode); multimodal_headers (PNG/GIF/JPEG synthesis now
# emits complete images — twin reflects the length-derived PNG/JPEG
# heights, the PNG 1/3-channel split and the all-grayscale JPEG —
# plus the r14 BMP branch + exact-div id quotients) and
# multimodal_features/frames (module-shared, the r12/r13
# precedent); the five doc_source_nb* entries (the shared _nb_score
# default flipped to the density auto-switch); and the eight
# stored-index entries whose maintenance path runs through the
# r14-hardened lease take/release (doc_incremental_neardup,
# doc_incremental_spans, doc_bm25_indexed/appended_topk,
# emb_hybrid_indexed_rrf, emb_ivfpq_indexed/appended_topk,
# emb_ivf_appended_topk; the r13 comment called this family "nine" —
# the machine-recomputed count is eight) — then the 10 leftover
# r9-vintage entries (CORRECTNESS_r09 minus r10/r11 keys minus
# _R12_WINDOW minus _R13_WINDOW, recorded order), then the 20 oldest
# r10-vintage entries to exactly 50.  After this window no registry
# entry's driver evidence predates r10.  The full registry surface
# is swept locally via tools/check_oracle.py at sf0.01 and sf0.1
# each round (docs/COVERAGE.md; sweep lines carry the HEAD SHA) —
# the window is a budget cap, not the evidence.
_R14_WINDOW = [
    "multimodal_png_pixels",
    "multimodal_gif_pixels",
    "multimodal_jpeg_pixels",
    "multimodal_samples",
    "multimodal_headers",
    "multimodal_features",
    "multimodal_frames",
    "doc_source_nb",
    "doc_source_nb_sparse",
    "doc_source_nb_confusion",
    "doc_source_nb_indexed",
    "doc_source_nb_appended",
    "doc_incremental_neardup",
    "doc_incremental_spans",
    "doc_bm25_indexed_topk",
    "doc_bm25_appended_topk",
    "emb_hybrid_indexed_rrf",
    "emb_ivfpq_indexed_topk",
    "emb_ivfpq_appended_topk",
    "emb_ivf_appended_topk",
    "event_funnel_rates",
    "rolling_beta_60",
    "rolling_sharpe_60",
    "drawdown_curve",
    "rolling_corr_60",
    "doc_source_quality",
    "cascade_15m",
    "corpus_curated",
    "doc_decontaminate",
    "doc_dedup_exact",
    "doc_grouped_split",
    "emb_ivfadc_rerank_topk",
    "ann_recall_curve",
    "doc_bigram_logprob",
    "doc_lm_score_backoff",
    "doc_lm_score_tri",
    "doc_neardup_curve",
    "doc_temperature_mix",
    "doc_repetition",
    "minute_spread",
    "exchange_spread",
    "donchian_20",
    "event_transitions",
    "event_paths_topk",
    "doc_ngram_topk",
    "asof_price_tolerance",
    "rolling_active_hll",
    "doc_dedup_keep_best",
    "doc_dup_clusters",
    "doc_dup_clusters_star",
]

# retained for the r15 recomputation rule above (the window
# arithmetic is defined in terms of prior windows)
_R13_WINDOW = [
    "doc_source_nb_sparse",
    "multimodal_headers",
    "multimodal_features",
    "multimodal_frames",
    "doc_source_nb",
    "doc_source_nb_confusion",
    "doc_source_nb_indexed",
    "doc_source_nb_appended",
    "doc_incremental_neardup",
    "doc_incremental_spans",
    "doc_bm25_indexed_topk",
    "doc_bm25_appended_topk",
    "emb_hybrid_indexed_rrf",
    "emb_ivfpq_indexed_topk",
    "emb_ivfpq_appended_topk",
    "emb_ivf_appended_topk",
    "doc_minhash_lsh",
    "doc_bm25_topk",
    "emb_pq_topk",
    "emb_ivf_pq_topk",
    "emb_ivfadc_topk",
    "event_anomaly",
    "events_hll_daily",
    "emb_ivf_trained_topk",
    "tpch_q9",
    "tpch_q11",
    "tpch_q16",
    "tpch_q20",
    "event_sessions_native",
    "doc_heavy_hitters",
    "event_funnel",
    "event_retention",
    "twap_daily",
    "emb_semdedup",
    "candle_patterns",
    "rsi_14",
    "stochastic_14",
    "obv",
    "returns_corr",
    "rolling_active_users",
    "doc_chunk_dupes",
    "gap_filled_interp",
    "doc_tfidf_terms",
    "ann_recall",
    "doc_unigram_logprob",
    "symbol_beta",
    "doc_source_mix",
    "volume_profile",
    "intraday_profile",
    "doc_neardup_quality",
]

# retained for the r14 recomputation rule above (the window
# arithmetic is defined in terms of prior windows)
_R12_WINDOW = [
    "doc_source_nb_indexed",
    "doc_source_nb_appended",
    "multimodal_headers",
    "doc_quality_lr_calibration",
    "doc_source_nb",
    "doc_source_nb_confusion",
    "doc_lm_buckets",
    "event_ab_chisq",
    "bloom_semijoin_scan",
    "multimodal_features",
    "multimodal_frames",
    "volume_bars",
    "event_sessions",
    "asof_price",
    "repair_window",
    "minmax_window",
    "count_distinct_window",
    "latest_per_symbol",
    "distinct_pairs",
    "watchdog_cycle",
    "asof_price_forward",
    "atr_14",
    "recent_topn",
    "symbol_filter",
    "readme_window",
    "freshness",
    "listing_diff",
    "gap_filled",
    "gap_filled_ffill",
    "sma_20",
    "vwap_daily",
    "price_percentiles",
    "price_bands",
    "gap_missing_count",
    "gap_islands",
    "backfill_plan",
    "validate_quarantine",
    "doc_chunks",
    "doc_token_cms",
    "tpch_q17",
    "tpch_q21",
    "tpch_q8",
    "tpch_q13",
    "tpch_q15",
    "candles_1m",
    "dedup_latest",
    "rollup_5m",
    "doc_duplicate_spans",
    "doc_strip_spans",
    "doc_dedup_passages",
]


def _queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _registry()
    missing = [k for k in _R15_WINDOW if k not in base]
    assert not missing, f"window names drifted from registry: {missing}"
    out = {k: base[k] for k in _R15_WINDOW}
    out.update({k: v for k, v in base.items() if k not in out})
    return out


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Insertion order here is historical grouping only; the driver
    # window is imposed by _R14_WINDOW in _queries().
    return {
        # --- changed in r6: re-prove first ---
        "doc_repetition": _q_doc_repetition,
        "minute_spread": _q_minute_spread,
        "exchange_spread": _q_exchange_spread,
        # --- new in r6: recurrence scan + channel + flow + asof ---
        "ema_20": _q_ema_20,
        "macd_12_26_9": _q_macd,
        "donchian_20": _q_donchian_20,
        "event_transitions": _q_event_transitions,
        "event_paths_topk": _q_event_paths_topk,
        "doc_ngram_topk": _q_doc_ngram_topk,
        "asof_price_tolerance": _q_asof_price_tolerance,
        # --- keep the register-fold evidence fresh (VERDICT r5 #4) ---
        "rolling_active_hll": _q_rolling_active_hll,
        # --- r3-vintage driver rows, unchanged code: re-green in r6 ---
        "doc_dedup_keep_best": _q_doc_dedup_keep_best,
        "doc_dup_clusters": _q_doc_dup_clusters,
        "doc_dup_clusters_star": _q_doc_dup_clusters_star,
        "doc_fingerprint": XT.fingerprint,
        "doc_importance_sample": _q_doc_importance_sample,
        "doc_lang_id": XT.lang_id,
        "doc_ngram_jaccard": _q_doc_ngram_jaccard,
        "doc_pack_sequences": _q_doc_pack_sequences,
        "doc_pii_scrub": _q_doc_pii_scrub,
        "doc_quality": XT.quality_score,
        "doc_reservoir": _q_doc_reservoir,
        "doc_sample_stratified": _q_doc_sample_stratified,
        "doc_simhash": _q_doc_simhash,
        "doc_simhash_pairs": _q_doc_simhash_pairs,
        "doc_token_stats": XT.token_stats,
        "doc_train_split": _q_doc_train_split,
        "doc_vocab_topk": _q_doc_vocab_topk,
        "earliest_per_symbol": _q_earliest_per_symbol,
        "emb_cosine_topk": XS.brute_force_topk,
        "emb_ivf_topk": XS.ivf_topk,
        "emb_neardup": XS.embedding_neardup_pairs,
        "emb_quantized_topk": XS.quantized_topk,
        "event_attribution": _q_event_attribution,
        "events_json": XH.events_json_extract,
        "multimodal_features": media_features,
        "multimodal_frames": media_frame_sample,
        "multimodal_headers": media_headers,
        "multimodal_samples": media_samples,
        "multimodal_png_pixels": media_png_pixels,
        "multimodal_gif_pixels": media_gif_pixels,
        "multimodal_jpeg_pixels": media_jpeg_pixels,
        "tpch_q1": XH.q1_pricing_summary,
        "tpch_q10": XH.q10_returned_items,
        "tpch_q12": XH.q12_late_shipments,
        "tpch_q14": XH.q14_promo_effect,
        "tpch_q18": XH.q18_large_orders,
        "tpch_q19": XH.q19_disjunctive_revenue,
        "tpch_q22": XH.q22_idle_customers,
        "tpch_q3": XH.q3_shipping_priority,
        "tpch_q4": XH.q4_priority_check,
        "tpch_q5": XH.q5_region_revenue,
        "tpch_q7": XH.q7_nation_volume,
        "tpch_q6": XH.q6_forecast_revenue,
        "tpch_q2": XH.q2_min_cost_supplier,
        # --- beyond the 50-query check window.  First two are r6-new
        # (local sweep green at sf0.01 + sf0.1; FIRST in line for the
        # r7 window, ahead of the 45 r4-vintage entries below) ---
        "returns_autocorr": _q_returns_autocorr,
        "conversion_latency": _q_conversion_latency,
        # --- r5-green, unchanged ---
        "doc_minhash_lsh": _q_doc_minhash_lsh,
        "emb_ivfpq_indexed_topk": _q_emb_ivfpq_indexed_topk,
        "emb_ivf_appended_topk": _q_emb_ivf_appended_topk,
        "doc_duplicate_spans": _q_doc_duplicate_spans,
        "doc_strip_spans": _q_doc_strip_spans,
        "doc_dedup_passages": _q_doc_dedup_passages,
        "doc_incremental_spans": _q_doc_incremental_spans,
        "doc_bm25_topk": _q_doc_bm25_topk,
        "emb_pq_topk": _q_emb_pq_topk,
        "emb_ivf_pq_topk": _q_emb_ivf_pq_topk,
        "emb_ivfadc_topk": _q_emb_ivfadc_topk,
        "event_anomaly": _q_event_anomaly,
        "events_hll_daily": _q_events_hll_daily,
        "emb_ivf_trained_topk": XS.ivf_trained_topk,
        "tpch_q9": XH.q9_product_profit,
        "tpch_q11": XH.q11_important_stock,
        "tpch_q16": XH.q16_supplier_count,
        "tpch_q20": XH.q20_excess_suppliers,
        "event_sessions_native": _q_event_sessions_native,
        "doc_heavy_hitters": _q_doc_heavy_hitters,
        "event_funnel": _q_event_funnel,
        "event_retention": _q_event_retention,
        "twap_daily": _q_twap_daily,
        "emb_semdedup": XS.semdedup,
        "candle_patterns": _q_candle_patterns,
        "doc_incremental_neardup": _q_doc_incremental_neardup,
        "rsi_14": _q_rsi_14,
        "stochastic_14": _q_stochastic_14,
        "obv": _q_obv,
        "returns_corr": _q_returns_corr,
        "rolling_active_users": _q_rolling_active_users,
        "doc_chunk_dupes": _q_doc_chunk_dupes,
        "gap_filled_interp": _q_gap_filled_interp,
        "doc_tfidf_terms": _q_doc_tfidf_terms,
        "ann_recall": _q_ann_recall,
        "doc_unigram_logprob": _q_doc_unigram_logprob,
        "symbol_beta": _q_symbol_beta,
        "doc_source_mix": _q_doc_source_mix,
        "doc_temperature_mix": _q_doc_temperature_mix,
        "volume_profile": _q_volume_profile,
        "intraday_profile": _q_intraday_profile,
        "doc_neardup_quality": _q_doc_neardup_quality,
        "doc_neardup_curve": _q_doc_neardup_curve,
        "event_funnel_rates": _q_event_funnel_rates,
        "rolling_beta_60": _q_rolling_beta_60,
        "rolling_sharpe_60": _q_rolling_sharpe_60,
        "drawdown_curve": _q_drawdown_curve,
        "rolling_corr_60": _q_rolling_corr_60,
        "doc_source_quality": _q_doc_source_quality,
        "cascade_15m": _q_cascade_15m,
        "corpus_curated": _q_corpus_curated,
        "doc_decontaminate": _q_doc_decontaminate,
        "doc_dedup_exact": _q_doc_dedup_exact,
        # --- r4-green, unchanged ---
        "listing_stable": _q_listing_stable,
        "price_quantile_sketch": _q_price_quantile_sketch,
        "pivot_volume": _q_pivot_volume,
        "volume_rollup_sets": _q_volume_rollup_sets,
        "volume_cube_sets": _q_volume_cube_sets,
        "max_drawdown": _q_max_drawdown,
        "top_volume_per_symbol": _q_top_volume_per_symbol,
        "bollinger_20": _q_bollinger_20,
        "daily_volatility": _q_daily_volatility,
        "atr_14": _q_atr_14,
        "watchdog_cycle": _q_watchdog_cycle,
        "asof_price_forward": _q_asof_price_forward,
        "volume_bars": _q_volume_bars,
        "event_sessions": _q_event_sessions,
        "asof_price": _q_asof_price,
        "repair_window": _q_repair_window,
        "minmax_window": _q_minmax_window,
        "count_distinct_window": _q_count_distinct_window,
        "latest_per_symbol": _q_latest_per_symbol,
        "distinct_pairs": _q_distinct_pairs,
        "recent_topn": _q_recent_topn,
        "symbol_filter": _q_symbol_filter,
        "readme_window": _q_readme_window,
        "freshness": _q_freshness,
        "listing_diff": _q_listing_diff,
        "gap_filled": _q_gap_filled,
        "gap_filled_ffill": _q_gap_filled_ffill,
        "sma_20": _q_sma_20,
        "vwap_daily": _q_vwap_daily,
        "price_percentiles": _q_price_percentiles,
        "price_bands": _q_price_bands,
        "gap_missing_count": _q_gap_missing_count,
        "gap_islands": _q_gap_islands,
        "backfill_plan": _q_backfill_plan,
        "validate_quarantine": _q_validate_quarantine,
        "doc_chunks": _q_doc_chunks,
        "doc_token_cms": _q_doc_token_cms,
        "tpch_q17": XH.q17_small_quantity_revenue,
        "tpch_q21": XH.q21_waiting_suppliers,
        "tpch_q8": XH.q8_market_share,
        "tpch_q13": XH.q13_customer_distribution,
        "tpch_q15": XH.q15_top_supplier,
        "candles_1m": _q_candles_1m,
        "dedup_latest": _q_dedup_latest,
        "rollup_5m": _q_rollup_5m,
        # --- new in r9 (beyond-window; judge/local sweeps cover) ---
        "doc_grouped_split": _q_doc_grouped_split,
        "emb_ivfadc_rerank_topk": XQ.ivfadc_rerank_topk,
        "emb_ivfpq_appended_topk": _q_emb_ivfpq_appended_topk,
        "ann_recall_curve": _q_ann_recall_curve,
        "doc_lm_buckets": _q_doc_lm_buckets,
        "doc_bigram_logprob": _q_doc_bigram_logprob,
        "doc_lm_score_backoff": _q_doc_lm_score_backoff,
        "doc_lm_score_tri": _q_doc_lm_score_tri,
        "doc_source_nb": _q_doc_source_nb,
        "doc_source_nb_sparse": _q_doc_source_nb_sparse,
        "doc_source_nb_indexed": _q_doc_source_nb_indexed,
        "doc_source_nb_appended": _q_doc_source_nb_appended,
        "doc_bm25_indexed_topk": _q_doc_bm25_indexed_topk,
        "doc_bm25_appended_topk": _q_doc_bm25_appended_topk,
        "emb_hybrid_eval": _q_emb_hybrid_eval,
        "emb_hybrid_rrf": _q_emb_hybrid_rrf,
        # --- new in r11 ---
        "emb_hybrid_indexed_rrf": _q_emb_hybrid_indexed_rrf,
        "doc_lm_score_hash4": _q_doc_lm_score_hash4,
        "doc_lm_score_hash5": _q_doc_lm_score_hash5,
        "doc_hash4_collisions": _q_doc_hash4_collisions,
        "doc_hash5_collisions": _q_doc_hash5_collisions,
        "doc_source_nb_confusion": _q_doc_source_nb_confusion,
        "doc_resampled_mix": _q_doc_resampled_mix,
        # --- new in r11, second wave: curation compositions ---
        "doc_dedup_normalized": _q_doc_dedup_normalized,
        "doc_source_cap": _q_doc_source_cap,
        "doc_split_leakage": _q_doc_split_leakage,
        "zorder_range_scan": _q_zorder_range_scan,
        "bloom_semijoin_scan": _q_bloom_semijoin_scan,
        "doc_quality_lr": _q_doc_quality_lr,
        "doc_quality_lr_scores": _q_doc_quality_lr_scores,
        "doc_quality_lr_calibration": _q_doc_quality_lr_calibration,
        "doc_quality_lr_eval": _q_doc_quality_lr_eval,
        "doc_lr_filtered": _q_doc_lr_filtered,
        "doc_dup_flow": _q_doc_dup_flow,
        "event_ab_chisq": _q_event_ab_chisq,
    }


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB twins
# ---------------------------------------------------------------------------

_ROLLUP_AGG = """
  arg_min(open, start)                    AS open,
  min(start)                              AS open_time,
  max(high)                               AS high,
  min(low)                                AS low,
  arg_max(close, start)                   AS close,
  max(start)                              AS close_time,
  round(sum(volume), 6)                   AS volume,
  CAST(sum(trades) AS BIGINT)             AS trades
"""

_VALID_COND = """
      isfinite(open) AND isfinite(high) AND isfinite(low)
  AND isfinite(close) AND isfinite(volume)
  AND low <= least(open, close)
  AND high >= greatest(open, close)
  AND low <= high
  AND close_unixtime > 0
  AND exchange <> '' AND symbol <> '' AND "interval" <> ''
"""


# Shared DuckDB fragments for the extension oracles -----------------------

_REVENUE = (
    "CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)"
    " AS DECIMAL(18,4))) AS DOUBLE)"
)

# tokens/shingles twins of ext.text.with_tokens / shingles_col
_TOKS_CTE = r"""
toks AS (
  SELECT *, string_split_regex(lower(text), '\s+') AS tokens FROM {src}
)
"""


def _split_case_sql(key: str) -> str:
    """ext/pipeline._split_expr's DuckDB twin over an arbitrary key
    expression — the ONE hash-range train/val/test rule, SQL side
    (doc ids give train_split's assignment, sources
    grouped_train_split's)."""
    p = f"substr(md5('split-v1|' || CAST({key} AS VARCHAR)), 1, 2)"
    return (
        f"CASE WHEN {p} < '0a' THEN 'test'"
        f" WHEN {p} < '14' THEN 'val' ELSE 'train' END"
    )


def _lr_sql(iters: int = 20, lr: float = 4.0, tau: float = 0.75) -> dict:
    """DuckDB twin of ext/lr.py's GD trajectory: the same feature
    CTE, then one CTE per gradient step chaining the previous step's
    weights.  Every expression mirrors the Spark op ORDER exactly
    (left-assoc dot product, least-then-greatest hard sigmoid,
    12-dp-rounded DECIMAL(20,12) gradient sums, round-12 update) —
    that is what makes an iterative TRAINING loop hash-checkable.
    Returns the shared CTE prefix plus the final-scoring sigma
    expression (over ``feats CROSS JOIN it{iters} p``)."""
    quality = """round(0.5 * (len(list_distinct(tokens)) / len(tokens))
            + 0.3 * (1.0 - (len(list_filter(tokens,
                              t -> t IN ('the','a'))) / len(tokens)))
            + 0.2 * (CASE WHEN len(tokens) >= 10 AND len(tokens) <= 10000
                     THEN 1.0 ELSE 0.0 END), 6)"""
    ctes = (
        "WITH "
        + _TOKS_CTE.format(src="documents")
        + f"""
        , feats AS (
          SELECT doc_id,
            1.0 AS x0,
            len(tokens) / 1000.0 AS x1,
            round(len(list_distinct(tokens)) / len(tokens), 6) AS x2,
            round(len(list_filter(tokens, t -> t IN ('the','a')))
              / len(tokens), 6) AS x3,
            CASE WHEN {quality} >= {tau} THEN 1.0 ELSE 0.0 END AS y
          FROM toks
        ), it0 AS (
          SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3
        )"""
    )
    sig = (
        "greatest(least(0.25 * ((((p.w0 * x0) + (p.w1 * x1))"
        " + (p.w2 * x2)) + (p.w3 * x3)) + 0.5, 1.0), 0.0)"
    )
    for t in range(1, iters + 1):
        ws = ",\n            ".join(
            f"round(p.w{j} - {lr} * (CAST(sum(CAST(round(({sig} - y)"
            f" * x{j}, 12) AS DECIMAL(20,12))) AS DOUBLE)"
            f" / count(*)), 12) AS w{j}"
            for j in range(4)
        )
        ctes += f"""
        , it{t} AS (
          SELECT
            {ws}
          FROM feats CROSS JOIN it{t - 1} p
          GROUP BY p.w0, p.w1, p.w2, p.w3
        )"""
    return {"ctes": ctes, "sig": sig, "last": f"it{iters}"}


def _md5_bucket_sql(s: str, n_buckets: int) -> str:
    """ext/text._hash_bucket's DuckDB twin: fold the first 8 md5 hex
    digits to an integer (every 16^k term and the sum are exact in a
    double up to 2^32 — the importance_sample draw idiom) and mod the
    bucket count.  Matches Spark's conv(substr(md5(s),1,8),16,10)
    bit-for-bit."""
    return (
        "(CAST(list_sum(list_transform(range(1, 9),"
        " i -> (strpos('0123456789abcdef',"
        f" substr(md5({s}), CAST(i AS INTEGER), 1)) - 1)"
        f" * (16.0 ** (8 - i)))) AS BIGINT) % {n_buckets})"
    )


def _hashn_gram_cte(n: int) -> str:
    """The shared tokenize -> (n−1)-lag -> n-gram/context front of
    the hashed order-n LM twins (ext/text._doc_ngram_lagged's DuckDB
    twin): produces CTE ``ngrams`` with (doc_id, gram, ctx)."""
    lags = "".join(
        f"""
                 lag(term, {n - j}) OVER (
                   PARTITION BY doc_id ORDER BY pos) AS w{j},"""
        for j in range(1, n)
    )
    gram = " || ' ' || ".join(f"w{j}" for j in range(1, n + 1))
    ctx = " || ' ' || ".join(f"w{j}" for j in range(1, n))
    return f"""
        , terms AS (
          SELECT doc_id, unnest(tokens) AS term,
                 generate_subscripts(tokens, 1) AS pos
          FROM toks
        ), lagged AS (
          SELECT doc_id,{lags}
                 term AS w{n}
          FROM terms
        ), ngrams AS (
          SELECT doc_id,
                 {gram} AS gram,
                 {ctx} AS ctx
          FROM lagged WHERE w1 IS NOT NULL
        )"""


def _hashn_logprob_sql(n: int, n_buckets: int) -> str:
    """Full DuckDB twin of ext/text.hashed_ngram_logprob at order n."""
    return (
        "WITH "
        + _TOKS_CTE.format(src="documents")
        + _hashn_gram_cte(n)
        + f"""
        , quad AS (
          SELECT doc_id,
                 {_md5_bucket_sql('gram', n_buckets)} AS bn,
                 {_md5_bucket_sql('ctx', n_buckets)} AS bc
          FROM ngrams
        ), cn AS (
          SELECT bn, CAST(count(*) AS BIGINT) AS n_gram
          FROM quad GROUP BY 1
        ), cc AS (
          SELECT bc, CAST(count(*) AS BIGINT) AS n_ctx
          FROM quad GROUP BY 1
        ), tf AS (
          SELECT doc_id, bn, bc, CAST(count(*) AS BIGINT) AS tf
          FROM quad GROUP BY 1, 2, 3
        ), scored AS (
          SELECT t.doc_id, t.tf,
            t.tf * CAST(round(ln(CAST(cn.n_gram AS DOUBLE) / cc.n_ctx), 12)
                        AS DECIMAL(20,12)) AS wlp
          FROM tf t JOIN cn USING (bn) JOIN cc USING (bc)
        ), lp AS (
          SELECT doc_id,
                 CAST(sum(tf) AS BIGINT) AS n_ngrams,
                 CAST(sum(wlp) AS DOUBLE) / sum(tf) AS avg_logprob
          FROM scored GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(l.n_ngrams, 0) AS BIGINT) AS n_ngrams,
               l.avg_logprob
        FROM documents d LEFT JOIN lp l USING (doc_id)
        ORDER BY 1
        """
    )


def _hashn_collisions_sql(n: int, n_buckets: int) -> str:
    """DuckDB twin of ext/text.hashed_ngram_collisions at order n."""
    return (
        "WITH "
        + _TOKS_CTE.format(src="documents")
        + _hashn_gram_cte(n)
        + f"""
        SELECT CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct_grams,
               CAST(count(DISTINCT {_md5_bucket_sql('gram', n_buckets)})
                    AS BIGINT) AS n_buckets_used,
               CAST({n_buckets} AS BIGINT) AS n_bucket_capacity,
               round(1.0
                 - count(DISTINCT {_md5_bucket_sql('gram', n_buckets)})
                   * 1.0 / count(DISTINCT gram), 6) AS collision_rate
        FROM ngrams
        """
    )

# duplicate-passage span chain (doc_duplicate_spans /
# doc_strip_spans twins of ext/dedup.py::duplicate_spans, k=5):
# positioned 5-gram windows -> grams occurring >=2x corpus-wide ->
# per-doc merge of overlapping/adjacent hits into maximal spans
_DUPSPAN_CTES_T = """
, wins0 AS (
  SELECT doc_id, unnest(CASE WHEN len(tokens) >= 5 THEN
     list_transform(range(1, len(tokens) - 3),
       i -> {'start': CAST(i AS BIGINT),
             'gram': array_to_string(
               list_slice(tokens, i, i + 4), ' ')})
     ELSE CAST([] AS STRUCT(start BIGINT, gram VARCHAR)[])
     END) AS w
  FROM toks
), wins AS (
  SELECT doc_id, w.start AS start, w.gram AS gram FROM wins0
), dup AS (
  SELECT gram FROM wins GROUP BY gram HAVING count(*) >= 2
), hits_all AS (
  SELECT w.doc_id, w.start, w.gram,
         row_number() OVER (PARTITION BY w.gram
                            ORDER BY w.doc_id, w.start) AS rn
  FROM wins w JOIN dup USING (gram)
), hits AS (
  SELECT doc_id, start FROM hits_all{keep_first_pred}
), marked AS (
  SELECT doc_id, start,
    CASE WHEN max(start) OVER (PARTITION BY doc_id
         ORDER BY start ROWS BETWEEN UNBOUNDED PRECEDING
         AND 1 PRECEDING) + 5 >= start
         THEN 0 ELSE 1 END AS ni
  FROM hits
), islands AS (
  SELECT doc_id, start,
    sum(ni) OVER (PARTITION BY doc_id ORDER BY start
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS island
  FROM marked
), spans AS (
  SELECT doc_id,
         CAST(min(start) AS BIGINT) AS span_start,
         CAST(max(start) + 4 AS BIGINT) AS span_end,
         CAST(max(start) + 4 - min(start) + 1 AS BIGINT)
           AS span_tokens,
         CAST(count(*) AS BIGINT) AS n_windows
  FROM islands GROUP BY doc_id, island
)
"""

# all occurrences (detect/strip) vs keep-first (canonical occurrence
# — lowest doc_id then start per gram — survives the strip)
# str.replace, not .format — the template contains DuckDB struct
# literals whose braces .format would try to interpolate
_DUPSPAN_CTES = _DUPSPAN_CTES_T.replace("{keep_first_pred}", "")
_DUPSPAN_KF_CTES = _DUPSPAN_CTES_T.replace(
    "{keep_first_pred}", " WHERE rn > 1"
)

# strip tail shared by doc_strip_spans / doc_dedup_passages: per-doc
# span lists left-join docs; filter-with-index over exists-over-spans
_STRIP_SQL = """
, sp AS (
  SELECT doc_id,
         list({'s': span_start, 'e': span_end}) AS doc_spans
  FROM spans GROUP BY doc_id
), cleaned AS (
  SELECT t.doc_id, t.tokens,
    list_filter(range(1, len(t.tokens) + 1),
      i -> len(list_filter(
             COALESCE(s.doc_spans,
                      CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
             x -> i >= x.s AND i <= x.e)) = 0) AS keep
  FROM toks t LEFT JOIN sp s USING (doc_id)
)
SELECT doc_id,
       COALESCE(array_to_string(
         list_transform(keep, i -> tokens[i]), ' '), '')
         AS clean_text,
       CAST(len(tokens) - len(keep) AS BIGINT)
         AS n_tokens_removed
FROM cleaned ORDER BY doc_id
"""

_SHINGLES_CTE = """
sh AS (
  SELECT *, CASE WHEN len(tokens) >= 3
    THEN list_distinct(list_transform(range(1, len(tokens) - 1),
         i -> array_to_string(list_slice(tokens, i, i + 2), ' ')))
    ELSE CAST([] AS VARCHAR[]) END AS shingles
  FROM toks
)
"""

_MINHASH_COLS = ",\n".join(
    f"  list_min(list_transform(shingles,"
    f" s -> substr(md5('{j // 4}|' || s), {(j % 4) * 8 + 1}, 8))) AS mh{j}"
    for j in range(XD.NUM_SEEDS)
)

_BAND_SELECTS = "\n          UNION ALL ".join(
    f"SELECT doc_id, shingles, {b} AS band_id, "
    f"md5(mh{b * 3} || mh{b * 3 + 1} || mh{b * 3 + 2}) AS band_key FROM mh"
    for b in range(XD.NUM_BANDS)
)

# Shared LSH candidate/verify CTE chain (over a `docs` CTE) — used by
# doc_minhash_lsh and the dedup-cluster oracles.
_LSH_CTES = (
    ", "
    + _TOKS_CTE.format(src="docs")
    + ", "
    + _SHINGLES_CTE
    + f"""
        , mh AS (
          SELECT doc_id, shingles,
{_MINHASH_COLS}
          FROM sh
        ), bands AS (
          {_BAND_SELECTS}
        ), capped AS (
          -- band-bucket size cap, identical to ext/dedup.py
          -- minhash_lsh_pairs(max_bucket=1000)
          SELECT * FROM (
            SELECT *, count(*) OVER (PARTITION BY band_id, band_key)
                   AS n_bucket
            FROM bands
          ) WHERE n_bucket <= 1000
        ), cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM capped a JOIN capped b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
        ), verified AS (
          SELECT c.doc_a, c.doc_b,
                 round(len(list_intersect(sa.shingles, sb.shingles))
                   / len(list_distinct(list_concat(sa.shingles, sb.shingles))),
                   6) AS jaccard
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b
        )
"""
)

# Connected components over the verified LSH pairs: min-reachable-id
# via a recursive CTE — the fixpoint ext/cluster.py's label
# propagation converges to.
_CLUSTER_CTES = (
    XD.DOCS_NEARDUP_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + _LSH_CTES
    + """
        , pairs AS (
          SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5
        ), edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION
          SELECT doc_b AS a, doc_a AS b FROM pairs
        ), reach(doc_id, r) AS (
          SELECT a, a FROM (SELECT DISTINCT a FROM edges)
          UNION
          SELECT e.a, r.r FROM edges e JOIN reach r ON r.doc_id = e.b
        ), labels AS (
          SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
        ), clusters_all AS (
          SELECT d.doc_id,
                 coalesce(l.cluster_id, d.doc_id) AS cluster_id
          FROM docs d LEFT JOIN labels l USING (doc_id)
        )
"""
)

_SIMHASH_EXPR = " + ".join(
    "(CASE WHEN list_sum(list_transform(tokens, t -> "
    f"strpos('0123456789abcdef', substr(md5(t), {k + 1}, 1)) - 8.5)) > 0 "
    f"THEN {2 ** k} ELSE 0 END)"
    for k in range(16)
)

# embeddings as double vectors with norms (twin of ext.similarity.vectors)
_VEC_CTE = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), n AS (
  SELECT vec_id, label, emb,
         sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
  FROM e
)
"""

_COS = (
    "round(list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    " / ({na} * {nb}), 6)"
)

# squared-L2, rounded to 6 — the coarse assign/probe metric of the
# IVF-PQ family (ext/pq.assign_buckets_l2), matching the PQ sub-distances
_L2D = (
    "round(list_sum(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
)


_IVF_TRAINED_RANKED = f"""
        , tc AS (
          SELECT cluster AS c_id, centroid AS c_emb,
                 sqrt(list_sum(list_transform(centroid, x -> x * x)))
                   AS c_nrm
          FROM c2
        ), asg AS (
          SELECT vec_id, emb, nrm, c_id,
                 {_COS.format(a="emb", b="c_emb", na="nrm", nb="c_nrm")} AS c_sim
          FROM n, tc
        ), bucketed AS (
          SELECT vec_id, emb, nrm, c_id AS bucket
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS r
                FROM asg)
          WHERE r = 1
        ), q AS (
          SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm,
                 bucket AS q_bucket
          FROM bucketed WHERE vec_id >= 100 AND vec_id < 103
        ), sims AS (
          SELECT q_id, b.bucket, vec_id,
                 {_COS.format(a="q_emb", b="emb", na="q_nrm", nb="nrm")} AS sim
          FROM bucketed b, q
          WHERE b.bucket = q.q_bucket AND b.vec_id <> q.q_id
        ), ranked AS (
          SELECT q_id, bucket, vec_id, sim,
                 CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, vec_id) AS BIGINT)
                   AS rank
          FROM sims
        )
"""


def _kmeans_ctes(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """Unrolled Lloyd's k-means as chained CTEs — the DuckDB twin of
    ext/kmeans.fit(round_to=6): init = first k vectors by vec_id,
    argmin on squared-L2 ROUNDED to 6 (ties to lowest cluster id),
    per-dim means rounded to 6.  Both engines rank and round
    identically, so the trained centroids are bit-equal."""
    parts = [
        f"""
        , c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cluster,
                 emb AS centroid
          FROM (SELECT vec_id, emb FROM n ORDER BY vec_id LIMIT {k})
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
        , a{i} AS (
          SELECT vec_id, emb, cluster FROM (
            SELECT v.vec_id, v.emb, c.cluster,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                     round(list_sum(list_transform(list_zip(v.emb, c.centroid),
                       p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) ASC,
                     c.cluster ASC) AS r
            FROM n v, c{i - 1} c
          ) WHERE r = 1
        ), c{i} AS (
          SELECT cluster, list(m ORDER BY pos) AS centroid FROM (
            SELECT cluster, di AS pos, round(avg(emb[di]), 6) AS m
            FROM a{i}, range(1, {dim + 1}) t(di)
            GROUP BY cluster, di
          ) GROUP BY cluster
        )"""
        )
    return "".join(parts)


def _pq_ctes(
    m: int = 4, k: int = 16, iters: int = 2, dim: int = 64, src: str = "n"
) -> str:
    """Unrolled per-subspace Lloyd's + PQ encode as chained CTEs — the
    DuckDB twin of ext/pq.train_codebooks + pq_encode: each of the m
    sub-slices runs _kmeans_ctes-style iterations (first-k init by
    vec_id, argmin on squared-L2 rounded to 6 with lowest-cluster
    tiebreak, per-dim means rounded to 6), then every vector slice is
    assigned its nearest codebook centroid.  Produces CTEs ``books``
    (subspace, cluster, centroid) and ``enc`` (vec_id, subspace,
    code).  ``src`` names the (vec_id, emb) CTE to train/encode on —
    ``n`` for raw vectors, a residual CTE for the IVFADC twin."""
    sub_dim = dim // m
    parts = []
    for j in range(m):
        lo, hi = j * sub_dim + 1, (j + 1) * sub_dim
        parts.append(
            f"""
        , sv{j} AS (
          SELECT vec_id, emb[{lo}:{hi}] AS emb FROM {src}
        ), s{j}c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cluster,
                 emb AS centroid
          FROM (SELECT vec_id, emb FROM sv{j} ORDER BY vec_id LIMIT {k})
        )"""
        )
        for i in range(1, iters + 1):
            parts.append(
                f"""
        , s{j}a{i} AS (
          SELECT vec_id, emb, cluster FROM (
            SELECT v.vec_id, v.emb, c.cluster,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                     round(list_sum(list_transform(list_zip(v.emb, c.centroid),
                       p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) ASC,
                     c.cluster ASC) AS r
            FROM sv{j} v, s{j}c{i - 1} c
          ) WHERE r = 1
        ), s{j}c{i} AS (
          SELECT cluster, list(mu ORDER BY pos) AS centroid FROM (
            SELECT cluster, di AS pos, round(avg(emb[di]), 6) AS mu
            FROM s{j}a{i}, range(1, {sub_dim + 1}) t(di)
            GROUP BY cluster, di
          ) GROUP BY cluster
        )"""
            )
    books_union = "\n          UNION ALL ".join(
        f"SELECT {j} AS subspace, cluster, centroid FROM s{j}c{iters}"
        for j in range(m)
    )
    sliced_union = "\n          UNION ALL ".join(
        f"SELECT vec_id, {j} AS subspace, emb AS sub FROM sv{j}"
        for j in range(m)
    )
    parts.append(
        f"""
        , books AS (
          {books_union}
        ), sliced AS (
          {sliced_union}
        ), enc AS (
          SELECT vec_id, subspace, cluster AS code FROM (
            SELECT s.vec_id, s.subspace, b.cluster,
                   row_number() OVER (PARTITION BY s.vec_id, s.subspace
                     ORDER BY
                     round(list_sum(list_transform(list_zip(s.sub, b.centroid),
                       p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) ASC,
                     b.cluster ASC) AS r
            FROM sliced s JOIN books b ON s.subspace = b.subspace
          ) WHERE r = 1
        )"""
    )
    return "".join(parts)


def _ab_chisq_sql(window_hours: int = 4, salt: str = "ab-v1") -> str:
    """DuckDB twin for ``ab_conversion_chisq``, generated from the
    SAME parameters as the Spark operator (ADVICE r11: a hardcoded
    INTERVAL 4 HOUR / 'ab-v1' twin would silently desynchronize if a
    registry caller ever changed either default) — the _lr_sql
    pattern.  Mirrors the double arithmetic's exact expression
    order."""
    return f"""
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'
        ), per_click AS (
          SELECT c.event_id,
                 max(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END)
                   AS conv
          FROM clicks c
          LEFT JOIN events p
            ON p.event_type = 'purchase'
           AND p.user_id = c.user_id
           AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL {window_hours} HOUR
          GROUP BY 1
        ), tagged AS (
          SELECT CASE WHEN substr(md5('{salt}|'
                   || CAST(event_id AS VARCHAR)), 1, 2) < '80'
                 THEN 'A' ELSE 'B' END AS v, conv
          FROM per_click
        ), cont AS (
          SELECT
            CAST(sum(CASE WHEN v = 'A' THEN conv END) AS BIGINT)
              AS conv_a,
            CAST(sum(CASE WHEN v = 'A' THEN 1 - conv END) AS BIGINT)
              AS miss_a,
            CAST(sum(CASE WHEN v = 'B' THEN conv END) AS BIGINT)
              AS conv_b,
            CAST(sum(CASE WHEN v = 'B' THEN 1 - conv END) AS BIGINT)
              AS miss_b
          FROM tagged
        )
        SELECT conv_a + miss_a AS n_a, conv_a,
               conv_b + miss_b AS n_b, conv_b,
               round(CAST(conv_a AS DOUBLE)
                 / (CAST(conv_a AS DOUBLE) + CAST(miss_a AS DOUBLE)),
                 6) AS rate_a,
               round(CAST(conv_b AS DOUBLE)
                 / (CAST(conv_b AS DOUBLE) + CAST(miss_b AS DOUBLE)),
                 6) AS rate_b,
               CASE WHEN ((CAST(conv_a AS DOUBLE)
                           + CAST(miss_a AS DOUBLE))
                          * (CAST(conv_b AS DOUBLE)
                             + CAST(miss_b AS DOUBLE)))
                        * ((CAST(conv_a AS DOUBLE)
                            + CAST(conv_b AS DOUBLE))
                           * (CAST(miss_a AS DOUBLE)
                              + CAST(miss_b AS DOUBLE))) > 0
                 THEN round(
                   ((((CAST(conv_a AS DOUBLE) + CAST(miss_a AS DOUBLE))
                      + CAST(conv_b AS DOUBLE)) + CAST(miss_b AS DOUBLE))
                    * ((CAST(conv_a AS DOUBLE) * CAST(miss_b AS DOUBLE)
                        - CAST(miss_a AS DOUBLE) * CAST(conv_b AS DOUBLE))
                       * (CAST(conv_a AS DOUBLE) * CAST(miss_b AS DOUBLE)
                          - CAST(miss_a AS DOUBLE)
                            * CAST(conv_b AS DOUBLE))))
                   / (((CAST(conv_a AS DOUBLE) + CAST(miss_a AS DOUBLE))
                       * (CAST(conv_b AS DOUBLE)
                          + CAST(miss_b AS DOUBLE)))
                      * ((CAST(conv_a AS DOUBLE)
                          + CAST(conv_b AS DOUBLE))
                         * (CAST(miss_a AS DOUBLE)
                            + CAST(miss_b AS DOUBLE)))), 6)
               END AS chi2
        FROM cont
        """


def oracle_sql() -> dict[str, str]:
    # the 20-CTE LR training trajectory is built ONCE per call, not
    # once per f-string reference (review finding)
    lrq = _lr_sql()
    sql = {
        # --- general relational surface ---
        "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
          sum(l_quantity) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_base_price,
          CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)
            AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
            * (1.0 + l_tax), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
          CAST(count(*) AS BIGINT) AS count_order,
          round(avg(l_quantity), 6) AS avg_qty,
          round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
            / count(*), 6) AS avg_disc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "tpch_q3": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {_REVENUE} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "tpch_q5": f"""
        SELECT n_name, {_REVENUE} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1 ORDER BY revenue DESC, n_name
        """,
        "tpch_q6": """
        SELECT CAST(sum(CAST(round(l_extendedprice * l_discount, 4)
                 AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.03 AND l_discount <= 0.09
          AND l_quantity < 24
        """,
        "tpch_q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {_REVENUE} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "tpch_q4": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY 1 ORDER BY 1
        """,
        "tpch_q2": """
        SELECT n_name, s_suppkey, s_name,
               round(s_acctbal, 2) AS s_acctbal
        FROM supplier s
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY n_name, s_suppkey
        """,
        "tpch_q7": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                 AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "tpch_q12": """
        SELECT l_linestatus,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY 1 ORDER BY 1
        """,
        "tpch_q14": """
        WITH s AS (
          SELECT
            CAST(sum(CASE WHEN p_type = 'PROMO'
              THEN CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                   AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
            CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                 AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00')
        SELECT promo_revenue, total_revenue,
               round(100.0 * promo_revenue / total_revenue, 6)
                 AS promo_share_pct
        FROM s
        """,
        "tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               sum_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
              FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY sum_qty DESC, o_orderkey LIMIT 100
        """,
        "tpch_q19": """
        SELECT CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                 AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
        """,
        "tpch_q22": """
        WITH seg AS (
          SELECT * FROM customer
          WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')),
        avg_bal AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS avg_bal
          FROM seg WHERE c_acctbal > 0.0)
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS totacctbal
        FROM seg, avg_bal
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = seg.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY 1 ORDER BY 1
        """,
        "events_json": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(k) AS BIGINT) AS sum_k,
               round(avg(k), 6) AS avg_k,
               min(k) AS min_k, max(k) AS max_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY 1 ORDER BY 1
        """,
        # --- text analysis ---
        "doc_token_stats": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars_measured,
          CAST(len(tokens) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(tokens)) AS BIGINT) AS n_distinct_tokens,
          CAST(list_sum(list_transform(tokens,
            t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT)
            AS n_subword_units,
          round(CAST(list_sum(list_transform(tokens, t -> length(t)))
            AS DOUBLE) / len(tokens), 6) AS avg_token_len
        FROM toks
        """,
        "doc_lang_id": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , scored AS (
          SELECT doc_id, lang AS labeled_lang,
            CAST(len(list_filter(tokens,
              t -> t IN ('the','a','fast','small'))) AS BIGINT) AS score_en,
            CAST(len(list_filter(tokens,
              t -> t IN ('data','table','row','value'))) AS BIGINT) AS score_es,
            CAST(len(list_filter(tokens,
              t -> t IN ('stream','batch','window','group'))) AS BIGINT) AS score_de
          FROM toks
        )
        SELECT *, CASE
          WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
          WHEN score_es >= score_de THEN 'es'
          ELSE 'de' END AS predicted_lang
        FROM scored
        """,
        "doc_quality": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        SELECT doc_id,
          CAST(len(tokens) AS BIGINT) AS n_tokens,
          round(len(list_distinct(tokens)) / len(tokens), 6) AS distinct_ratio,
          round(len(list_filter(tokens, t -> t IN ('the','a')))
            / len(tokens), 6) AS stopword_ratio,
          (len(tokens) >= 10 AND len(tokens) <= 10000) AS length_ok,
          round(0.5 * (len(list_distinct(tokens)) / len(tokens))
            + 0.3 * (1.0 - (len(list_filter(tokens, t -> t IN ('the','a')))
                            / len(tokens)))
            + 0.2 * (CASE WHEN len(tokens) >= 10 AND len(tokens) <= 10000
                     THEN 1.0 ELSE 0.0 END), 6) AS quality_score
        FROM toks
        """,
        "doc_source_quality": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , perdoc AS (
          SELECT doc_id, source,
            CAST(len(tokens) AS BIGINT) AS n_tokens,
            (len(tokens) >= 10 AND len(tokens) <= 10000) AS length_ok,
            CAST(round(
              0.5 * (len(list_distinct(tokens)) / len(tokens))
              + 0.3 * (1.0 - (len(list_filter(tokens,
                                t -> t IN ('the','a'))) / len(tokens)))
              + 0.2 * (CASE WHEN len(tokens) >= 10
                             AND len(tokens) <= 10000
                       THEN 1.0 ELSE 0.0 END), 6)
              AS DECIMAL(18,6)) AS score_dec
          FROM toks
        ), agg AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 sum(score_dec) AS sum_score,
                 CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                 CAST(sum(CASE WHEN length_ok THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_length_ok
          FROM perdoc GROUP BY 1
        )
        SELECT source, n_docs,
               CAST(sum_score AS DOUBLE) / n_docs AS mean_quality,
               CAST(sum_tokens AS DOUBLE) / n_docs AS mean_tokens,
               CAST(n_length_ok AS DOUBLE) / n_docs AS share_length_ok
        FROM agg ORDER BY source
        """,
        "doc_fingerprint": "WITH "
        + _TOKS_CTE.format(src="documents")
        + ", "
        + _SHINGLES_CTE
        + """
        SELECT doc_id,
          md5(array_to_string(tokens, ' ')) AS fp_md5,
          list_min(list_transform(shingles, s -> md5(s))) AS fp_min_shingle
        FROM sh
        """,
        # --- dedup ladder ---
        "doc_dedup_exact": XD.DOCS_NEARDUP_CTE
        + ", "
        + _TOKS_CTE.format(src="docs")
        + """
        SELECT md5(array_to_string(tokens, ' ')) AS digest,
               min(doc_id) AS canonical_doc_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM toks
        GROUP BY 1 HAVING count(*) > 1
        """,
        # fuzzy-exact rung: DuckDB regexp_replace needs the 'g' flag
        # (Spark's is global by default — the one-match trap)
        "doc_dedup_normalized": XD.DOCS_NORMDUP_CTE
        + r"""
        , n AS (
          SELECT doc_id,
                 md5(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                         ' ', 'g'))) AS digest,
                 md5(text) AS raw_digest
          FROM docs
        )
        SELECT digest, min(doc_id) AS canonical_doc_id,
               CAST(count(*) AS BIGINT) AS n_copies,
               CAST(count(DISTINCT raw_digest) AS BIGINT) AS n_variants
        FROM n GROUP BY 1 HAVING count(*) > 1
        """,
        "doc_source_cap": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , q AS (
          SELECT doc_id, source,
            round(0.5 * (len(list_distinct(tokens)) / len(tokens))
              + 0.3 * (1.0 - (len(list_filter(tokens,
                                t -> t IN ('the','a'))) / len(tokens)))
              + 0.2 * (CASE WHEN len(tokens) >= 10
                             AND len(tokens) <= 10000
                       THEN 1.0 ELSE 0.0 END), 6) AS quality_score
          FROM toks
        ), ranked AS (
          SELECT doc_id, source, quality_score,
                 CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY quality_score DESC, doc_id
                 ) AS BIGINT) AS src_rank
          FROM q
        )
        SELECT doc_id, source, quality_score, src_rank
        FROM ranked WHERE src_rank <= 25
        ORDER BY source, src_rank
        """,
        # layout-independence contract: the twin queries the RAW
        # (unclustered) lineitem — z-order must change plans, never
        # results
        "zorder_range_scan": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2)))
                 AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice, 2)
                 AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_partkey BETWEEN 40 AND 159
          AND l_suppkey BETWEEN 2 AND 15
        GROUP BY 1 ORDER BY 1
        """,
        # GD-trained quality filter: the twin replays the identical
        # 20-step training trajectory (see _lr_sql)
        "doc_quality_lr": lrq["ctes"]
        + f"""
        SELECT f.feature, f.weight FROM (
          SELECT 'x0_intercept' AS feature, w0 AS weight
          FROM {lrq['last']}
          UNION ALL SELECT 'x1_kilo_tokens', w1 FROM {lrq['last']}
          UNION ALL SELECT 'x2_distinct_ratio', w2
          FROM {lrq['last']}
          UNION ALL SELECT 'x3_stopword_ratio', w3
          FROM {lrq['last']}
        ) f ORDER BY f.feature
        """,
        "doc_quality_lr_scores": lrq["ctes"]
        + f"""
        SELECT doc_id,
               round({lrq['sig']}, 6) AS lr_score,
               ({lrq['sig']} >= 0.5) AS pred_keep,
               (y >= 0.5) AS label_keep
        FROM feats CROSS JOIN {lrq['last']} p
        ORDER BY doc_id
        """,
        # reliability curve: decile bins on the 6-dp rounded score
        # (identical doubles in both engines -> identical bins),
        # decimal-summed mean predicted score vs integer keep rate
        "doc_quality_lr_calibration": lrq["ctes"]
        + f"""
        , scored AS (
          SELECT round({lrq['sig']}, 6) AS lr_score, (y >= 0.5) AS lk
          FROM feats CROSS JOIN {lrq['last']} p
        ), binned AS (
          SELECT least(CAST(floor(lr_score * 10) AS BIGINT), 9)
                   AS bin,
                 lr_score, lk
          FROM scored
        )
        SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
               round(CAST(sum(CAST(lr_score AS DECIMAL(18,6)))
                     AS DOUBLE) / count(*), 6) AS mean_score,
               round(sum(CASE WHEN lk THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS keep_rate
        FROM binned GROUP BY 1 ORDER BY 1
        """,
        "doc_quality_lr_eval": lrq["ctes"]
        + f"""
        , scored AS (
          SELECT ({lrq['sig']} >= 0.5) AS pk, (y >= 0.5) AS lk
          FROM feats CROSS JOIN {lrq['last']} p
        ), conf AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN pk AND lk THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
            CAST(sum(CASE WHEN pk AND NOT lk THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
            CAST(sum(CASE WHEN NOT pk AND lk THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn,
            CAST(sum(CASE WHEN NOT pk AND NOT lk THEN 1 ELSE 0 END)
                 AS BIGINT) AS tn
          FROM scored
        )
        SELECT n_docs, tp, fp, fn, tn,
               round((tp + tn) / CAST(n_docs AS DOUBLE), 6)
                 AS accuracy,
               CASE WHEN tp + fp > 0
                 THEN round(tp / CAST(tp + fp AS DOUBLE), 6)
               END AS precision,
               CASE WHEN tp + fn > 0
                 THEN round(tp / CAST(tp + fn AS DOUBLE), 6)
               END AS recall
        FROM conf
        """,
        # the learned filter composed into the sampler: lr CTEs + the
        # shared md5 coin (salt lr-imp-v1), per-source keep report
        "doc_lr_filtered": lrq["ctes"]
        + f"""
        , kept AS (
          SELECT f.doc_id,
                 round({lrq['sig']}, 6) AS lr_score,
                 list_sum(list_transform(range(1, 9),
                   i -> (strpos('0123456789abcdef',
                          substr(md5('lr-imp-v1|'
                                 || CAST(f.doc_id AS VARCHAR)),
                                 CAST(i AS INTEGER), 1)) - 1)
                        * (16.0 ** (8 - i)))) / 4294967296.0 AS u
          FROM feats f CROSS JOIN {lrq['last']} p
        ), agg AS (
          SELECT d.source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN k.u < least(greatest(k.lr_score,
                        0.0), 1.0) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
                 sum(CAST(k.lr_score AS DECIMAL(18,6))) AS s
          FROM kept k JOIN documents d USING (doc_id)
          GROUP BY 1
        )
        SELECT source, n_docs, n_kept,
               n_kept / CAST(n_docs AS DOUBLE) AS kept_rate,
               CAST(s AS DOUBLE) / n_docs AS mean_score
        FROM agg ORDER BY source
        """,
        # null-assignment A/B chi-square (twin generated by _ab_chisq_sql
        # from the operator defaults)
        "event_ab_chisq": _ab_chisq_sql(),
        # provenance flow matrix over the verified LSH pairs
        "doc_dup_flow": XD.DOCS_NEARDUP_CTE
        + _LSH_CTES
        + """
        , pairs AS (
          SELECT doc_a, doc_b, jaccard FROM verified
          WHERE jaccard >= 0.5
        ), sided AS (
          SELECT p.jaccard, sa.source AS sa, sb.source AS sb
          FROM pairs p
          JOIN docs sa ON sa.doc_id = p.doc_a
          JOIN docs sb ON sb.doc_id = p.doc_b
        ), agg AS (
          SELECT least(sa, sb) AS src_lo, greatest(sa, sb) AS src_hi,
                 CAST(count(*) AS BIGINT) AS n_pairs,
                 sum(CAST(jaccard AS DECIMAL(18,6))) AS s
          FROM sided GROUP BY 1, 2
        )
        SELECT src_lo, src_hi, n_pairs,
               CAST(s AS DOUBLE) / n_pairs AS mean_jaccard
        FROM agg ORDER BY src_lo, src_hi
        """,
        # the twin is the PLAIN join — the Bloom pre-filter must be
        # invisible in results (false positives re-verified, no
        # false negatives by construction)
        "bloom_semijoin_scan": """
        SELECT s_suppkey,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount),
                 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey % 5 = 3
        GROUP BY 1 ORDER BY 1
        """,
        "doc_split_leakage": XD.DOCS_NEARDUP_CTE
        + _LSH_CTES
        + f"""
        , pairs AS (
          SELECT doc_a, doc_b, jaccard FROM verified
          WHERE jaccard >= 0.5
        ), sided AS (
          SELECT p.doc_a, p.doc_b, p.jaccard,
                 {_split_case_sql('p.doc_a')} AS split_a,
                 {_split_case_sql('p.doc_b')} AS split_b,
                 ({_split_case_sql('sa.source')}
                  <> {_split_case_sql('sb.source')})
                   AS grouped_would_leak
          FROM pairs p
          JOIN docs sa ON sa.doc_id = p.doc_a
          JOIN docs sb ON sb.doc_id = p.doc_b
        )
        SELECT doc_a, doc_b, jaccard, split_a, split_b,
               grouped_would_leak
        FROM sided WHERE split_a <> split_b
        ORDER BY doc_a, doc_b
        """,
        "doc_temperature_mix": """
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM per
        ), powered AS (
          SELECT source, n_docs, n_total,
                 CAST(round(pow(CAST(n_docs AS DOUBLE) / n_total, 0.3),
                            12) AS DECIMAL(20,12)) AS p_alpha
          FROM per CROSS JOIN tot
        ), norm AS (
          SELECT sum(p_alpha) AS z FROM powered
        )
        SELECT source, n_docs,
               CAST(n_docs AS DOUBLE) / n_total AS share,
               CAST(p_alpha AS DOUBLE) / CAST(z AS DOUBLE)
                 AS target_share,
               (CAST(p_alpha AS DOUBLE) / CAST(z AS DOUBLE))
                 / (CAST(n_docs AS DOUBLE) / n_total) AS weight,
               (CAST(p_alpha AS DOUBLE) / CAST(z AS DOUBLE)) * n_total
                 AS expected_docs
        FROM powered CROSS JOIN norm ORDER BY source
        """,
        "doc_source_mix": """
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
                 CAST(count(*) AS BIGINT) AS n_sources
          FROM per
        )
        SELECT source, n_docs,
               CAST(n_docs AS DOUBLE) / n_total AS share,
               CAST(n_total AS DOUBLE) / (n_sources * n_docs) AS weight
        FROM per CROSS JOIN tot ORDER BY source
        """,
        "doc_resampled_mix": """
        WITH per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM per
        ), powered AS (
          SELECT source, n_docs, n_total,
                 CAST(round(pow(CAST(n_docs AS DOUBLE) / n_total, 0.3),
                            12) AS DECIMAL(20,12)) AS p_alpha
          FROM per CROSS JOIN tot
        ), norm AS (
          SELECT sum(p_alpha) AS z FROM powered
        ), w AS (
          SELECT source, n_docs,
                 CAST(p_alpha AS DOUBLE) / CAST(z AS DOUBLE)
                   AS target_share,
                 (CAST(p_alpha AS DOUBLE) / CAST(z AS DOUBLE))
                   / (CAST(n_docs AS DOUBLE) / n_total) AS weight
          FROM powered CROSS JOIN norm
        ), drawn AS (
          SELECT d.source,
            list_sum(list_transform(range(1, 9),
              i -> (strpos('0123456789abcdef',
                     substr(md5('mix-v1|' || CAST(d.doc_id AS VARCHAR)),
                            CAST(i AS INTEGER), 1)) - 1)
                   * (16.0 ** (8 - i)))) / 4294967296.0 AS u,
            least(1.0, 0.5 * w.weight) AS p
          FROM documents d JOIN w USING (source)
        ), kept AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_kept
          FROM drawn WHERE u < p GROUP BY 1
        ), filled AS (
          SELECT w.source, w.n_docs, w.target_share,
                 CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
          FROM w LEFT JOIN kept k USING (source)
        ), ktot AS (
          SELECT sum(n_kept) AS total_kept FROM filled
        )
        SELECT source, n_docs, n_kept, target_share,
               CAST(n_kept AS DOUBLE) / total_kept AS achieved_share
        FROM filled CROSS JOIN ktot ORDER BY source
        """,
        "doc_unigram_logprob": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , terms AS (
          SELECT doc_id, unnest(tokens) AS term FROM toks
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY 1, 2
        ), vocab AS (
          SELECT term, CAST(count(*) AS BIGINT) AS n_term
          FROM terms GROUP BY 1
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_total FROM terms
        ), scored AS (
          SELECT t.doc_id, t.tf,
            t.tf * CAST(round(ln(CAST(v.n_term AS DOUBLE) / o.n_total), 12)
                        AS DECIMAL(20,12)) AS wlp
          FROM tf t JOIN vocab v USING (term) CROSS JOIN tot o
        )
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               CAST(sum(wlp) AS DOUBLE) / sum(tf) AS avg_logprob
        FROM scored GROUP BY 1 ORDER BY 1
        """,
        "doc_lm_buckets": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , terms AS (
          SELECT doc_id, unnest(tokens) AS term FROM toks
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY 1, 2
        ), vocab AS (
          SELECT term, CAST(count(*) AS BIGINT) AS n_term
          FROM terms GROUP BY 1
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_total FROM terms
        ), scored AS (
          SELECT t.doc_id, t.tf,
            t.tf * CAST(round(ln(CAST(v.n_term AS DOUBLE) / o.n_total), 12)
                        AS DECIMAL(20,12)) AS wlp
          FROM tf t JOIN vocab v USING (term) CROSS JOIN tot o
        ), lp AS (
          SELECT doc_id,
                 CAST(sum(tf) AS BIGINT) AS n_tokens,
                 CAST(sum(wlp) AS DOUBLE) / sum(tf) AS avg_logprob
          FROM scored GROUP BY 1
        ), tiered AS (
          SELECT doc_id, n_tokens, avg_logprob,
                 CAST(ntile(3) OVER (
                   ORDER BY avg_logprob DESC, doc_id) AS BIGINT) AS bucket
          FROM lp
        )
        SELECT doc_id, n_tokens, avg_logprob, bucket,
               CASE WHEN bucket = 1 THEN 'head'
                    WHEN bucket = 2 THEN 'middle'
                    ELSE 'tail' END AS tier
        FROM tiered ORDER BY doc_id
        """,
        "doc_bigram_logprob": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , terms AS (
          SELECT doc_id, unnest(tokens) AS term,
                 generate_subscripts(tokens, 1) AS pos
          FROM toks
        ), pairs AS (
          SELECT doc_id, prev, term FROM (
            SELECT doc_id,
                   lag(term) OVER (
                     PARTITION BY doc_id ORDER BY pos) AS prev,
                   term
            FROM terms
          ) WHERE prev IS NOT NULL
        ), tf AS (
          SELECT doc_id, prev, term, CAST(count(*) AS BIGINT) AS tf
          FROM pairs GROUP BY 1, 2, 3
        ), big AS (
          SELECT prev, term, CAST(count(*) AS BIGINT) AS n_big
          FROM pairs GROUP BY 1, 2
        ), ctx AS (
          SELECT prev, CAST(count(*) AS BIGINT) AS n_ctx
          FROM pairs GROUP BY 1
        ), scored AS (
          SELECT t.doc_id, t.tf,
            t.tf * CAST(round(ln(CAST(b.n_big AS DOUBLE) / c.n_ctx), 12)
                        AS DECIMAL(20,12)) AS wlp
          FROM tf t JOIN big b USING (prev, term) JOIN ctx c USING (prev)
        ), lp AS (
          SELECT doc_id,
                 CAST(sum(tf) AS BIGINT) AS n_bigrams,
                 CAST(sum(wlp) AS DOUBLE) / sum(tf) AS avg_logprob
          FROM scored GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(l.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               l.avg_logprob
        FROM documents d LEFT JOIN lp l USING (doc_id)
        ORDER BY 1
        """,
        "doc_lm_score_hash4": _hashn_logprob_sql(4, 1 << 18),
        "doc_lm_score_hash5": _hashn_logprob_sql(5, 1 << 18),
        "doc_hash4_collisions": _hashn_collisions_sql(4, 1 << 18),
        "doc_hash5_collisions": _hashn_collisions_sql(5, 1 << 18),
        "doc_lm_score_backoff": r"""WITH
        train AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        score AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
        ttoks AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS tokens
          FROM train
        ), stoks AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS tokens
          FROM score
        ), tterms AS (
          SELECT doc_id, unnest(tokens) AS term,
                 generate_subscripts(tokens, 1) AS pos
          FROM ttoks
        ), tpairs AS (
          SELECT doc_id, prev, term FROM (
            SELECT doc_id,
                   lag(term) OVER (
                     PARTITION BY doc_id ORDER BY pos) AS prev,
                   term
            FROM tterms
          ) WHERE prev IS NOT NULL
        ), big AS (
          SELECT prev, term, CAST(count(*) AS BIGINT) AS n_big
          FROM tpairs GROUP BY 1, 2
        ), ctx AS (
          SELECT prev, CAST(count(*) AS BIGINT) AS n_ctx
          FROM tpairs GROUP BY 1
        ), uni AS (
          SELECT term, CAST(count(*) AS BIGINT) AS n_uni
          FROM (SELECT unnest(tokens) AS term FROM ttoks) GROUP BY 1
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_total
          FROM (SELECT unnest(tokens) AS term FROM ttoks)
        ), sterms AS (
          SELECT doc_id, unnest(tokens) AS term,
                 generate_subscripts(tokens, 1) AS pos
          FROM stoks
        ), spairs AS (
          SELECT doc_id, prev, term FROM (
            SELECT doc_id,
                   lag(term) OVER (
                     PARTITION BY doc_id ORDER BY pos) AS prev,
                   term
            FROM sterms
          ) WHERE prev IS NOT NULL
        ), tf AS (
          SELECT doc_id, prev, term, CAST(count(*) AS BIGINT) AS tf
          FROM spairs GROUP BY 1, 2, 3
        ), joined AS (
          SELECT t.doc_id, t.tf, b.n_big, c.n_ctx, u.n_uni, o.n_total
          FROM tf t
          LEFT JOIN big b USING (prev, term)
          LEFT JOIN ctx c USING (prev)
          LEFT JOIN uni u USING (term)
          CROSS JOIN tot o
        ), scored AS (
          SELECT doc_id, tf,
            CASE WHEN n_big IS NOT NULL
              THEN tf * CAST(round(ln(CAST(n_big AS DOUBLE) / n_ctx), 12)
                             AS DECIMAL(20,12))
              ELSE tf * CAST(round(ln(0.4 * CAST(COALESCE(n_uni, 1)
                             AS DOUBLE) / n_total), 12)
                             AS DECIMAL(20,12)) END AS wlp,
            CASE WHEN n_big IS NOT NULL THEN 0 ELSE tf END AS backoff_tf
          FROM joined
        ), agg AS (
          SELECT doc_id,
                 CAST(sum(tf) AS BIGINT) AS n_bigrams,
                 CAST(sum(backoff_tf) AS BIGINT) AS n_backoff,
                 CAST(sum(wlp) AS DOUBLE) / sum(tf) AS avg_logprob
          FROM scored GROUP BY 1
        )
        SELECT s.doc_id,
               CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(a.n_backoff, 0) AS BIGINT) AS n_backoff,
               a.avg_logprob
        FROM score s LEFT JOIN agg a USING (doc_id)
        ORDER BY 1
        """,
        "doc_lm_score_tri": r"""WITH
        train AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        score AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
        ttoks AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS tokens
          FROM train
        ), stoks AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS tokens
          FROM score
        ), trows AS (
          SELECT doc_id,
                 lag(w3, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
                 lag(w3, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
                 w3
          FROM (
            SELECT doc_id, unnest(tokens) AS w3,
                   generate_subscripts(tokens, 1) AS pos
            FROM ttoks
          )
        ), tri AS (
          SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS n_tri
          FROM trows WHERE w1 IS NOT NULL GROUP BY 1, 2, 3
        ), tctx AS (
          SELECT w1, w2, CAST(sum(n_tri) AS BIGINT) AS n_tctx
          FROM tri GROUP BY 1, 2
        ), big AS (
          SELECT w2, w3, CAST(count(*) AS BIGINT) AS n_big
          FROM trows WHERE w2 IS NOT NULL GROUP BY 1, 2
        ), bctx AS (
          SELECT w2, CAST(sum(n_big) AS BIGINT) AS n_bctx
          FROM big GROUP BY 1
        ), uni AS (
          SELECT w3, CAST(count(*) AS BIGINT) AS n_uni
          FROM trows GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(n_uni) AS BIGINT) AS n_total FROM uni
        ), srows AS (
          SELECT doc_id,
                 lag(w3, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
                 lag(w3, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
                 w3
          FROM (
            SELECT doc_id, unnest(tokens) AS w3,
                   generate_subscripts(tokens, 1) AS pos
            FROM stoks
          )
        ), tf AS (
          SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS tf
          FROM srows WHERE w1 IS NOT NULL GROUP BY 1, 2, 3, 4
        ), joined AS (
          SELECT t.doc_id, t.tf, r.n_tri, c.n_tctx, b.n_big, x.n_bctx,
                 u.n_uni, o.n_total
          FROM tf t
          LEFT JOIN tri r USING (w1, w2, w3)
          LEFT JOIN tctx c USING (w1, w2)
          LEFT JOIN big b USING (w2, w3)
          LEFT JOIN bctx x USING (w2)
          LEFT JOIN uni u USING (w3)
          CROSS JOIN tot o
        ), scored AS (
          SELECT doc_id, tf,
            CASE
              WHEN n_tri IS NOT NULL THEN
                tf * CAST(round(ln(CAST(n_tri AS DOUBLE) / n_tctx), 12)
                          AS DECIMAL(20,12))
              WHEN n_big IS NOT NULL THEN
                tf * CAST(round(ln(0.4 * CAST(n_big AS DOUBLE) / n_bctx),
                                12) AS DECIMAL(20,12))
              ELSE
                tf * CAST(round(ln(0.16 * CAST(COALESCE(n_uni, 1)
                                AS DOUBLE) / n_total), 12)
                          AS DECIMAL(20,12))
            END AS wlp,
            CASE WHEN n_tri IS NULL AND n_big IS NOT NULL
                 THEN tf ELSE 0 END AS bi_tf,
            CASE WHEN n_tri IS NULL AND n_big IS NULL
                 THEN tf ELSE 0 END AS uni_tf
          FROM joined
        ), agg AS (
          SELECT doc_id,
                 CAST(sum(tf) AS BIGINT) AS n_trigrams,
                 CAST(sum(bi_tf) AS BIGINT) AS n_backoff_bi,
                 CAST(sum(uni_tf) AS BIGINT) AS n_backoff_uni,
                 CAST(sum(wlp) AS DOUBLE) / sum(tf) AS avg_logprob
          FROM scored GROUP BY 1
        )
        SELECT s.doc_id,
               CAST(COALESCE(a.n_trigrams, 0) AS BIGINT) AS n_trigrams,
               CAST(COALESCE(a.n_backoff_bi, 0) AS BIGINT) AS n_backoff_bi,
               CAST(COALESCE(a.n_backoff_uni, 0) AS BIGINT)
                 AS n_backoff_uni,
               a.avg_logprob
        FROM score s LEFT JOIN agg a USING (doc_id)
        ORDER BY 1
        """,
        "emb_hybrid_rrf": r"""WITH
        toks AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS tokens
          FROM documents
        ), dl AS (
          SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks
        ), qterms AS (
          SELECT doc_id AS q_id, unnest(list_distinct(tokens)) AS term
          FROM toks WHERE doc_id < 3
        ), tok AS (
          SELECT doc_id, unnest(tokens) AS term FROM toks
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok WHERE term IN (SELECT DISTINCT term FROM qterms)
          GROUP BY 1, 2
        ), dft AS (
          SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM tf GROUP BY 1
        ), stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 round(avg(dl), 6) AS avgdl
          FROM dl
        ), sparse AS (
          SELECT qt.q_id, tf.doc_id,
                 round(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * (1.2 + 1.0))
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                 ), 6) AS bm25
          FROM qterms qt
          JOIN tf ON tf.term = qt.term AND tf.doc_id <> qt.q_id
          JOIN dl ON dl.doc_id = tf.doc_id
          JOIN dft ON dft.term = tf.term, stats
          GROUP BY 1, 2
        ), sd AS (
          SELECT q_id, doc_id, r_s FROM (
            SELECT q_id, doc_id,
                   CAST(row_number() OVER (
                     PARTITION BY q_id ORDER BY bm25 DESC, doc_id)
                     AS BIGINT) AS r_s
            FROM sparse
          ) WHERE r_s <= 20
        ), e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings
        ), nv AS (
          SELECT vec_id, emb,
                 sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
          FROM e
        ), qv AS (
          SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm
          FROM nv WHERE vec_id < 3
        ), dense AS (
          SELECT qv.q_id, nv.vec_id AS doc_id,
                 round(list_sum(list_transform(
                         list_zip(nv.emb, qv.q_emb), p -> p[1] * p[2]))
                       / (nv.nrm * qv.q_nrm), 6) AS sim
          FROM nv CROSS JOIN qv WHERE nv.vec_id <> qv.q_id
        ), dd AS (
          SELECT q_id, doc_id, r_d FROM (
            SELECT q_id, doc_id,
                   CAST(row_number() OVER (
                     PARTITION BY q_id ORDER BY sim DESC, doc_id)
                     AS BIGINT) AS r_d
            FROM dense
          ) WHERE r_d <= 20
        ), fused AS (
          SELECT COALESCE(s.q_id, d.q_id) AS q_id,
                 COALESCE(s.doc_id, d.doc_id) AS doc_id,
                 s.r_s, d.r_d,
                 COALESCE(1.0 / (60 + s.r_s), 0)
                   + COALESCE(1.0 / (60 + d.r_d), 0) AS rrf
          FROM sd s FULL OUTER JOIN dd d
            ON s.q_id = d.q_id AND s.doc_id = d.doc_id
        )
        SELECT q_id, doc_id, r_s AS sparse_rank, r_d AS dense_rank,
               round(rrf, 6) AS rrf_score, rank
        FROM (
          SELECT q_id, doc_id, r_s, r_d, rrf,
                 CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY rrf DESC, doc_id)
                   AS BIGINT) AS rank
          FROM fused
        ) WHERE rank <= 10
        ORDER BY q_id, rank
        """,
        "doc_source_nb": r"""WITH
        toks AS (
          SELECT doc_id, source,
                 string_split_regex(lower(text), '\s+') AS tokens
          FROM documents
        ), terms AS (
          SELECT doc_id, source, unnest(tokens) AS term FROM toks
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY 1, 2
        ), census AS (
          SELECT source, term, CAST(count(*) AS BIGINT) AS n_st
          FROM terms GROUP BY 1, 2
        ), src AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_s
          FROM terms GROUP BY 1
        ), sdocs AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs_s
          FROM documents GROUP BY 1
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
        ), voc AS (
          SELECT CAST(count(DISTINCT term) AS BIGINT) AS v_size
          FROM terms
        ), pairs AS (
          SELECT t.doc_id, s.source, t.tf,
                 COALESCE(c.n_st, 0) AS n_st, s.n_s, v.v_size
          FROM tf t
          CROSS JOIN src s
          CROSS JOIN voc v
          LEFT JOIN census c ON c.source = s.source AND c.term = t.term
        ), scored AS (
          SELECT doc_id, source,
                 sum(CAST(tf AS DECIMAL(12,0))
                     * CAST(round(ln(CAST(n_st + 1 AS DOUBLE)
                                     / (n_s + v_size)), 12)
                            AS DECIMAL(20,12))) AS sum_lp
          FROM pairs GROUP BY 1, 2
        ), total AS (
          SELECT sc.doc_id, sc.source,
                 CAST(round(ln(CAST(d.n_docs_s AS DOUBLE) / t.n_docs), 12)
                      AS DECIMAL(20,12)) + sc.sum_lp AS score
          FROM scored sc JOIN sdocs d USING (source) CROSS JOIN tot t
        ), best AS (
          SELECT doc_id, source AS pred_source, score,
                 row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score DESC, source) AS rn
          FROM total
        )
        SELECT d.doc_id, d.source AS actual_source, b.pred_source,
               CAST(b.score AS DOUBLE) AS score,
               (b.pred_source = d.source) AS correct
        FROM documents d JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
        ORDER BY 1
        """,
        "doc_tfidf_terms": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , terms AS (
          SELECT doc_id, unnest(tokens) AS term FROM toks
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY 1, 2
        ), dft AS (
          SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ), n AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
        ), scored AS (
          SELECT t.doc_id, t.term, t.tf, d.df,
            t.tf * CAST(round(ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0, 12)
                        AS DECIMAL(18,12)) AS tfidf_dec
          FROM tf t JOIN dft d USING (term) CROSS JOIN n
        ), ranked AS (
          SELECT *, row_number() OVER (
                 PARTITION BY doc_id ORDER BY tfidf_dec DESC, term) AS rn
          FROM scored
        )
        SELECT doc_id, term, tf, df,
               CAST(tfidf_dec AS DOUBLE) AS tfidf,
               CAST(rn AS BIGINT) AS rank
        FROM ranked WHERE rn <= 5
        ORDER BY doc_id, rank
        """,
        "doc_chunk_dupes": XD.DOCS_NEARDUP_CTE
        + ", "
        + _TOKS_CTE.format(src="docs")
        + """
        , starts AS (
          SELECT doc_id, tokens,
                 unnest(generate_series(1, len(tokens), 32)) AS s
          FROM toks
        ), chunks AS (
          SELECT doc_id, list_slice(tokens, s, s + 31) AS chunk
          FROM starts
        ), fullc AS (
          SELECT doc_id, md5(array_to_string(chunk, ' ')) AS chunk_md5
          FROM chunks WHERE len(chunk) = 32
        )
        SELECT chunk_md5,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               min(doc_id) AS first_doc
        FROM fullc GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
        ORDER BY chunk_md5
        """,
        "doc_incremental_neardup": XD.DOCS_NEARDUP_CTE
        + _LSH_CTES
        + """
        , sbands AS (
          SELECT * FROM bands WHERE doc_id % 3 <> 0
        ), nbands AS (
          SELECT * FROM bands WHERE doc_id % 3 = 0
        ), scap AS (
          SELECT * FROM (
            SELECT *, count(*) OVER (PARTITION BY band_id, band_key)
                   AS nb_bucket
            FROM sbands
          ) WHERE nb_bucket <= 1000
        ), icand AS (
          SELECT DISTINCT n.doc_id AS new_id, s.doc_id AS stored_id
          FROM nbands n JOIN scap s
            ON n.band_id = s.band_id AND n.band_key = s.band_key
        ), iverified AS (
          SELECT c.new_id, c.stored_id,
                 round(len(list_intersect(sa.shingles, sb.shingles))
                   / len(list_distinct(list_concat(sa.shingles,
                                                   sb.shingles))),
                   6) AS jaccard
          FROM icand c
          JOIN sh sa ON sa.doc_id = c.new_id
          JOIN sh sb ON sb.doc_id = c.stored_id
        )
        SELECT * FROM iverified WHERE jaccard >= 0.5
        ORDER BY new_id, stored_id
        """,
        "doc_minhash_lsh": XD.DOCS_NEARDUP_CTE
        + _LSH_CTES
        + """
        SELECT * FROM verified WHERE jaccard >= 0.5
        """,
        "doc_neardup_curve": XD.DOCS_NEARDUP_CTE
        + _LSH_CTES
        + """
        , found AS (
          SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.3
        ), truth AS (
          SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
          FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id, doc_id + 2000000
          FROM documents WHERE doc_id % 25 = 0
          UNION ALL
          SELECT doc_id + 1000000, doc_id + 2000000
          FROM documents WHERE doc_id % 50 = 0
        ), flagged AS (
          SELECT f.doc_a, f.doc_b, f.jaccard,
                 CASE WHEN EXISTS (SELECT 1 FROM truth t
                                   WHERE t.doc_a = f.doc_a
                                     AND t.doc_b = f.doc_b)
                      THEN 1 ELSE 0 END AS planted
          FROM found f
        ), grid AS (
          SELECT CAST(unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8]) AS DOUBLE)
                 AS threshold
        ), agg AS (
          SELECT g.threshold,
                 CAST(sum(CASE WHEN fl.jaccard >= g.threshold
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
                 CAST(sum(CASE WHEN fl.jaccard >= g.threshold
                               THEN fl.planted ELSE 0 END) AS BIGINT)
                   AS n_hit
          FROM grid g CROSS JOIN flagged fl GROUP BY 1
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth
        )
        SELECT g.threshold,
               CAST(COALESCE(a.n_found, 0) AS BIGINT) AS n_found,
               CAST(COALESCE(a.n_hit, 0) AS BIGINT) AS n_hit,
               t.n_truth,
               CASE WHEN COALESCE(a.n_found, 0) > 0
                    THEN CAST(a.n_hit AS DOUBLE) / a.n_found END
                 AS precision,
               CAST(COALESCE(a.n_hit, 0) AS DOUBLE) / t.n_truth AS recall
        FROM grid g LEFT JOIN agg a USING (threshold) CROSS JOIN tot t
        ORDER BY 1
        """,
        "doc_neardup_quality": XD.DOCS_NEARDUP_CTE
        + _LSH_CTES
        + """
        , found AS (
          SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5
        ), truth AS (
          SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
          FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id, doc_id + 2000000
          FROM documents WHERE doc_id % 25 = 0
          UNION ALL
          SELECT doc_id + 1000000, doc_id + 2000000
          FROM documents WHERE doc_id % 50 = 0
        ), hit AS (
          SELECT f.doc_a, f.doc_b FROM found f
          WHERE EXISTS (SELECT 1 FROM truth t
                        WHERE t.doc_a = f.doc_a AND t.doc_b = f.doc_b)
        )
        SELECT
          CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
          CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
          CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
          CAST((SELECT count(*) FROM hit) AS DOUBLE)
            / (SELECT count(*) FROM found) AS precision,
          CAST((SELECT count(*) FROM hit) AS DOUBLE)
            / (SELECT count(*) FROM truth) AS recall
        """,
        "doc_dup_clusters": _CLUSTER_CTES
        + """
        SELECT doc_id, cluster_id FROM clusters_all ORDER BY doc_id
        """,
        # star contraction converges to the same min-reachable-id
        # fixpoint — deliberately the IDENTICAL oracle
        "doc_dup_clusters_star": _CLUSTER_CTES
        + """
        SELECT doc_id, cluster_id FROM clusters_all ORDER BY doc_id
        """,
        "doc_dedup_keep_best": _CLUSTER_CTES
        + """
        , q AS (
          SELECT doc_id,
            round(0.5 * (len(list_distinct(tokens)) / len(tokens))
              + 0.3 * (1.0 - (len(list_filter(tokens, t -> t IN ('the','a')))
                              / len(tokens)))
              + 0.2 * (CASE WHEN len(tokens) >= 10 AND len(tokens) <= 10000
                       THEN 1.0 ELSE 0.0 END), 6) AS quality_score
          FROM toks
        ), ranked AS (
          SELECT c.cluster_id, q.doc_id, q.quality_score,
                 row_number() OVER (PARTITION BY c.cluster_id
                   ORDER BY q.quality_score DESC, q.doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY c.cluster_id) AS n_docs
          FROM clusters_all c JOIN q USING (doc_id)
        )
        SELECT cluster_id, doc_id AS keep_doc_id,
               CAST(n_docs AS BIGINT) AS n_docs,
               quality_score AS best_quality
        FROM ranked WHERE rn = 1 AND n_docs > 1
        ORDER BY cluster_id
        """,
        "corpus_curated": _CLUSTER_CTES
        + """
        , q AS (
          SELECT doc_id,
            round(0.5 * (len(list_distinct(tokens)) / len(tokens))
              + 0.3 * (1.0 - (len(list_filter(tokens, t -> t IN ('the','a')))
                              / len(tokens)))
              + 0.2 * (CASE WHEN len(tokens) >= 10 AND len(tokens) <= 10000
                       THEN 1.0 ELSE 0.0 END), 6) AS quality_score
          FROM toks
        ), ranked AS (
          SELECT c.cluster_id, q.doc_id, q.quality_score,
                 row_number() OVER (PARTITION BY c.cluster_id
                   ORDER BY q.quality_score DESC, q.doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY c.cluster_id) AS n_docs
          FROM clusters_all c JOIN q USING (doc_id)
        ), kept AS (
          SELECT doc_id, quality_score, CAST(n_docs AS BIGINT) AS n_docs
          FROM ranked WHERE rn = 1
        )
        SELECT k.doc_id, d.lang,
               CASE WHEN substr(md5('split-v1|' || CAST(k.doc_id AS VARCHAR)),
                      1, 2) < '0a' THEN 'test'
                    WHEN substr(md5('split-v1|' || CAST(k.doc_id AS VARCHAR)),
                      1, 2) < '14' THEN 'val'
                    ELSE 'train' END AS split,
               k.n_docs, k.quality_score
        FROM kept k JOIN docs d USING (doc_id)
        WHERE k.quality_score >= 0.5
        ORDER BY k.doc_id
        """,
        "doc_sample_stratified": """
        SELECT doc_id, lang, source, hash_prefix FROM (
          SELECT doc_id, lang, source,
                 substr(md5('sample-v1|' || CAST(doc_id AS VARCHAR)), 1, 2)
                   AS hash_prefix
          FROM documents
        )
        WHERE hash_prefix < CASE lang
          WHEN 'de' THEN '40' WHEN 'en' THEN 'cc' WHEN 'es' THEN '80'
          ELSE '00' END
        ORDER BY doc_id
        """,
        "doc_train_split": """
        SELECT doc_id, lang,
               CASE WHEN p < '0a' THEN 'test'
                    WHEN p < '14' THEN 'val'
                    ELSE 'train' END AS split
        FROM (
          SELECT doc_id, lang,
                 substr(md5('split-v1|' || CAST(doc_id AS VARCHAR)), 1, 2) AS p
          FROM documents
        )
        ORDER BY doc_id
        """,
        "doc_grouped_split": """
        SELECT doc_id, source AS grp,
               CASE WHEN p < '0a' THEN 'test'
                    WHEN p < '14' THEN 'val'
                    ELSE 'train' END AS split
        FROM (
          SELECT doc_id, source,
                 substr(md5('split-v1|' || CAST(source AS VARCHAR)), 1, 2) AS p
          FROM documents
        )
        ORDER BY doc_id
        """,
        "doc_duplicate_spans": "WITH "
        + _TOKS_CTE.format(src="documents")
        + _DUPSPAN_CTES
        + """
        SELECT doc_id, span_start, span_end, span_tokens, n_windows
        FROM spans ORDER BY doc_id, span_start
        """,
        "doc_dedup_passages": "WITH "
        + _TOKS_CTE.format(src="documents")
        + _DUPSPAN_KF_CTES
        + _STRIP_SQL,
        # incremental == full-corpus spans restricted to batch docs
        # (the pytest-proven equivalence in test_ext_dedup.py)
        "doc_incremental_spans": "WITH "
        + _TOKS_CTE.format(src="documents")
        + _DUPSPAN_CTES_T.replace(
            "{keep_first_pred}", " WHERE doc_id % 3 = 0"
        )
        + """
        SELECT doc_id, span_start, span_end, span_tokens, n_windows
        FROM spans ORDER BY doc_id, span_start
        """,
        "doc_strip_spans": "WITH "
        + _TOKS_CTE.format(src="documents")
        + _DUPSPAN_CTES
        + _STRIP_SQL,
        "doc_ngram_topk": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , grams AS (
          SELECT unnest(CASE WHEN len(tokens) >= 3
            THEN list_transform(range(1, len(tokens) - 1),
                 i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
            ELSE CAST([] AS VARCHAR[]) END) AS ngram
          FROM toks
        )
        SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM grams GROUP BY 1
        ORDER BY n_occurrences DESC, ngram ASC LIMIT 50
        """,
        "doc_vocab_topk": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , tok AS (SELECT doc_id, unnest(tokens) AS token FROM toks)
        SELECT token,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM tok
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT 50
        """,
        "tpch_q8": """
        WITH base AS (
          SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                   AS DECIMAL(18,4)) AS vol,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE p_type = 'PROMO' AND r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        SELECT o_year,
               round(
                 CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
        FROM base
        GROUP BY o_year ORDER BY o_year
        """,
        "tpch_q9": """
        SELECT n_name AS nation,
               CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
               CAST(sum(
                 CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                   AS DECIMAL(18,4))
                 - CAST(round(p_retailprice * 0.1 * l_quantity, 4)
                   AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, CAST(date_part('year', o_orderdate) AS INTEGER)
        ORDER BY nation, o_year DESC
        """,
        "tpch_q11": """
        WITH pv AS (
          SELECT l_partkey,
                 sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                   AS DECIMAL(18,4))) AS value_dec
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          WHERE n_name = 'NATION_7'
          GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
        FROM pv
        WHERE CAST(value_dec AS DOUBLE) >
          (SELECT 3.0 * (CAST(sum(value_dec) AS DOUBLE) / count(*)) FROM pv)
        ORDER BY value DESC, l_partkey
        """,
        "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#3'
          AND p_type NOT LIKE 'MEDIUM%'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "tpch_q20": """
        WITH shipped AS (
          SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty96
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
        ), tot AS (
          SELECT l_partkey, sum(qty96) AS qty_all FROM shipped
          GROUP BY l_partkey
        )
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (
            SELECT l_suppkey FROM shipped JOIN tot USING (l_partkey)
            WHERE qty96 > 0.5 * qty_all)
        ORDER BY s_name
        """,
        "tpch_q13": """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q15": """
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                   AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON supplier_no = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey
        """,
        "tpch_q17": """
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0, 6) AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p_brand = 'Brand#1' AND p_size < 15
          AND l_quantity < (
            SELECT round(0.2 * avg(l2.l_quantity), 6)
            FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
          )
        """,
        "tpch_q21": """
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
        """,
        "doc_token_cms": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , tok AS (
          SELECT unnest(tokens) AS token FROM toks
        ), cells AS (
          SELECT d AS row,
            CAST(list_sum(list_transform(range(1, 9),
              i -> (strpos('0123456789abcdef',
                     substr(md5('cms-v1|' || CAST(d AS VARCHAR) || '|'
                                || token),
                            CAST(i AS INTEGER), 1)) - 1)
                   * (16.0 ** (8 - i)))) AS BIGINT) & 63 AS col
          FROM tok, range(0, 4) t(d)
        ), sk AS (
          SELECT row, col, CAST(count(*) AS BIGINT) AS cnt
          FROM cells GROUP BY row, col
        ), probes(probe) AS (
          VALUES ('fast'), ('data'), ('stream'), ('the'), ('a')
        ), pcells AS (
          SELECT probe, d AS row,
            CAST(list_sum(list_transform(range(1, 9),
              i -> (strpos('0123456789abcdef',
                     substr(md5('cms-v1|' || CAST(d AS VARCHAR) || '|'
                                || probe),
                            CAST(i AS INTEGER), 1)) - 1)
                   * (16.0 ** (8 - i)))) AS BIGINT) & 63 AS col
          FROM probes, range(0, 4) t(d)
        ), est AS (
          SELECT probe,
                 CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_count
          FROM pcells LEFT JOIN sk USING (row, col)
          GROUP BY probe
        ), exact AS (
          SELECT token AS probe, CAST(count(*) AS BIGINT) AS exact_count
          FROM tok WHERE token IN ('fast', 'data', 'stream', 'the', 'a')
          GROUP BY token
        )
        SELECT probe, est_count,
               CAST(coalesce(exact_count, 0) AS BIGINT) AS exact_count
        FROM est LEFT JOIN exact USING (probe)
        ORDER BY probe
        """,
        "event_anomaly": """
        WITH daily0 AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY event_type, day
        ), span AS (
          SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM daily0 GROUP BY event_type
        ), grid AS (
          SELECT event_type,
                 unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
          FROM span
        ), daily AS (
          -- densified: absent (event_type, day) cells become 0 rows so
          -- outage days score (large negative z) instead of vanishing
          SELECT g.event_type, g.day,
                 CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events
          FROM grid g LEFT JOIN daily0 d
            ON d.event_type = g.event_type AND d.day = g.day
        ), stats AS (
          SELECT event_type, day, n_events,
                 round(avg(n_events) OVER w, 6) AS base_mean,
                 round(stddev_samp(n_events) OVER w, 6) AS base_std
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, day, n_events, base_mean, base_std,
               CASE WHEN base_std > 0
                    THEN round((n_events - base_mean) / base_std, 6)
               END AS z,
               coalesce(CASE WHEN base_std > 0
                             THEN abs(round((n_events - base_mean)
                                  / base_std, 6)) > 2.5
                        END, FALSE) AS is_anomaly
        FROM stats
        ORDER BY event_type, day
        """,
        "doc_bm25_topk": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , dl AS (
          SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks
        ), tok AS (
          SELECT doc_id, unnest(tokens) AS term FROM toks
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok WHERE term IN ('fast', 'data', 'stream')
          GROUP BY doc_id, term
        ), dft AS (
          SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM tf GROUP BY term
        ), stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 round(avg(dl), 6) AS avgdl
          FROM dl
        ), scored AS (
          SELECT tf.doc_id,
                 round(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * (1.2 + 1.0))
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                 ), 6) AS bm25
          FROM tf
          JOIN dl USING (doc_id)
          JOIN dft USING (term), stats
          GROUP BY tf.doc_id
        ), ranked AS (
          SELECT doc_id, bm25,
                 CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                   AS BIGINT) AS rank
          FROM scored
        )
        SELECT * FROM ranked WHERE rank <= 10 ORDER BY rank
        """,
        "doc_chunks": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , starts AS (
          SELECT doc_id, tokens,
                 unnest(generate_series(1, len(tokens), 48)) AS s
          FROM toks
        ), chunks AS (
          SELECT doc_id, s, list_slice(tokens, s, s + 63) AS chunk
          FROM starts
        )
        SELECT doc_id,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s)
                 AS BIGINT) AS chunk_id,
               CAST(s AS BIGINT) AS start_token,
               CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
               md5(array_to_string(chunk, ' ')) AS chunk_md5
        FROM chunks
        ORDER BY doc_id, chunk_id
        """,
        "doc_pii_scrub": r"""
        WITH docs AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                           || '@example.com id 55501' || CAST(doc_id AS VARCHAR)
                      ELSE text END AS text
          FROM documents
        )
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+'))
               AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text, '[0-9]{3,}')) AS BIGINT)
               AS n_numbers,
          md5(regexp_replace(
                regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+',
                               '<EMAIL>', 'g'),
                '[0-9]{3,}', '<NUM>', 'g')) AS scrubbed_md5
        FROM docs ORDER BY doc_id
        """,
        "doc_importance_sample": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """,
        q AS (
          SELECT doc_id,
            round(0.5 * (len(list_distinct(tokens)) / len(tokens))
              + 0.3 * (1.0 - (len(list_filter(tokens, t -> t IN ('the','a')))
                              / len(tokens)))
              + 0.2 * (CASE WHEN len(tokens) >= 10 AND len(tokens) <= 10000
                       THEN 1.0 ELSE 0.0 END), 6) AS quality_score
          FROM toks),
        drawn AS (
          SELECT doc_id, quality_score,
            list_sum(list_transform(range(1, 9),
              i -> (strpos('0123456789abcdef',
                     substr(md5('imp-v1|' || CAST(doc_id AS VARCHAR)),
                            CAST(i AS INTEGER), 1)) - 1)
                   * (16.0 ** (8 - i)))) / 4294967296.0 AS u
          FROM q)
        SELECT doc_id, quality_score AS keep_prob, round(u, 6) AS u
        FROM drawn
        WHERE u < least(greatest(quality_score, 0.0), 1.0)
        ORDER BY doc_id
        """,
        "doc_decontaminate": "WITH "
        + _TOKS_CTE.format(src="documents")
        + ", "
        + _SHINGLES_CTE
        + """,
        tagged AS (
          SELECT doc_id, shingles,
                 substr(md5('bench-v1|' || CAST(doc_id AS VARCHAR)), 1, 2)
                   AS hp
          FROM sh),
        bench AS (
          SELECT DISTINCT unnest(shingles) AS s FROM tagged
          WHERE hp < '08'),
        train AS (
          SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
                 unnest(shingles) AS s
          FROM tagged WHERE hp >= '08')
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_hit_shingles,
               n_shingles,
               round(count(*) * 1.0 / n_shingles, 6) AS hit_ratio
        FROM train t JOIN bench b ON t.s = b.s
        GROUP BY 1, 3 ORDER BY 1
        """,
        "doc_pack_sequences": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """,
        t AS (
          SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
                 md5('pack-v1|' || CAST(doc_id AS VARCHAR)) AS order_key
          FROM toks),
        packed AS (
          SELECT doc_id, substr(order_key, 1, 2) AS pack_group, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY substr(order_key, 1, 2) ORDER BY order_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_offset
          FROM t)
        SELECT doc_id, pack_group, n_tokens, start_offset,
               CAST(floor(start_offset / 512) AS BIGINT) AS bin_id
        FROM packed ORDER BY doc_id
        """,
        "event_attribution": """
        SELECT a.user_id, a.event_id AS click_id, a.ts AS click_ts,
               b.event_id AS purchase_id, b.ts AS purchase_ts,
               b.value AS purchase_value
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'click' AND b.event_type = 'purchase'
         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 4 HOUR
        ORDER BY 1, 2, 4
        """,
        "event_sessions": """
        WITH flags AS (
          SELECT user_id, ts, event_id, value,
            CASE WHEN lag(ts) OVER w IS NULL THEN 1
                 WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS nf
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT *, CAST(sum(nf) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
            AS session_seq
          FROM flags
        )
        SELECT user_id, session_seq,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value, 2) AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_value
        FROM sess GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "event_sessions_native": """
        WITH flags AS (
          SELECT user_id, ts, event_id, value,
            CASE WHEN lag(ts) OVER w IS NULL THEN 1
                 WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > 1800000000
                 THEN 1 ELSE 0 END AS nf
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT *, sum(nf) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS sid
          FROM flags
        )
        SELECT user_id,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value, 2) AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_value
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start
        """,
        "event_funnel": """
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS ep FROM events
        ), w1 AS (
          SELECT user_id, event_type, ep,
            max(CASE WHEN event_type = 'view' THEN ep END) OVER win
              AS best1
          FROM ev
          WINDOW win AS (PARTITION BY user_id ORDER BY ep
            RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        ), w2 AS (
          SELECT *, CASE WHEN event_type = 'click'
                          AND best1 IS NOT NULL
                          AND best1 >= ep - 1800000000
                     THEN best1 END AS anchor2
          FROM w1
        ), w3 AS (
          SELECT *, max(anchor2) OVER win AS best2
          FROM w2
          WINDOW win AS (PARTITION BY user_id ORDER BY ep
            RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id,
          CAST(max(greatest(
            CASE WHEN event_type = 'view' THEN 1 ELSE 0 END,
            CASE WHEN anchor2 IS NOT NULL THEN 2 ELSE 0 END,
            CASE WHEN event_type = 'purchase' AND best2 IS NOT NULL
                  AND best2 >= ep - 1800000000 THEN 3 ELSE 0 END
          )) AS INTEGER) AS funnel_level
        FROM w3 GROUP BY user_id ORDER BY user_id
        """,
        "event_retention": """
        WITH ev AS (
          SELECT user_id, date_trunc('day', ts) AS day FROM events
        ), firsts AS (
          SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1
        ), active AS (
          SELECT DISTINCT user_id, day FROM ev
        )
        SELECT cohort_day,
               CAST(date_diff('day', cohort_day, day) AS INTEGER)
                 AS day_offset,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM active JOIN firsts USING (user_id)
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
        """,
        "doc_repetition": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , bgl AS (
          SELECT doc_id,
            CASE WHEN len(tokens) >= 2
              THEN list_transform(range(1, len(tokens)),
                     i -> tokens[i] || ' ' || tokens[i+1])
              ELSE CAST([] AS VARCHAR[]) END AS bg
          FROM toks
        ), occ AS (
          SELECT doc_id, unnest(bg) AS phrase FROM bgl
        ), cnt AS (
          SELECT doc_id, phrase, count(*) AS c FROM occ GROUP BY 1, 2
        ), top AS (
          SELECT doc_id, max(c) AS topc FROM cnt GROUP BY 1
        )
        SELECT b.doc_id,
          CAST(len(bg) AS BIGINT) AS n_bigrams,
          CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
          CASE WHEN len(bg) > 0
            THEN round((len(bg) - len(list_distinct(bg)))
                       / CAST(len(bg) AS DOUBLE), 6)
            ELSE 0.0 END AS dup_bigram_frac,
          CASE WHEN len(bg) > 0
            THEN round(topc / CAST(len(bg) AS DOUBLE), 6)
            ELSE 0.0 END AS top_bigram_frac,
          (len(bg) > 0 AND
           round(topc / CAST(len(bg) AS DOUBLE), 6) > 0.2) AS flagged
        FROM bgl b LEFT JOIN top USING (doc_id)
        ORDER BY doc_id
        """,
        "doc_heavy_hitters": "WITH "
        + _TOKS_CTE.format(src="documents")
        + """
        , bg AS (
          SELECT unnest(list_transform(range(1, len(tokens)),
                   i -> tokens[i] || ' ' || tokens[i+1])) AS phrase
          FROM toks
        ), counts AS (
          SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
          FROM bg GROUP BY phrase
        ), tot AS (
          SELECT CAST(sum(n_occurrences) AS BIGINT) AS n_total FROM counts
        )
        SELECT phrase, n_occurrences,
               round(CAST(n_occurrences AS DOUBLE) / n_total, 8)
                 AS frequency
        FROM counts, tot
        WHERE n_occurrences >= CAST(0.001 * n_total AS DOUBLE)
        ORDER BY n_occurrences DESC, phrase
        """,
        "events_hll_daily": f"""
        WITH ev AS (
          SELECT date_trunc('day', ts) AS day, user_id FROM events
        ), vals AS (
          SELECT day, user_id,
            CAST(list_sum(list_transform(range(1, 9),
              i -> (strpos('0123456789abcdef',
                     substr(md5('hll-v1|' || CAST(user_id AS VARCHAR)),
                            CAST(i AS INTEGER), 1)) - 1)
                   * (16.0 ** (8 - i)))) AS BIGINT) AS x
          FROM ev
        ), rr AS (
          SELECT day, x & 63 AS hll_idx,
                 CASE WHEN (x >> 6) = 0 THEN 27
                      ELSE 27 - length(to_base(x >> 6, 2)) END AS rho
          FROM vals
        ), regs AS (
          SELECT day, hll_idx, max(rho) AS reg FROM rr GROUP BY 1, 2
        ), folded AS (
          SELECT day, count(*) AS n_regs, sum(2.0 ** (-reg)) AS sum_pow
          FROM regs GROUP BY 1
        ), est AS (
          SELECT day,
            CASE WHEN {ALPHA * 64 * 64!r} / (sum_pow + (64 - n_regs))
                      <= {2.5 * 64!r}
                  AND n_regs < 64
                 THEN 64.0 * ln(64.0 / (64 - n_regs))
                 ELSE {ALPHA * 64 * 64!r} / (sum_pow + (64 - n_regs))
            END AS e
          FROM folded
        ), ex AS (
          SELECT date_trunc('day', ts) AS day,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact
          FROM events GROUP BY 1
        )
        SELECT ex.day, ex.n_users_exact, round(est.e, 4) AS hll_estimate
        FROM ex JOIN est USING (day) ORDER BY day
        """,
        "rolling_active_hll": f"""
        WITH ev AS (
          SELECT date_trunc('day', ts) AS day, user_id FROM events
        ), vals AS (
          SELECT day, user_id,
            CAST(list_sum(list_transform(range(1, 9),
              i -> (strpos('0123456789abcdef',
                     substr(md5('hll-v1|' || CAST(user_id AS VARCHAR)),
                            CAST(i AS INTEGER), 1)) - 1)
                   * (16.0 ** (8 - i)))) AS BIGINT) AS x
          FROM ev
        ), rr AS (
          SELECT day, x & 63 AS hll_idx,
                 CASE WHEN (x >> 6) = 0 THEN 27
                      ELSE 27 - length(to_base(x >> 6, 2)) END AS rho
          FROM vals
        ), regs AS (
          SELECT day, hll_idx, max(rho) AS reg FROM rr GROUP BY 1, 2
        ), dfold AS (
          SELECT day, count(*) AS n_regs, sum(2.0 ** (-reg)) AS sum_pow
          FROM regs GROUP BY 1
        ), dest AS (
          SELECT day,
            CASE WHEN {ALPHA * 64 * 64!r} / (sum_pow + (64 - n_regs))
                      <= {2.5 * 64!r}
                  AND n_regs < 64
                 THEN 64.0 * ln(64.0 / (64 - n_regs))
                 ELSE {ALPHA * 64 * 64!r} / (sum_pow + (64 - n_regs))
            END AS e
          FROM dfold
        ), contrib AS (
          SELECT r.day + g.x * INTERVAL 1 DAY AS day, r.hll_idx, r.reg
          FROM regs r CROSS JOIN generate_series(0, 6) AS g(x)
        ), rolled AS (
          SELECT day, hll_idx, max(reg) AS reg FROM contrib
          WHERE day IN (SELECT day FROM regs)
          GROUP BY 1, 2
        ), rfold AS (
          SELECT day, count(*) AS n_regs, sum(2.0 ** (-reg)) AS sum_pow
          FROM rolled GROUP BY 1
        ), rest AS (
          SELECT day,
            CASE WHEN {ALPHA * 64 * 64!r} / (sum_pow + (64 - n_regs))
                      <= {2.5 * 64!r}
                  AND n_regs < 64
                 THEN 64.0 * ln(64.0 / (64 - n_regs))
                 ELSE {ALPHA * 64 * 64!r} / (sum_pow + (64 - n_regs))
            END AS e
          FROM rfold
        )
        SELECT d.day, round(d.e, 4) AS active_users_day,
               round(r.e, 4) AS active_users_roll
        FROM dest d JOIN rest r USING (day) ORDER BY day
        """,
        "doc_reservoir": """
        SELECT lang, doc_id, rk FROM (
          SELECT lang, doc_id,
                 CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY md5('res-v1|' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS BIGINT) AS rk
          FROM documents
        ) WHERE rk <= 10 ORDER BY lang, rk
        """,
        "emb_quantized_topk": _VEC_CTE
        + """
        , qv AS (
          SELECT vec_id, label,
            list_transform(emb, x -> CAST(round(
              x * (127.0 / list_max(list_transform(emb, y -> abs(y))))
            ) AS BIGINT)) AS qemb
          FROM e
        ), qn AS (
          SELECT vec_id, qemb,
            sqrt(CAST(list_sum(list_transform(qemb, x -> x * x)) AS DOUBLE))
              AS qnrm
          FROM qv
        ), q AS (
          SELECT vec_id AS q_id, qemb AS q_qemb, qnrm AS q_qnrm
          FROM qn WHERE vec_id < 5
        ), sims AS (
          SELECT q.q_id, v.vec_id,
            round(CAST(list_sum(list_transform(
                    list_zip(v.qemb, q.q_qemb), p -> p[1] * p[2]))
                  AS DOUBLE) / (v.qnrm * q.q_qnrm), 6) AS sim_q
          FROM qn v JOIN q ON v.vec_id <> q.q_id
        ), ranked AS (
          SELECT *, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY sim_q DESC, vec_id) AS BIGINT) AS rank
          FROM sims
        )
        SELECT q_id, vec_id, sim_q, rank
        FROM ranked WHERE rank <= 3 ORDER BY q_id, rank
        """,
        "doc_ngram_jaccard": XD.DOCS_NEARDUP_CTE
        + """
        , samp AS (SELECT * FROM docs WHERE doc_id % 4 = 0),
        """
        + _TOKS_CTE.format(src="samp")
        + ", "
        + _SHINGLES_CTE
        + """
        , ex0 AS (
          SELECT doc_id, unnest(shingles) AS s FROM sh
        ), rare AS (
          -- posting-list cap: identical stop-shingle removal to
          -- ngram_jaccard_pairs(max_posting=64)
          SELECT s FROM ex0 GROUP BY s HAVING count(DISTINCT doc_id) <= 64
        ), exk AS (
          SELECT doc_id, s FROM ex0 JOIN rare USING (s)
        ), sizes AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
          FROM exk GROUP BY doc_id
        ), ex AS (
          SELECT e.doc_id, e.s, z.n_sh FROM exk e JOIN sizes z USING (doc_id)
        ), inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS na, b.n_sh AS nb,
                 CAST(count(*) AS BIGINT) AS n_inter
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b,
               round(n_inter / (na + nb - n_inter), 6) AS jaccard
        FROM inter WHERE round(n_inter / (na + nb - n_inter), 6) >= 0.5
        """,
        "doc_simhash": "WITH "
        + _TOKS_CTE.format(src="documents")
        + f"""
        SELECT doc_id, CAST({_SIMHASH_EXPR} AS BIGINT) AS simhash
        FROM toks
        """,
        "doc_simhash_pairs": XD.DOCS_NEARDUP_CTE
        + """
        , samp AS (SELECT * FROM docs WHERE doc_id % 4 = 0),
        """
        + _TOKS_CTE.format(src="samp")
        + f"""
        , fp AS (
          SELECT doc_id, CAST({_SIMHASH_EXPR} AS BIGINT) AS simhash
          FROM toks
        ), halves AS (
          SELECT doc_id, simhash, 0 AS blk, simhash % 256 AS key FROM fp
          UNION ALL
          SELECT doc_id, simhash, 1, simhash // 256 FROM fp
        ), cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS fp_a, b.simhash AS fp_b
          FROM halves a JOIN halves b
            ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 1
        """,
        # --- similarity search ---
        "emb_cosine_topk": _VEC_CTE
        + f"""
        , q AS (
          SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm
          FROM n WHERE vec_id < 5
        ), sims AS (
          SELECT q_id, vec_id,
                 {_COS.format(a="q_emb", b="emb", na="q_nrm", nb="nrm")} AS sim
          FROM n, q WHERE vec_id <> q_id
        ), ranked AS (
          SELECT q_id, vec_id, sim,
                 CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, vec_id) AS BIGINT)
                   AS rank
          FROM sims
        )
        SELECT * FROM ranked WHERE rank <= 3
        """,
        "emb_ivf_topk": _VEC_CTE
        + f"""
        , c AS (
          SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm
          FROM n WHERE vec_id < 8
        ), asg AS (
          SELECT vec_id, emb, nrm, c_id,
                 {_COS.format(a="emb", b="c_emb", na="nrm", nb="c_nrm")} AS c_sim
          FROM n, c
        ), bucketed AS (
          SELECT vec_id, emb, nrm, c_id AS bucket
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS r
                FROM asg)
          WHERE r = 1
        ), q AS (
          SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm,
                 bucket AS q_bucket
          FROM bucketed WHERE vec_id >= 100 AND vec_id < 103
        ), sims AS (
          SELECT q_id, b.bucket, vec_id,
                 {_COS.format(a="q_emb", b="emb", na="q_nrm", nb="nrm")} AS sim
          FROM bucketed b, q
          WHERE b.bucket = q.q_bucket AND b.vec_id <> q.q_id
        ), ranked AS (
          SELECT q_id, bucket, vec_id, sim,
                 CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, vec_id) AS BIGINT)
                   AS rank
          FROM sims
        )
        SELECT * FROM ranked WHERE rank <= 3
        """,
        "emb_ivf_trained_topk": _VEC_CTE
        + _kmeans_ctes(k=8, iters=2, dim=64)
        + _IVF_TRAINED_RANKED
        + """
        SELECT * FROM ranked WHERE rank <= 3
        """,
        "ann_recall": _VEC_CTE
        + _kmeans_ctes(k=8, iters=2, dim=64)
        + _IVF_TRAINED_RANKED
        + f"""
        , approx AS (
          SELECT q_id, vec_id FROM ranked WHERE rank <= 3
        ), esims AS (
          SELECT q.q_id, v.vec_id,
                 {_COS.format(a="q_emb", b="emb", na="q_nrm", nb="nrm")} AS sim
          FROM n v, q
          WHERE v.vec_id <> q.q_id
        ), exact AS (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id,
                   row_number() OVER (
                     PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
            FROM esims
          ) WHERE rank <= 3
        )
        SELECT a.q_id,
               CAST(sum(CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_hits,
               CAST(sum(CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END)
                    AS DOUBLE) / 3.0 AS recall_at_k
        FROM approx a LEFT JOIN exact e
          ON a.q_id = e.q_id AND a.vec_id = e.vec_id
        GROUP BY 1 ORDER BY 1
        """,
        "ann_recall_curve": _VEC_CTE
        + _kmeans_ctes(k=8, iters=2, dim=64)
        + f"""
        , tc AS (
          SELECT cluster AS c_id, centroid AS c_emb,
                 sqrt(list_sum(list_transform(centroid, x -> x * x)))
                   AS c_nrm
          FROM c2
        ), asg AS (
          SELECT vec_id, emb, nrm, c_id,
                 {_COS.format(a="emb", b="c_emb", na="nrm", nb="c_nrm")} AS c_sim
          FROM n, tc
        ), bucketed AS (
          SELECT vec_id, emb, nrm, c_id AS bucket
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS r
                FROM asg)
          WHERE r = 1
        ), qv AS (
          SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm
          FROM n WHERE vec_id >= 100 AND vec_id < 103
        ), qasg AS (
          SELECT q_id, q_emb, q_nrm, c_id,
                 {_COS.format(a="q_emb", b="c_emb", na="q_nrm", nb="c_nrm")} AS c_sim
          FROM qv, tc
        ), probes AS (
          SELECT q_id, q_emb, q_nrm, c_id AS q_bucket, r AS probe_rank
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY q_id ORDER BY c_sim DESC, c_id) AS r
                FROM qasg)
          WHERE r <= 4
        ), cand AS (
          SELECT p.q_id, b.vec_id,
                 {_COS.format(a="q_emb", b="emb", na="q_nrm", nb="nrm")} AS sim,
                 p.probe_rank
          FROM bucketed b JOIN probes p
            ON b.bucket = p.q_bucket AND b.vec_id <> p.q_id
        ), grid AS (
          SELECT c.q_id, c.vec_id, c.sim, g.nprobe
          FROM cand c JOIN (SELECT unnest(range(1, 5)) AS nprobe) g
            ON g.nprobe >= c.probe_rank
        ), approx AS (
          SELECT q_id, nprobe, vec_id FROM (
            SELECT q_id, nprobe, vec_id,
                   row_number() OVER (PARTITION BY q_id, nprobe
                     ORDER BY sim DESC, vec_id) AS rank
            FROM grid) WHERE rank <= 3
        ), esims AS (
          SELECT q.q_id, v.vec_id,
                 {_COS.format(a="q_emb", b="emb", na="q_nrm", nb="nrm")} AS sim
          FROM n v, qv q WHERE v.vec_id <> q.q_id
        ), exact AS (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id,
                   row_number() OVER (
                     PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
            FROM esims
          ) WHERE rank <= 3
        )
        , hits AS (
          SELECT a.q_id, a.nprobe,
                 CAST(sum(CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END)
                      AS BIGINT) AS n_hits
          FROM approx a LEFT JOIN exact e
            ON a.q_id = e.q_id AND a.vec_id = e.vec_id
          GROUP BY 1, 2
        ), levels AS (
          SELECT q.q_id, g.nprobe
          FROM (SELECT q_id FROM qv) q,
               (SELECT unnest(range(1, 5)) AS nprobe) g
        )
        SELECT l.q_id, CAST(l.nprobe AS BIGINT) AS nprobe,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 3.0 AS recall_at_k
        FROM levels l LEFT JOIN hits h
          ON l.q_id = h.q_id AND l.nprobe = h.nprobe
        ORDER BY 1, 2
        """,
        "emb_pq_topk": _VEC_CTE
        + _pq_ctes(m=4, k=16, iters=2, dim=64)
        + """
        , q AS (
          SELECT vec_id AS q_id, emb FROM n WHERE vec_id < 5
        ), qsliced AS (
          SELECT q_id, 0 AS subspace, emb[1:16] AS qsub FROM q
          UNION ALL SELECT q_id, 1, emb[17:32] FROM q
          UNION ALL SELECT q_id, 2, emb[33:48] FROM q
          UNION ALL SELECT q_id, 3, emb[49:64] FROM q
        ), lut AS (
          SELECT q_id, b.subspace, b.cluster AS code,
                 round(list_sum(list_transform(list_zip(s.qsub, b.centroid),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS sub_d
          FROM qsliced s JOIN books b ON s.subspace = b.subspace
        ), dists AS (
          SELECT q_id, vec_id, round(sum(sub_d), 6) AS approx_d
          FROM enc e JOIN lut l
            ON e.subspace = l.subspace AND e.code = l.code
          WHERE e.vec_id <> l.q_id
          GROUP BY q_id, vec_id
          HAVING count(*) = 4
        ), ranked AS (
          SELECT q_id, vec_id, approx_d,
                 CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY approx_d ASC, vec_id ASC) AS BIGINT) AS rank
          FROM dists
        )
        SELECT * FROM ranked WHERE rank <= 10
        """,
        "emb_ivf_pq_topk": _VEC_CTE
        + _kmeans_ctes(k=8, iters=2, dim=64)
        + _pq_ctes(m=4, k=16, iters=2, dim=64)
        + f"""
        , tc AS (
          SELECT cluster AS c_id, centroid AS c_emb,
                 sqrt(list_sum(list_transform(centroid, x -> x * x)))
                   AS c_nrm
          FROM c2
        ), asg AS (
          SELECT vec_id,
                 c_id,
                 {_L2D.format(a="emb", b="c_emb")}
                   AS c_d
          FROM n, tc
        ), bucketed AS (
          SELECT vec_id, c_id AS bucket
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY c_d ASC, c_id) AS r
                FROM asg)
          WHERE r = 1
        ), qv AS (
          SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm
          FROM n WHERE vec_id >= 100 AND vec_id < 103
        ), qasg AS (
          SELECT q_id, c_id,
                 {_L2D.format(a="q_emb", b="c_emb")}
                   AS c_d
          FROM qv, tc
        ), probes AS (
          SELECT q_id, c_id AS q_bucket
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY q_id ORDER BY c_d ASC, c_id) AS r
                FROM qasg)
          WHERE r <= 2
        ), cand AS (
          SELECT p.q_id, b.vec_id
          FROM probes p JOIN bucketed b ON b.bucket = p.q_bucket
          WHERE b.vec_id <> p.q_id
        ), qsliced AS (
          SELECT q_id, 0 AS subspace, q_emb[1:16] AS qsub FROM qv
          UNION ALL SELECT q_id, 1, q_emb[17:32] FROM qv
          UNION ALL SELECT q_id, 2, q_emb[33:48] FROM qv
          UNION ALL SELECT q_id, 3, q_emb[49:64] FROM qv
        ), lut AS (
          SELECT q_id, b.subspace, b.cluster AS code,
                 round(list_sum(list_transform(list_zip(s.qsub, b.centroid),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS sub_d
          FROM qsliced s JOIN books b ON s.subspace = b.subspace
        ), dists AS (
          SELECT c.q_id, c.vec_id, round(sum(l.sub_d), 6) AS approx_d
          FROM cand c
          JOIN enc e ON e.vec_id = c.vec_id
          JOIN lut l
            ON l.q_id = c.q_id AND l.subspace = e.subspace
           AND l.code = e.code
          GROUP BY c.q_id, c.vec_id
          HAVING count(*) = 4
        ), ranked AS (
          SELECT q_id, vec_id, approx_d,
                 CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY approx_d ASC, vec_id ASC) AS BIGINT) AS rank
          FROM dists
        )
        SELECT * FROM ranked WHERE rank <= 10
        """,
        "emb_ivfadc_topk": _VEC_CTE
        + _kmeans_ctes(k=8, iters=2, dim=64)
        + f"""
        , tc AS (
          SELECT cluster AS c_id, centroid AS c_emb,
                 sqrt(list_sum(list_transform(centroid, x -> x * x)))
                   AS c_nrm
          FROM c2
        ), asg AS (
          SELECT vec_id, c_id,
                 {_L2D.format(a="emb", b="c_emb")}
                   AS c_d
          FROM n, tc
        ), bucketed AS (
          SELECT vec_id, c_id AS bucket
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY c_d ASC, c_id) AS r
                FROM asg)
          WHERE r = 1
        ), cb AS (
          SELECT cluster AS bucket, centroid AS bc_emb FROM c2
        ), rn AS (
          SELECT b.vec_id, b.bucket,
                 list_transform(list_zip(n.emb, cb.bc_emb),
                   p -> p[1] - p[2]) AS emb
          FROM bucketed b
          JOIN n USING (vec_id)
          JOIN cb USING (bucket)
        )"""
        + _pq_ctes(m=4, k=16, iters=2, dim=64, src="rn")
        + f"""
        , qv AS (
          SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm
          FROM n WHERE vec_id >= 100 AND vec_id < 103
        ), qasg AS (
          SELECT q_id, c_id,
                 {_L2D.format(a="q_emb", b="c_emb")}
                   AS c_d
          FROM qv, tc
        ), probes AS (
          SELECT q_id, c_id AS q_bucket
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY q_id ORDER BY c_d ASC, c_id) AS r
                FROM qasg)
          WHERE r <= 2
        ), qres AS (
          SELECT p.q_id, p.q_bucket,
                 list_transform(list_zip(q.q_emb, cb.bc_emb),
                   t -> t[1] - t[2]) AS qres_emb
          FROM probes p
          JOIN qv q USING (q_id)
          JOIN cb ON cb.bucket = p.q_bucket
        ), qsliced AS (
          SELECT q_id, q_bucket, 0 AS subspace, qres_emb[1:16] AS qsub
          FROM qres
          UNION ALL SELECT q_id, q_bucket, 1, qres_emb[17:32] FROM qres
          UNION ALL SELECT q_id, q_bucket, 2, qres_emb[33:48] FROM qres
          UNION ALL SELECT q_id, q_bucket, 3, qres_emb[49:64] FROM qres
        ), lut AS (
          SELECT q_id, q_bucket, b.subspace, b.cluster AS code,
                 round(list_sum(list_transform(list_zip(s.qsub, b.centroid),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS sub_d
          FROM qsliced s JOIN books b ON s.subspace = b.subspace
        ), cand AS (
          SELECT p.q_id, p.q_bucket, b.vec_id
          FROM probes p JOIN bucketed b ON b.bucket = p.q_bucket
          WHERE b.vec_id <> p.q_id
        ), dists AS (
          SELECT c.q_id, c.vec_id, round(sum(l.sub_d), 6) AS approx_d
          FROM cand c
          JOIN enc e ON e.vec_id = c.vec_id
          JOIN lut l
            ON l.q_id = c.q_id AND l.q_bucket = c.q_bucket
           AND l.subspace = e.subspace AND l.code = e.code
          GROUP BY c.q_id, c.vec_id
          HAVING count(*) = 4
        ), ranked AS (
          SELECT q_id, vec_id, approx_d,
                 CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY approx_d ASC, vec_id ASC) AS BIGINT) AS rank
          FROM dists
        )
        SELECT * FROM ranked WHERE rank <= 10
        """,
        "emb_semdedup": _VEC_CTE
        + _kmeans_ctes(k=8, iters=2, dim=64)
        + f"""
        , tc AS (
          SELECT cluster AS c_id, centroid AS c_emb,
                 sqrt(list_sum(list_transform(centroid, x -> x * x)))
                   AS c_nrm
          FROM c2
        ), pl AS (
          SELECT vec_id + 1000000 AS vec_id, label, emb, nrm
          FROM n WHERE vec_id % 50 = 0
        ), corpus AS (
          SELECT vec_id, emb, nrm FROM n
          UNION ALL SELECT vec_id, emb, nrm FROM pl
        ), asg AS (
          SELECT vec_id, emb, nrm, c_id,
                 {_COS.format(a="emb", b="c_emb", na="nrm", nb="c_nrm")}
                   AS c_sim
          FROM corpus, tc
        ), bucketed AS (
          SELECT vec_id, emb, nrm, c_id AS bucket
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS r
                FROM asg)
          WHERE r = 1
        ), pairs AS (
          SELECT b.vec_id AS vec_b,
                 {_COS.format(a="a.emb", b="b.emb", na="a.nrm", nb="b.nrm")}
                   AS sim
          FROM bucketed a JOIN bucketed b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        ), dropped AS (
          SELECT DISTINCT vec_b AS vec_id FROM pairs WHERE sim >= 0.95
        )
        SELECT b.vec_id, CAST(b.bucket AS INTEGER) AS cluster,
               (d.vec_id IS NULL) AS kept
        FROM bucketed b LEFT JOIN dropped d USING (vec_id)
        ORDER BY b.vec_id
        """,
        "emb_neardup": _VEC_CTE
        + f"""
        , planted AS (
          SELECT vec_id + 1000000 AS vec_id, emb, nrm
          FROM n WHERE vec_id % 50 = 0
        ), corpus AS (
          SELECT vec_id, emb, nrm FROM n
          UNION ALL SELECT vec_id, emb, nrm FROM planted
        ), samp AS (
          SELECT * FROM corpus WHERE vec_id % 5 = 0
        ), bands AS (
          -- coordinate-sign LSH banding, identical to
          -- ext/similarity.py:sign_lsh_bands (8 bands x 8 dims)
          SELECT vec_id, band, string_agg(bit, '' ORDER BY idx) AS key
          FROM (
            SELECT vec_id, CAST((i - 1) // 8 AS INT) AS band, i AS idx,
                   CASE WHEN emb[i] >= 0 THEN '1' ELSE '0' END AS bit
            FROM samp, range(1, 65) t(i)
          )
          GROUP BY vec_id, band
        ), cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
        ), pairs AS (
          SELECT vec_a, vec_b,
                 {_COS.format(a="a.emb", b="b.emb", na="a.nrm", nb="b.nrm")}
                   AS sim
          FROM cand
          JOIN samp a ON a.vec_id = cand.vec_a
          JOIN samp b ON b.vec_id = cand.vec_b
        )
        SELECT * FROM pairs WHERE sim >= 0.99
        """,
        # --- multimodal ---
        "multimodal_features": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               round((octet_length(encode(text)) % 256) / 255.0, 6)
                 AS fake_feature
        FROM documents
        """,
        "multimodal_frames": """
        SELECT doc_id AS media_id, i AS frame_idx,
               md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64))
                 AS frame_md5,
               round(ascii(substr(text, CAST(i * 64 + 1 AS INTEGER), 1))
                 / 255.0, 6) AS f0
        FROM documents,
             unnest(range(0, CAST(floor(length(text) / 64) AS BIGINT), 4))
               AS t(i)
        ORDER BY media_id, frame_idx
        """,
        # header parse round-trip: Spark PARSES width/height/channels/
        # rate back out of the synthesized PNG/JPEG/WAV bytes; the twin
        # recomputes what the generator EMBEDDED from doc_id and the
        # text byte length — agreement proves the parser recovered
        # every field bit-exactly (ext/multimodal.synthetic_media
        # formulas, mirrored verbatim)
        "multimodal_headers": """
        WITH m AS (
          SELECT doc_id, octet_length(encode(text)) AS n_text,
                 4 + doc_id % 61 AS bw,
                 CASE WHEN (doc_id // 4) % 2 = 0 THEN 1 ELSE 3 END
                   AS pch
          FROM documents
        ), m2 AS (
          SELECT doc_id, n_text, bw, pch,
                 bw * 3 + (4 - (bw * 3) % 4) % 4 AS bstride
          FROM m
        )
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 16 = 1 THEN 'gif'
                    WHEN doc_id % 16 = 3 THEN 'bmp'
                    WHEN doc_id % 2 = 1 THEN 'wav'
                    WHEN doc_id % 4 = 0 THEN 'png'
                    ELSE 'jpeg' END AS kind,
               CASE WHEN doc_id % 16 = 1
                    THEN CAST(16 + doc_id % 401 AS BIGINT)
                    WHEN doc_id % 16 = 3 THEN CAST(bw AS BIGINT)
                    WHEN doc_id % 4 = 0
                    THEN CAST(16 + doc_id % 317 AS BIGINT)
                    WHEN doc_id % 4 = 2
                    THEN CAST(8 * (2 + doc_id % 60) AS BIGINT)
                 END AS width,
               CASE WHEN doc_id % 16 = 1
                    THEN CAST(16 + (doc_id * 13) % 257 AS BIGINT)
                    WHEN doc_id % 16 = 3
                    THEN CAST(1 + n_text // bstride AS BIGINT)
                    WHEN doc_id % 4 = 0
                    THEN CAST(1 + n_text // ((16 + doc_id % 317) * pch)
                              AS BIGINT)
                    WHEN doc_id % 4 = 2
                    THEN CAST(8 * (1 + n_text // (2 + doc_id % 60))
                              AS BIGINT)
                 END AS height,
               CASE WHEN doc_id % 16 = 1 THEN CAST(1 AS BIGINT)
                    WHEN doc_id % 16 = 3 THEN CAST(3 AS BIGINT)
                    WHEN doc_id % 4 = 0 THEN CAST(pch AS BIGINT)
                    WHEN doc_id % 4 = 2 THEN CAST(1 AS BIGINT)
                    ELSE CAST(1 + (doc_id // 2) % 2 AS BIGINT)
                 END AS channels,
               CASE WHEN doc_id % 16 = 1
                    THEN CAST(1 + (doc_id // 16) % 8 AS BIGINT)
                    WHEN doc_id % 16 = 3 THEN CAST(8 AS BIGINT)
                    WHEN doc_id % 2 = 0 THEN CAST(8 AS BIGINT)
                    ELSE CAST(16 AS BIGINT) END AS bit_depth,
               CASE WHEN doc_id % 2 = 1 AND doc_id % 16 NOT IN (1, 3)
                 THEN CAST(
                 CASE (doc_id // 2) % 4 WHEN 0 THEN 8000
                   WHEN 1 THEN 16000 WHEN 2 THEN 22050
                   ELSE 44100 END AS BIGINT) END AS sample_rate,
               CASE WHEN doc_id % 2 = 1 AND doc_id % 16 NOT IN (1, 3)
                 THEN CAST(
                 (n_text
                  + (2 * (1 + (doc_id // 2) % 2)
                     - n_text % (2 * (1 + (doc_id // 2) % 2)))
                    % (2 * (1 + (doc_id // 2) % 2)))
                 // (2 * (1 + (doc_id // 2) % 2)) AS BIGINT)
                 END AS n_samples
        FROM m2 ORDER BY media_id
        """,
        # payload-decode round-trip (VERDICT r13 #2): Spark DECODES
        # the WAV PCM16 samples / BMP pixel rows back out of the raw
        # bytes (RIFF walk + <i2 frames; stride-aware pixel
        # extraction); the twin recomputes the identical exact-integer
        # statistics from the text bytes the generator embedded.  The
        # corpus is all-ASCII, so every int16 high byte is < 0x80 and
        # the twin's unsigned b0 + 256*b1 equals the signed decode.
        "multimodal_samples": """
        WITH wavdoc AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n_text,
                 2 * (1 + (doc_id // 2) % 2) AS block
          FROM documents
          WHERE doc_id % 2 = 1 AND doc_id % 16 NOT IN (1, 3)
        ), wavsz AS (
          SELECT doc_id, text, n_text,
                 n_text + (block - n_text % block) % block AS data_len
          FROM wavdoc
        ), wavsamp AS (
          SELECT doc_id,
                 CASE WHEN 2 * i < n_text
                      THEN ascii(substr(text, CAST(2 * i + 1 AS INTEGER), 1))
                      ELSE 0 END
                 + 256 * CASE WHEN 2 * i + 1 < n_text
                      THEN ascii(substr(text, CAST(2 * i + 2 AS INTEGER), 1))
                      ELSE 0 END AS v
          FROM wavsz, unnest(range(0, data_len // 2)) AS t(i)
        ), wavstat AS (
          SELECT doc_id AS media_id, 'wav' AS kind,
                 CAST(count(*) AS BIGINT) AS n_values,
                 CAST(sum(v) AS BIGINT) AS sum_val,
                 CAST(sum(v * v) AS BIGINT) AS sum_sq,
                 CAST(max(v) AS BIGINT) AS peak
          FROM wavsamp GROUP BY doc_id
        ), bmpdoc AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n_text,
                 4 + doc_id % 61 AS bw
          FROM documents WHERE doc_id % 16 = 3
        ), bmpsz AS (
          SELECT doc_id, text, n_text, bw, bw * 3 AS rowbytes,
                 bw * 3 + (4 - (bw * 3) % 4) % 4 AS stride
          FROM bmpdoc
        ), bmpdim AS (
          SELECT doc_id, text, n_text, bw, rowbytes, stride,
                 1 + n_text // stride AS bh
          FROM bmpsz
        ), bmppix AS (
          SELECT doc_id,
                 CASE WHEN (p // rowbytes) * stride + p % rowbytes
                           < n_text
                      THEN ascii(substr(text,
                        CAST((p // rowbytes) * stride + p % rowbytes
                             + 1 AS INTEGER), 1))
                      ELSE 0 END AS v
          FROM bmpdim, unnest(range(0, bw * bh * 3)) AS t(p)
        ), bmpstat AS (
          SELECT doc_id AS media_id, 'bmp' AS kind,
                 CAST(count(*) AS BIGINT) AS n_values,
                 CAST(sum(v) AS BIGINT) AS sum_val,
                 CAST(sum(v * v) AS BIGINT) AS sum_sq,
                 CAST(max(v) AS BIGINT) AS peak
          FROM bmppix GROUP BY doc_id
        )
        SELECT * FROM wavstat
        UNION ALL SELECT * FROM bmpstat
        ORDER BY media_id
        """,
        # compressed-payload round-trip (r14): Spark builds a REAL
        # PNG (filtered scanlines in a genuine zlib stream, stored
        # DEFLATE blocks + JVM-computed Adler-32), then decodes it
        # back with stdlib zlib.decompress + five-filter
        # unfiltering.  The twin recomputes the identical
        # exact-integer pixel statistics straight from the text
        # bytes the generator turned into pixels (zero-padded to
        # whole scanlines; padding contributes count but not sums) —
        # a wrong Sub/Up reconstruction, a bad stored-block layout
        # or a checksum slip anywhere breaks the match.
        "multimodal_png_pixels": """
        WITH p AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n_text,
                 (16 + doc_id % 317)
                   * CASE WHEN (doc_id // 4) % 2 = 0 THEN 1 ELSE 3 END
                   AS rb
          FROM documents WHERE doc_id % 4 = 0
        ), dim AS (
          SELECT doc_id, text, n_text, rb,
                 1 + n_text // rb AS h
          FROM p
        ), px AS (
          SELECT doc_id, ascii(substr(text, CAST(i AS INTEGER), 1)) AS v
          FROM dim, unnest(range(1, n_text + 1)) AS t(i)
        )
        SELECT d.doc_id AS media_id, 'png' AS kind,
               CAST(d.h * d.rb AS BIGINT) AS n_values,
               CAST(coalesce(sum(px.v), 0) AS BIGINT) AS sum_val,
               CAST(coalesce(sum(px.v * px.v), 0) AS BIGINT) AS sum_sq,
               CAST(greatest(coalesce(max(px.v), 0), 0) AS BIGINT)
                 AS peak
        FROM dim d LEFT JOIN px ON px.doc_id = d.doc_id
        GROUP BY d.doc_id, d.h, d.rb
        ORDER BY media_id
        """,
        # LZW round-trip (r14): Spark builds a spec-conforming GIF
        # (global colour table, image descriptor, LZW code stream at
        # minimum code size 7 with CLEAR-bounded literal runs) and
        # decodes it back with a general pure-Python LZW decoder.
        # Pixels are text bytes mod 128, truncated or zero-padded to
        # width*height; the twin mirrors that arithmetic exactly
        # (padding contributes count but not sums; when the image is
        # smaller than the text, only the leading bytes count).
        "multimodal_gif_pixels": """
        WITH g AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n_text,
                 (16 + doc_id % 401) * (16 + (doc_id * 13) % 257)
                   AS npix
          FROM documents WHERE doc_id % 16 = 1
        ), dim AS (
          SELECT doc_id, text, npix,
                 least(n_text, npix) AS ntx
          FROM g
        ), px AS (
          SELECT doc_id,
                 ascii(substr(text, CAST(i AS INTEGER), 1)) % 128 AS v
          FROM dim, unnest(range(1, ntx + 1)) AS t(i)
        )
        SELECT d.doc_id AS media_id, 'gif' AS kind,
               CAST(d.npix AS BIGINT) AS n_values,
               CAST(coalesce(sum(px.v), 0) AS BIGINT) AS sum_val,
               CAST(coalesce(sum(px.v * px.v), 0) AS BIGINT) AS sum_sq,
               CAST(CASE WHEN d.npix > d.ntx
                         THEN greatest(coalesce(max(px.v), 0), 0)
                         ELSE coalesce(max(px.v), 0) END AS BIGINT)
                 AS peak
        FROM dim d LEFT JOIN px ON px.doc_id = d.doc_id
        GROUP BY d.doc_id, d.npix, d.ntx
        ORDER BY media_id
        """,
        # entropy-coding round-trip (r14): Spark builds a COMPLETE
        # baseline JPEG (custom all-8-bit Huffman tables, DC-only
        # 8x8 tiles at restart interval 1, q0=8 for integer-exact
        # IDCT) and decodes it back with a general pure-Python
        # baseline decoder (canonical Huffman, restart segments, DC
        # prediction, dequant, real 2-D IDCT).  Each tile decodes to
        # exactly its source text byte, so the twin's statistics are
        # 64x the per-byte statistics (padding tiles decode to 0 —
        # count-only).  A wrong Huffman assignment, bit order,
        # predictor, dequant or IDCT anywhere breaks the match.
        "multimodal_jpeg_pixels": """
        WITH j AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n_text,
                 2 + doc_id % 60 AS tpr
          FROM documents WHERE doc_id % 4 = 2
        ), dim AS (
          SELECT doc_id, text, n_text, tpr,
                 1 + n_text // tpr AS tr
          FROM j
        ), px AS (
          SELECT doc_id, ascii(substr(text, CAST(i AS INTEGER), 1)) AS v
          FROM dim, unnest(range(1, n_text + 1)) AS t(i)
        )
        SELECT d.doc_id AS media_id, 'jpeg' AS kind,
               CAST(64 * d.tpr * d.tr AS BIGINT) AS n_values,
               CAST(64 * coalesce(sum(px.v), 0) AS BIGINT) AS sum_val,
               CAST(64 * coalesce(sum(px.v * px.v), 0) AS BIGINT)
                 AS sum_sq,
               CAST(greatest(coalesce(max(px.v), 0), 0) AS BIGINT)
                 AS peak
        FROM dim d LEFT JOIN px ON px.doc_id = d.doc_id
        GROUP BY d.doc_id, d.tpr, d.tr
        ORDER BY media_id
        """,
        "candles_1m": CANDLES_CTE + "SELECT * FROM candles",
        "dedup_latest": CANDLES_DUP_CTE
        + """
        SELECT exchange, symbol, "interval", start, stop, close_unixtime,
               trades, open, high, low, close, volume, timestamp,
               receipt_timestamp
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY exchange, symbol, start, "interval"
                   ORDER BY receipt_timestamp DESC, close DESC, volume DESC
                 ) AS rn
          FROM candles_dup
        ) WHERE rn = 1
        """,
        "rollup_5m": CANDLES_CTE
        + f"""
        SELECT exchange, symbol,
               time_bucket(INTERVAL '5 minutes', start) AS candle_start,
               {_ROLLUP_AGG}
        FROM candles GROUP BY 1, 2, 3
        """,
        "cascade_15m": CANDLES_CTE
        + f"""
        SELECT exchange, symbol,
               time_bucket(INTERVAL '15 minutes', start) AS candle_start,
               {_ROLLUP_AGG}
        FROM candles GROUP BY 1, 2, 3
        """,
        "earliest_per_symbol": CANDLES_CTE
        + """
        SELECT symbol, min(start) AS earliest_start
        FROM candles WHERE exchange = 'EXCH_A' AND "interval" = '1m'
        GROUP BY symbol
        """,
        "minmax_window": CANDLES_CTE
        + """
        SELECT min(start) AS min_start, max(start) AS max_start
        FROM candles WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
        """,
        "count_distinct_window": CANDLES_CTE
        + """
        SELECT CAST(count(DISTINCT start) AS BIGINT) AS n_candles
        FROM candles
        WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
          AND start >= TIMESTAMP '2024-01-05 00:00:00'
          AND start <  TIMESTAMP '2024-01-12 00:00:00'
        """,
        "latest_per_symbol": CANDLES_CTE
        + """
        SELECT exchange, symbol, "interval", start, stop, close_unixtime,
               trades, open, high, low, close, volume, timestamp,
               receipt_timestamp
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY symbol
                   ORDER BY stop DESC, exchange DESC
                 ) AS rn
          FROM candles
        ) WHERE rn = 1
        """,
        "distinct_pairs": CANDLES_CTE
        + "SELECT DISTINCT exchange, symbol FROM candles",
        "recent_topn": CANDLES_CTE
        + """
        SELECT symbol, start, open, high, low, close, volume
        FROM (
          SELECT * FROM candles
          WHERE exchange = 'EXCH_A' AND symbol = 'SYM0' AND "interval" = '1m'
          ORDER BY start DESC LIMIT 200
        ) ORDER BY start
        """,
        "symbol_filter": CANDLES_CTE
        + """
        SELECT DISTINCT symbol FROM candles
        WHERE symbol LIKE '%SYM%' AND symbol NOT IN ('SYM3')
        ORDER BY symbol
        """,
        "readme_window": CANDLES_CTE
        + """
        SELECT symbol, start, open, high, low, close, volume
        FROM candles, (SELECT max(start) AS now_ts FROM candles)
        WHERE symbol IN ('SYM0', 'SYM1')
          AND start >= now_ts - INTERVAL 6 HOUR
        ORDER BY symbol, start
        """,
        "freshness": CANDLES_CTE
        + """
        SELECT symbol, latest_stop,
               CAST(epoch(now_ts) - epoch(latest_stop) AS BIGINT) AS lag_seconds,
               (epoch(now_ts) - epoch(latest_stop)) > 120 AS is_stale
        FROM (SELECT symbol, max(stop) AS latest_stop FROM candles GROUP BY symbol),
             (SELECT max(stop) AS now_ts FROM candles)
        ORDER BY symbol
        """,
        "listing_diff": CANDLES_CTE
        + """
        , known AS (
            SELECT DISTINCT exchange, symbol FROM candles
            WHERE start < TIMESTAMP '2024-01-30 23:00:00'
        ), current_set AS (
            SELECT DISTINCT exchange, symbol FROM candles
            WHERE start >= TIMESTAMP '2024-01-30 23:00:00'
        )
        SELECT exchange, symbol, 'added' AS change
        FROM (SELECT * FROM current_set EXCEPT SELECT * FROM known)
        UNION ALL
        SELECT exchange, symbol, 'delisted' AS change
        FROM (SELECT * FROM known EXCEPT SELECT * FROM current_set)
        """,
        "price_quantile_sketch": CANDLES_CTE
        + """
        , rng AS (
            SELECT symbol, min(close) AS vmin, max(close) AS vmax,
                   CAST(count(close) AS BIGINT) AS n
            FROM candles GROUP BY symbol),
        b AS (
            SELECT c.symbol, vmin, vmax, n,
              CAST(CASE WHEN vmax = vmin THEN 0
                   ELSE least(CAST(floor((close - vmin) / (vmax - vmin)
                                   * 1024) AS BIGINT), 1023)
                   END AS BIGINT) AS bin
            FROM candles c JOIN rng ON c.symbol = rng.symbol),
        bc AS (
            SELECT symbol, vmin, vmax, n, bin,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM b GROUP BY 1, 2, 3, 4, 5),
        cum AS (
            SELECT *, sum(cnt) OVER (PARTITION BY symbol ORDER BY bin)
                   AS cum FROM bc),
        hit AS (
            SELECT symbol, vmin, vmax, n,
              min(CASE WHEN cum >= 0.5  * n THEN bin END) AS b50,
              min(CASE WHEN cum >= 0.95 * n THEN bin END) AS b95,
              min(CASE WHEN cum >= 0.99 * n THEN bin END) AS b99
            FROM cum GROUP BY 1, 2, 3, 4)
        SELECT symbol,
          round(vmin + (b50 + 1) * (vmax - vmin) / 1024.0, 6) AS p50_est,
          round(vmin + (b95 + 1) * (vmax - vmin) / 1024.0, 6) AS p95_est,
          round(vmin + (b99 + 1) * (vmax - vmin) / 1024.0, 6) AS p99_est,
          n
        FROM hit ORDER BY symbol
        """,
        "listing_stable": CANDLES_CTE
        + """
        SELECT exchange, symbol FROM candles
        WHERE start < TIMESTAMP '2024-01-30 23:00:00'
        INTERSECT
        SELECT exchange, symbol FROM candles
        WHERE start >= TIMESTAMP '2024-01-30 23:00:00'
        ORDER BY 1, 2
        """,
        "gap_filled": CANDLES_CTE
        + """
        , week AS (
            SELECT * FROM candles
            WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
              AND start >= TIMESTAMP '2024-01-08 00:00:00'
              AND start <  TIMESTAMP '2024-01-15 00:00:00'
        ), bounds AS (
            SELECT exchange, symbol, min(start) AS lo, max(start) AS hi
            FROM week GROUP BY 1, 2
        ), grid AS (
            SELECT exchange, symbol,
                   unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS start
            FROM bounds
        )
        SELECT g.exchange, g.symbol, g.start,
               w.open, w.high, w.low, w.close, w.volume, w.trades,
               (w.close IS NULL) AS is_gap
        FROM grid g LEFT JOIN week w
          ON g.exchange = w.exchange AND g.symbol = w.symbol
         AND g.start = w.start
        """,
        "gap_filled_ffill": CANDLES_CTE
        + """
        , week AS (
            SELECT * FROM candles
            WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
              AND start >= TIMESTAMP '2024-01-08 00:00:00'
              AND start <  TIMESTAMP '2024-01-15 00:00:00'
        ), bounds AS (
            SELECT exchange, symbol, min(start) AS lo, max(start) AS hi
            FROM week GROUP BY 1, 2
        ), grid AS (
            SELECT exchange, symbol,
                   unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS start
            FROM bounds
        ), joined AS (
            SELECT g.exchange, g.symbol, g.start, w.close,
                   (w.close IS NULL) AS is_gap
            FROM grid g LEFT JOIN week w
              ON g.exchange = w.exchange AND g.symbol = w.symbol
             AND g.start = w.start
        )
        SELECT *, last_value(close IGNORE NULLS) OVER (
                 PARTITION BY exchange, symbol ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS close_ffill
        FROM joined
        """,
        "gap_filled_interp": CANDLES_CTE
        + """
        , week AS (
            SELECT * FROM candles
            WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
              AND start >= TIMESTAMP '2024-01-08 00:00:00'
              AND start <  TIMESTAMP '2024-01-15 00:00:00'
        ), bounds AS (
            SELECT exchange, symbol, min(start) AS lo, max(start) AS hi
            FROM week GROUP BY 1, 2
        ), grid AS (
            SELECT exchange, symbol,
                   unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS start
            FROM bounds
        ), joined AS (
            SELECT g.exchange, g.symbol, g.start, w.close,
                   (w.close IS NULL) AS is_gap
            FROM grid g LEFT JOIN week w
              ON g.exchange = w.exchange AND g.symbol = w.symbol
             AND g.start = w.start
        ), brackets AS (
            SELECT *,
              last_value(CASE WHEN NOT is_gap THEN close END IGNORE NULLS)
                OVER wp AS prev_c,
              last_value(CASE WHEN NOT is_gap
                  THEN CAST(epoch(start) AS BIGINT) END IGNORE NULLS)
                OVER wp AS prev_t,
              first_value(CASE WHEN NOT is_gap THEN close END IGNORE NULLS)
                OVER wn AS next_c,
              first_value(CASE WHEN NOT is_gap
                  THEN CAST(epoch(start) AS BIGINT) END IGNORE NULLS)
                OVER wn AS next_t
            FROM joined
            WINDOW wp AS (PARTITION BY exchange, symbol ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wn AS (PARTITION BY exchange, symbol ORDER BY start
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT exchange, symbol, start, close, is_gap,
          CASE WHEN NOT is_gap THEN close
               WHEN prev_c IS NULL THEN next_c
               WHEN next_c IS NULL THEN prev_c
               ELSE prev_c + (next_c - prev_c)
                    * (CAST(CAST(epoch(start) AS BIGINT) - prev_t AS DOUBLE)
                       / CAST(next_t - prev_t AS DOUBLE)) END
            AS close_interp
        FROM brackets
        """,
        "sma_20": CANDLES_CTE
        + """
        SELECT exchange, symbol, start, close,
               round(avg(close) OVER w, 6) AS sma_20,
               CAST(count(*) OVER w AS BIGINT) AS n_in_frame
        FROM candles
        WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        """,
        "pivot_volume": CANDLES_CTE
        + "SELECT exchange, date_trunc('day', start) AS day,\n"
        + ",\n".join(
            f"""          CAST(sum(CASE WHEN symbol = '{s}'
            THEN CAST(round(volume, 6) AS DECIMAL(28,6)) END) AS DOUBLE)
            AS "{s}\"""" for s in _SYMBOLS
        )
        + """
        FROM candles GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "volume_rollup_sets": CANDLES_CTE
        + """
        SELECT coalesce(exchange, 'ALL') AS exchange,
               coalesce(symbol, 'ALL') AS symbol,
               CAST(sum(CAST(round(volume, 6) AS DECIMAL(28,6))) AS DOUBLE)
                 AS total_volume,
               CAST(count(*) AS BIGINT) AS n_candles
        FROM candles
        GROUP BY ROLLUP(exchange, symbol)
        ORDER BY 1, 2
        """,
        "volume_cube_sets": CANDLES_CTE
        + """
        SELECT coalesce(symbol, 'ALL') AS symbol,
               coalesce(strftime(date_trunc('month', start), '%Y-%m'), 'ALL')
                 AS month,
               CAST(sum(CAST(round(volume, 6) AS DECIMAL(28,6))) AS DOUBLE)
                 AS total_volume,
               CAST(count(*) AS BIGINT) AS n_candles
        FROM candles
        GROUP BY CUBE(symbol, date_trunc('month', start))
        ORDER BY 1, 2
        """,
        "max_drawdown": CANDLES_CTE
        + """
        , dd AS (
          SELECT exchange, symbol, close,
                 close / max(close) OVER (
                   PARTITION BY exchange, symbol ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1.0
                   AS dd
          FROM candles)
        SELECT exchange, symbol,
               round(min(dd), 6) AS max_drawdown,
               round(max(close), 6) AS peak_close
        FROM dd GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_volume_per_symbol": CANDLES_CTE
        + """
        , rk AS (
          SELECT exchange, symbol,
                 CAST(row_number() OVER (
                   PARTITION BY exchange, symbol
                   ORDER BY round(volume, 6) DESC, start ASC) AS BIGINT)
                   AS rk,
                 round(volume, 6) AS volume, start, round(close, 6) AS close
          FROM candles)
        SELECT * FROM rk WHERE rk <= 5 ORDER BY exchange, symbol, rk
        """,
        "bollinger_20": CANDLES_CTE
        + """
        , base AS (
          SELECT exchange, symbol, start, close,
                 CAST(round(close, 2) AS DECIMAL(12,2)) AS c2
          FROM candles
        ), stats AS (
          SELECT exchange, symbol, start, close,
                 CAST(count(*) OVER w AS BIGINT) AS n_in_frame,
                 CAST(sum(c2) OVER w AS DOUBLE) AS s1,
                 CAST(sum(CAST(c2 * c2 AS DECIMAL(24,4))) OVER w AS DOUBLE)
                   AS s2
          FROM base
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        ), m AS (
          SELECT *, s1 / n_in_frame AS m1,
                 sqrt(greatest(
                   s2 / n_in_frame - (s1 / n_in_frame) * (s1 / n_in_frame),
                   0.0)) AS sd
          FROM stats
        )
        SELECT exchange, symbol, start, close,
               round(m1, 6) AS bb_mid,
               round(m1 + 2.0 * sd, 6) AS bb_upper,
               round(m1 - 2.0 * sd, 6) AS bb_lower,
               n_in_frame
        FROM m
        """,
        "daily_volatility": CANDLES_CTE
        + """
        , lr AS (
          SELECT exchange, symbol, start,
                 CASE WHEN pc > 0 AND close > 0 THEN ln(close / pc) END AS r
          FROM (
            SELECT exchange, symbol, start, close,
                   lag(close) OVER (
                     PARTITION BY exchange, symbol ORDER BY start) AS pc
            FROM candles
          )
        ), rr AS (
          SELECT exchange, symbol, start,
                 CAST(round(r * r, 12) AS DECIMAL(28,14)) AS r2
          FROM lr WHERE r IS NOT NULL
        )
        SELECT exchange, symbol, date_trunc('day', start) AS day,
               CAST(count(*) AS BIGINT) AS n_returns,
               round(sqrt(CAST(sum(r2) AS DOUBLE)), 8) AS realized_vol
        FROM rr GROUP BY 1, 2, 3
        """,
        "atr_14": CANDLES_CTE
        + """
        , tr AS (
          SELECT exchange, symbol, start,
            CAST(round(CASE WHEN pc IS NULL THEN high - low
                 ELSE greatest(high - low, abs(high - pc), abs(low - pc))
                 END, 6) AS DECIMAL(18,6)) AS tr_dec
          FROM (
            SELECT *, lag(close) OVER (
              PARTITION BY exchange, symbol ORDER BY start) AS pc
            FROM candles
          )
        )
        SELECT exchange, symbol, start,
               CAST(tr_dec AS DOUBLE) AS true_range,
               round(CAST(sum(tr_dec) OVER w AS DOUBLE)
                     / (count(*) OVER w), 6) AS atr_14,
               CAST(count(*) OVER w AS BIGINT) AS n_in_frame
        FROM tr
        WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        """,
        "vwap_daily": CANDLES_CTE
        + """
        , agg AS (
          SELECT exchange, symbol, date_trunc('day', start) AS day,
                 CAST(sum(CAST(round(close * volume, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sum_pv,
                 CAST(sum(CAST(round(volume, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sum_volume,
                 CAST(count(*) AS BIGINT) AS n_candles
          FROM candles GROUP BY 1, 2, 3
        )
        SELECT *, round(sum_pv / sum_volume, 6) AS vwap FROM agg
        """,
        "candle_patterns": CANDLES_CTE
        + """
        , flags AS (
          SELECT exchange, symbol, start,
            (abs(close - open) <= 0.1 * (high - low)) AS doji,
            ((least(open, close) - low)
               >= 2.0 * abs(close - open)
             AND (high - greatest(open, close))
               <= abs(close - open)) AS hammer,
            coalesce(
              (lag(close) OVER w - lag(open) OVER w) < 0
              AND (close - open) > 0
              AND open <= lag(close) OVER w
              AND close >= lag(open) OVER w, FALSE) AS bullish_engulfing,
            coalesce(
              (lag(close) OVER w - lag(open) OVER w) > 0
              AND (close - open) < 0
              AND open >= lag(close) OVER w
              AND close <= lag(open) OVER w, FALSE) AS bearish_engulfing
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
        )
        SELECT * FROM flags
        WHERE doji OR hammer OR bullish_engulfing OR bearish_engulfing
        ORDER BY exchange, symbol, start
        """,
        "twap_daily": CANDLES_CTE
        + """
        , durs AS (
          SELECT exchange, symbol, date_trunc('day', start) AS day,
            close,
            date_diff('second', start,
              coalesce(
                lead(start) OVER (
                  PARTITION BY exchange, symbol, date_trunc('day', start)
                  ORDER BY start),
                date_trunc('day', start) + INTERVAL 1 DAY)) AS dur_sec
          FROM candles
        ), agg AS (
          SELECT exchange, symbol, day,
            CAST(sum(CAST(round(close * dur_sec, 6) AS DECIMAL(28,6)))
              AS DOUBLE) AS sum_wp,
            CAST(sum(dur_sec) AS BIGINT) AS total_sec,
            CAST(count(*) AS BIGINT) AS n_candles
          FROM durs GROUP BY 1, 2, 3
        )
        SELECT *, sum_wp / total_sec AS twap FROM agg
        ORDER BY exchange, symbol, day
        """,
        "rsi_14": CANDLES_CTE
        + """
        , moves AS (
          SELECT exchange, symbol, start,
            CASE WHEN lag(close) OVER w IS NULL THEN NULL
              ELSE CAST(round(greatest(close - lag(close) OVER w, 0), 6)
                        AS DECIMAL(18,6)) END AS g,
            CASE WHEN lag(close) OVER w IS NULL THEN NULL
              ELSE CAST(round(greatest(lag(close) OVER w - close, 0), 6)
                        AS DECIMAL(18,6)) END AS l
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
        ), frames AS (
          SELECT exchange, symbol, start,
            sum(g) OVER wf AS sg, sum(l) OVER wf AS sl,
            count(g) OVER wf AS n_moves
          FROM moves
          WINDOW wf AS (PARTITION BY exchange, symbol ORDER BY start
                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT exchange, symbol, start,
          CASE WHEN n_moves = 0 THEN NULL
               WHEN sg = 0 AND sl = 0 THEN 50.0
               WHEN sl = 0 THEN 100.0
               ELSE 100.0 - 100.0 / (1.0 + CAST(sg AS DOUBLE)
                                           / CAST(sl AS DOUBLE)) END
            AS rsi_14,
          CAST(n_moves AS BIGINT) AS n_moves
        FROM frames
        """,
        "stochastic_14": CANDLES_CTE
        + """
        , frames AS (
          SELECT exchange, symbol, start,
            CAST(round(
              CASE WHEN max(high) OVER wn = min(low) OVER wn THEN 50.0
                ELSE 100.0 * (close - min(low) OVER wn)
                     / (max(high) OVER wn - min(low) OVER wn) END, 6)
              AS DECIMAL(18,6)) AS k_dec
          FROM candles
          WINDOW wn AS (PARTITION BY exchange, symbol ORDER BY start
                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT exchange, symbol, start,
          CAST(k_dec AS DOUBLE) AS pct_k,
          CAST(sum(k_dec) OVER wd AS DOUBLE) / count(k_dec) OVER wd
            AS pct_d
        FROM frames
        WINDOW wd AS (PARTITION BY exchange, symbol ORDER BY start
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "obv": CANDLES_CTE
        + """
        , steps AS (
          SELECT exchange, symbol, start,
            CASE WHEN lag(close) OVER w IS NULL
                   OR close = lag(close) OVER w
                 THEN CAST(0 AS DECIMAL(28,6))
                 WHEN close > lag(close) OVER w
                 THEN CAST(round(volume, 6) AS DECIMAL(28,6))
                 ELSE -CAST(round(volume, 6) AS DECIMAL(28,6)) END AS step
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
        )
        SELECT exchange, symbol, start,
          CAST(sum(step) OVER (PARTITION BY exchange, symbol ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS obv
        FROM steps
        """,
        "returns_autocorr": CANDLES_CTE
        + """
        , rets AS (
          SELECT exchange, symbol, start,
            CAST(round(close / lag(close) OVER w - 1.0, 10)
                 AS DECIMAL(18,10)) AS ret
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
          QUALIFY lag(close) OVER w > 0 AND close > 0
              AND abs(close / lag(close) OVER w - 1.0) <= 10.0
        ), pairs AS (
          SELECT exchange, symbol, ret AS x,
                 lag(ret, 1) OVER (
                   PARTITION BY exchange, symbol ORDER BY start
                 ) AS y
          FROM rets
          QUALIFY y IS NOT NULL
        ), agg AS (
          SELECT exchange, symbol,
            CAST(count(*) AS BIGINT) AS n_obs,
            CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
            CAST(sum(x * x) AS DOUBLE) AS sxx,
            CAST(sum(y * y) AS DOUBLE) AS syy,
            CAST(sum(x * y) AS DOUBLE) AS sxy
          FROM pairs GROUP BY 1, 2
        )
        SELECT exchange, symbol, n_obs,
          CASE WHEN n_obs >= 2
                AND CAST(n_obs AS DOUBLE) * sxx - sx * sx > 0
                AND CAST(n_obs AS DOUBLE) * syy - sy * sy > 0
               THEN (CAST(n_obs AS DOUBLE) * sxy - sx * sy)
                    / (sqrt(CAST(n_obs AS DOUBLE) * sxx - sx * sx)
                       * sqrt(CAST(n_obs AS DOUBLE) * syy - sy * sy))
          END AS autocorr_1
        FROM agg ORDER BY exchange, symbol
        """,
        "conversion_latency": """
        WITH pairs AS (
          SELECT a.user_id, a.event_id AS click_id, a.ts AS click_ts,
                 b.ts AS purchase_ts
          FROM events a JOIN events b
            ON a.user_id = b.user_id
           AND a.event_type = 'click' AND b.event_type = 'purchase'
           AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 4 HOUR
        ), first_p AS (
          SELECT user_id, click_id, click_ts,
                 min(purchase_ts) AS first_purchase_ts
          FROM pairs GROUP BY 1, 2, 3
        ), lat AS (
          SELECT CAST(hour(click_ts) AS BIGINT) AS click_hour,
                 epoch_us(first_purchase_ts) - epoch_us(click_ts) AS lat_us
          FROM first_p
        )
        SELECT click_hour,
               CAST(count(*) AS BIGINT) AS n_conversions,
               min(lat_us) / 1e6 AS min_latency_s,
               max(lat_us) / 1e6 AS max_latency_s,
               round(quantile_cont(lat_us, 0.5) / 1e6, 6) AS p50_latency_s,
               round(CAST(sum(lat_us) AS DOUBLE) / count(*) / 1e6, 6)
                 AS mean_latency_s
        FROM lat GROUP BY 1 ORDER BY 1
        """,
        "returns_corr": CANDLES_CTE
        + """
        , rets AS (
          SELECT exchange, symbol, start,
            CAST(round(close / lag(close) OVER w - 1.0, 10)
                 AS DECIMAL(18,10)) AS ret
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
          QUALIFY lag(close) OVER w > 0 AND close > 0
              AND abs(close / lag(close) OVER w - 1.0) <= 10.0
        ), pairs AS (
          SELECT a.exchange, a.symbol AS symbol_a, b.symbol AS symbol_b,
                 a.ret AS x, b.ret AS y
          FROM rets a JOIN rets b
            ON a.exchange = b.exchange AND a.start = b.start
           AND a.symbol < b.symbol
        ), agg AS (
          SELECT exchange, symbol_a, symbol_b,
            CAST(count(*) AS BIGINT) AS n_obs,
            CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
            CAST(sum(x * x) AS DOUBLE) AS sxx,
            CAST(sum(y * y) AS DOUBLE) AS syy,
            CAST(sum(x * y) AS DOUBLE) AS sxy
          FROM pairs GROUP BY 1, 2, 3
        )
        SELECT exchange, symbol_a, symbol_b, n_obs,
          CASE WHEN n_obs >= 2
                AND CAST(n_obs AS DOUBLE) * sxx - sx * sx > 0
                AND CAST(n_obs AS DOUBLE) * syy - sy * sy > 0
               THEN (CAST(n_obs AS DOUBLE) * sxy - sx * sy)
                    / (sqrt(CAST(n_obs AS DOUBLE) * sxx - sx * sx)
                       * sqrt(CAST(n_obs AS DOUBLE) * syy - sy * sy))
          END AS ret_corr
        FROM agg ORDER BY exchange, symbol_a, symbol_b
        """,
        "symbol_beta": CANDLES_CTE
        + """
        , rets AS (
          SELECT exchange, symbol, start,
            CAST(round(close / lag(close) OVER w - 1.0, 10)
                 AS DECIMAL(18,10)) AS x
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
          QUALIFY lag(close) OVER w > 0 AND close > 0
              AND abs(close / lag(close) OVER w - 1.0) <= 10.0
        ), mkt AS (
          SELECT exchange, start,
                 CAST(sum(x) AS DOUBLE) / count(*) AS m
          FROM rets GROUP BY 1, 2
        ), pairs AS (
          SELECT r.exchange, r.symbol, r.x,
            CAST(round(m.m, 12) AS DECIMAL(20,12)) AS m_dec,
            CAST(round(CAST(r.x AS DOUBLE) * m.m, 12)
                 AS DECIMAL(24,12)) AS xm,
            CAST(round(m.m * m.m, 12) AS DECIMAL(24,12)) AS mm
          FROM rets r JOIN mkt m
            ON r.exchange = m.exchange AND r.start = m.start
        ), agg AS (
          SELECT exchange, symbol,
            CAST(count(*) AS BIGINT) AS n_obs,
            CAST(sum(x) AS DOUBLE) AS sx,
            CAST(sum(m_dec) AS DOUBLE) AS sm,
            CAST(sum(xm) AS DOUBLE) AS sxm,
            CAST(sum(mm) AS DOUBLE) AS smm
          FROM pairs GROUP BY 1, 2
        )
        SELECT exchange, symbol, n_obs,
          CASE WHEN n_obs >= 2
                AND CAST(n_obs AS DOUBLE) * smm - sm * sm > 0
               THEN (CAST(n_obs AS DOUBLE) * sxm - sx * sm)
                    / (CAST(n_obs AS DOUBLE) * smm - sm * sm)
          END AS beta,
          CASE WHEN n_obs >= 2
                AND CAST(n_obs AS DOUBLE) * smm - sm * sm > 0
               THEN sx / CAST(n_obs AS DOUBLE)
                    - ((CAST(n_obs AS DOUBLE) * sxm - sx * sm)
                       / (CAST(n_obs AS DOUBLE) * smm - sm * sm))
                      * (sm / CAST(n_obs AS DOUBLE))
          END AS alpha
        FROM agg ORDER BY exchange, symbol
        """,
        "minute_spread": CANDLES_CTE
        + """
        , per_minute AS (
          SELECT symbol, start,
            min(CASE WHEN exchange = 'EXCH_A' THEN close END) AS close_a,
            min(CASE WHEN exchange = 'EXCH_B' THEN close END) AS close_b
          FROM candles GROUP BY 1, 2
        )
        SELECT symbol, start, close_a, close_b,
               CAST(CAST(round(close_a - close_b, 6) AS DECIMAL(18,6))
                    AS DOUBLE) AS spread
        FROM per_minute
        WHERE close_a IS NOT NULL AND close_b IS NOT NULL
        ORDER BY symbol, start
        """,
        "exchange_spread": CANDLES_CTE
        + """
        , per_minute AS (
          SELECT symbol, start,
            min(CASE WHEN exchange = 'EXCH_A' THEN close END) AS close_a,
            min(CASE WHEN exchange = 'EXCH_B' THEN close END) AS close_b
          FROM candles GROUP BY 1, 2
        ), sp AS (
          SELECT symbol,
            CAST(round(close_a - close_b, 6) AS DECIMAL(18,6)) AS sp
          FROM per_minute
          WHERE close_a IS NOT NULL AND close_b IS NOT NULL
        ), agg AS (
          SELECT symbol, CAST(count(*) AS BIGINT) AS n_quotes,
                 sum(sp) AS sum_sp, sum(abs(sp)) AS sum_abs,
                 max(abs(sp)) AS max_abs
          FROM sp GROUP BY 1
        )
        SELECT symbol, n_quotes,
               CAST(sum_sp AS DOUBLE) / n_quotes AS mean_spread,
               CAST(sum_abs AS DOUBLE) / n_quotes AS mean_abs_spread,
               CAST(max_abs AS DOUBLE) AS max_abs_spread
        FROM agg ORDER BY symbol
        """,
        "donchian_20": CANDLES_CTE
        + """
        , ch AS (
          SELECT exchange, symbol, start, close,
                 max(high) OVER w AS u, min(low) OVER w AS l,
                 CAST(count(*) OVER w AS BIGINT) AS n_in_frame
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT exchange, symbol, start, close,
               u AS donchian_upper_20, l AS donchian_lower_20,
               (u + l) / 2.0 AS donchian_mid_20,
               u - l AS donchian_width_20,
               n_in_frame,
               coalesce(close > lag(u) OVER ws, FALSE) AS breakout_up,
               coalesce(close < lag(l) OVER ws, FALSE) AS breakout_down
        FROM ch
        WINDOW ws AS (PARTITION BY exchange, symbol ORDER BY start)
        ORDER BY exchange, symbol, start
        """,
        # The EMA/MACD oracles are DELIBERATELY the sequential textbook
        # recurrences (recursive CTE): a hash match proves the blocked
        # distributed scan (operators/ema.py) equals the definition.
        # beta/alpha literals are the exact doubles ema_params() yields.
        # `numbered` is MATERIALIZED: DuckDB otherwise inlines the CTE
        # and re-derives candles-from-events on EVERY recursion
        # iteration (~5800 at sf0.1) — 14+ min vs ~60 s.
        "ema_20": CANDLES_CTE.replace(
            "WITH candles", "WITH RECURSIVE candles", 1
        )
        + """
        , numbered AS MATERIALIZED (
          SELECT exchange, symbol, start, close,
                 CAST(row_number() OVER (
                   PARTITION BY exchange, symbol ORDER BY start
                 ) AS BIGINT) AS rn
          FROM candles
        ), rec AS (
          SELECT exchange, symbol, start, close, rn, close AS num
          FROM numbered WHERE rn = 1
          UNION ALL
          SELECT n.exchange, n.symbol, n.start, n.close, n.rn,
                 n.close + 0.9047619047619048 * r.num
          FROM numbered n JOIN rec r
            ON n.exchange = r.exchange AND n.symbol = r.symbol
           AND n.rn = r.rn + 1
        )
        SELECT exchange, symbol, start, close,
               CAST(CAST(round(
                 num / ((1.0 - pow(0.9047619047619048, rn))
                        / 0.09523809523809523), 4)
               AS DECIMAL(18,4)) AS DOUBLE) AS ema_20
        FROM rec ORDER BY exchange, symbol, start
        """,
        "macd_12_26_9": CANDLES_CTE.replace(
            "WITH candles", "WITH RECURSIVE candles", 1
        )
        + """
        , numbered AS MATERIALIZED (
          SELECT exchange, symbol, start, close,
                 CAST(row_number() OVER (
                   PARTITION BY exchange, symbol ORDER BY start
                 ) AS BIGINT) AS rn
          FROM candles
        ), rec AS (
          SELECT exchange, symbol, start, close, rn,
                 close AS num12, close AS num26,
                 CAST(0.0 AS DOUBLE) AS snum
          FROM numbered WHERE rn = 1
          UNION ALL
          SELECT n.exchange, n.symbol, n.start, n.close, n.rn,
                 n.close + 0.8461538461538461 * r.num12,
                 n.close + 0.9259259259259259 * r.num26,
                 ((n.close + 0.8461538461538461 * r.num12)
                  / ((1.0 - pow(0.8461538461538461, n.rn))
                     / 0.15384615384615385))
                 - ((n.close + 0.9259259259259259 * r.num26)
                    / ((1.0 - pow(0.9259259259259259, n.rn))
                       / 0.07407407407407407))
                 + 0.8 * r.snum
          FROM numbered n JOIN rec r
            ON n.exchange = r.exchange AND n.symbol = r.symbol
           AND n.rn = r.rn + 1
        ), lines AS (
          SELECT exchange, symbol, start, close,
                 (num12 / ((1.0 - pow(0.8461538461538461, rn))
                           / 0.15384615384615385))
                 - (num26 / ((1.0 - pow(0.9259259259259259, rn))
                             / 0.07407407407407407)) AS macd_raw,
                 snum / ((1.0 - pow(0.8, rn)) / 0.2) AS sig_raw
          FROM rec
        )
        SELECT exchange, symbol, start, close,
               CAST(CAST(round(macd_raw, 4)
                 AS DECIMAL(18,4)) AS DOUBLE) AS macd,
               CAST(CAST(round(sig_raw, 4)
                 AS DECIMAL(18,4)) AS DOUBLE) AS macd_signal,
               CAST(CAST(round(macd_raw - sig_raw, 4)
                 AS DECIMAL(18,4)) AS DOUBLE) AS macd_hist
        FROM lines ORDER BY exchange, symbol, start
        """,
        "event_transitions": """
        WITH pairs AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS to_type
          FROM events
        ), cnt AS (
          SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type) AS p
        FROM cnt ORDER BY from_type, to_type
        """,
        "event_paths_topk": """
        WITH ranked AS (
          SELECT user_id, event_type,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS rn
          FROM events
        ), paths AS (
          SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path,
                 CAST(count(*) AS BIGINT) AS path_len
          FROM ranked WHERE rn <= 3 GROUP BY user_id
        )
        SELECT path, path_len, CAST(count(*) AS BIGINT) AS n_users
        FROM paths GROUP BY 1, 2
        ORDER BY n_users DESC, path ASC LIMIT 10
        """,
        "asof_price_tolerance": CANDLES_CTE
        + """
        , cf AS (
          SELECT * FROM candles WHERE (close_unixtime // 60) % 5 = 0
        ), ev AS (
          SELECT event_id,
                 CASE WHEN event_type < 'm' THEN 'EXCH_A'
                      ELSE 'EXCH_B' END AS exchange,
                 'SYM' || CAST(user_id % 8 AS VARCHAR) AS symbol,
                 ts
          FROM events
        )
        SELECT e.event_id, e.exchange, e.symbol,
               CASE WHEN c.start >= e.ts - INTERVAL 2 MINUTE
                    THEN c.start END AS asof_start,
               CASE WHEN c.start >= e.ts - INTERVAL 2 MINUTE
                    THEN c.close END AS asof_close
        FROM ev e ASOF LEFT JOIN cf c
          ON e.exchange = c.exchange AND e.symbol = c.symbol
         AND e.ts >= c.start
        """,
        "intraday_profile": CANDLES_CTE
        + """
        , base AS (
          SELECT exchange, symbol,
            CAST(hour(start) AS BIGINT) AS hour,
            CAST(round(volume, 6) AS DECIMAL(28,6)) AS vol,
            CASE WHEN lag(close) OVER w > 0 AND close > 0
                 THEN CAST(round(abs(close / lag(close) OVER w - 1.0), 10)
                           AS DECIMAL(18,10)) END AS aret
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
        ), agg AS (
          SELECT exchange, symbol, hour,
            CAST(count(*) AS BIGINT) AS n_candles,
            sum(vol) AS sum_vol,
            CAST(count(aret) AS BIGINT) AS n_rets,
            sum(aret) AS sum_aret
          FROM base GROUP BY 1, 2, 3
        )
        SELECT exchange, symbol, hour, n_candles,
               CAST(sum_vol AS DOUBLE) / n_candles AS mean_volume,
               CASE WHEN n_rets > 0
                    THEN CAST(sum_aret AS DOUBLE) / n_rets END
                 AS mean_abs_return
        FROM agg ORDER BY exchange, symbol, hour
        """,
        "volume_profile": CANDLES_CTE
        + """
        , per AS (
          SELECT exchange, symbol,
                 CAST(floor(close / 5.0) AS BIGINT) AS price_bucket,
                 sum(CAST(round(volume, 6) AS DECIMAL(28,6))) AS vol_dec,
                 CAST(count(*) AS BIGINT) AS n_candles
          FROM candles GROUP BY 1, 2, 3
        )
        SELECT exchange, symbol, price_bucket,
               price_bucket * 5.0 AS bucket_low,
               CAST(vol_dec AS DOUBLE) AS bucket_volume,
               n_candles,
               CAST(vol_dec AS DOUBLE)
                 / CAST(sum(vol_dec) OVER (PARTITION BY exchange, symbol)
                        AS DOUBLE) AS volume_share
        FROM per ORDER BY exchange, symbol, price_bucket
        """,
        "rolling_corr_60": CANDLES_CTE
        + """
        , rets AS (
          SELECT exchange, symbol, start,
            CAST(round(close / lag(close) OVER w - 1.0, 10)
                 AS DECIMAL(18,10)) AS ret
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
          QUALIFY lag(close) OVER w > 0 AND close > 0
              AND abs(close / lag(close) OVER w - 1.0) <= 10.0
        ), pairs AS (
          SELECT a.exchange, a.symbol AS symbol_a, b.symbol AS symbol_b,
                 a.start, a.ret AS x, b.ret AS y
          FROM rets a JOIN rets b
            ON a.exchange = b.exchange AND a.start = b.start
           AND a.symbol < b.symbol
        ), frames AS (
          SELECT exchange, symbol_a, symbol_b, start,
            CAST(count(*) OVER wf AS BIGINT) AS n_in_frame,
            CAST(sum(x) OVER wf AS DOUBLE) AS sx,
            CAST(sum(y) OVER wf AS DOUBLE) AS sy,
            CAST(sum(x * x) OVER wf AS DOUBLE) AS sxx,
            CAST(sum(y * y) OVER wf AS DOUBLE) AS syy,
            CAST(sum(x * y) OVER wf AS DOUBLE) AS sxy
          FROM pairs
          WINDOW wf AS (PARTITION BY exchange, symbol_a, symbol_b
                        ORDER BY start
                        ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
        )
        SELECT exchange, symbol_a, symbol_b, start, n_in_frame,
          CASE WHEN n_in_frame >= 2
                AND CAST(n_in_frame AS DOUBLE) * sxx - sx * sx > 0
                AND CAST(n_in_frame AS DOUBLE) * syy - sy * sy > 0
               THEN (CAST(n_in_frame AS DOUBLE) * sxy - sx * sy)
                    / (sqrt(CAST(n_in_frame AS DOUBLE) * sxx - sx * sx)
                       * sqrt(CAST(n_in_frame AS DOUBLE) * syy - sy * sy))
          END AS corr_60
        FROM frames
        """,
        "rolling_sharpe_60": CANDLES_CTE
        + """
        , rets AS (
          SELECT exchange, symbol, start,
            CAST(round(close / lag(close) OVER w - 1.0, 10)
                 AS DECIMAL(18,10)) AS x,
            CAST(round(round(close / lag(close) OVER w - 1.0, 10)
                       * round(close / lag(close) OVER w - 1.0, 10), 14)
                 AS DECIMAL(28,14)) AS x2
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
          QUALIFY lag(close) OVER w > 0 AND close > 0
              AND abs(close / lag(close) OVER w - 1.0) <= 10.0
        ), frames AS (
          SELECT exchange, symbol, start,
            CAST(count(*) OVER wf AS BIGINT) AS n_in_frame,
            CAST(sum(x) OVER wf AS DOUBLE) AS sx,
            CAST(sum(x2) OVER wf AS DOUBLE) AS sx2
          FROM rets
          WINDOW wf AS (PARTITION BY exchange, symbol ORDER BY start
                        ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
        )
        SELECT exchange, symbol, start, n_in_frame,
          CASE WHEN n_in_frame >= 2
                AND sx2 / n_in_frame
                    - (sx / n_in_frame) * (sx / n_in_frame) > 0
               THEN (sx / n_in_frame)
                    / sqrt(sx2 / n_in_frame
                           - (sx / n_in_frame) * (sx / n_in_frame))
          END AS sharpe_60
        FROM frames
        """,
        "drawdown_curve": CANDLES_CTE
        + """
        SELECT exchange, symbol, start, close,
          max(close) OVER wc AS running_peak,
          CASE WHEN max(close) OVER wc > 0
               THEN close / max(close) OVER wc - 1.0 END AS drawdown
        FROM candles
        WINDOW wc AS (PARTITION BY exchange, symbol ORDER BY start
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "rolling_beta_60": CANDLES_CTE
        + """
        , rets AS (
          SELECT exchange, symbol, start,
            CAST(round(close / lag(close) OVER w - 1.0, 10)
                 AS DECIMAL(18,10)) AS x
          FROM candles
          WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
          QUALIFY lag(close) OVER w > 0 AND close > 0
              AND abs(close / lag(close) OVER w - 1.0) <= 10.0
        ), mkt AS (
          SELECT exchange, start,
                 CAST(sum(x) AS DOUBLE) / count(*) AS m
          FROM rets GROUP BY 1, 2
        ), pairs AS (
          SELECT r.exchange, r.symbol, r.start, r.x,
            CAST(round(m.m, 12) AS DECIMAL(20,12)) AS m_dec,
            CAST(round(CAST(r.x AS DOUBLE) * m.m, 12)
                 AS DECIMAL(24,12)) AS xm,
            CAST(round(m.m * m.m, 12) AS DECIMAL(24,12)) AS mm
          FROM rets r JOIN mkt m
            ON r.exchange = m.exchange AND r.start = m.start
        ), frames AS (
          SELECT exchange, symbol, start,
            CAST(count(*) OVER wf AS BIGINT) AS n_in_frame,
            CAST(sum(x) OVER wf AS DOUBLE) AS sx,
            CAST(sum(m_dec) OVER wf AS DOUBLE) AS sm,
            CAST(sum(xm) OVER wf AS DOUBLE) AS sxm,
            CAST(sum(mm) OVER wf AS DOUBLE) AS smm
          FROM pairs
          WINDOW wf AS (PARTITION BY exchange, symbol ORDER BY start
                        ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
        )
        SELECT exchange, symbol, start, n_in_frame,
          CASE WHEN n_in_frame >= 2
                AND CAST(n_in_frame AS DOUBLE) * smm - sm * sm > 0
               THEN (CAST(n_in_frame AS DOUBLE) * sxm - sx * sm)
                    / (CAST(n_in_frame AS DOUBLE) * smm - sm * sm)
          END AS beta_60
        FROM frames
        """,
        "rolling_active_users": """
        WITH days AS (
          SELECT DISTINCT date_trunc('day', ts) AS day FROM events
        ), contrib AS (
          SELECT date_trunc('day', e.ts) + g.x * INTERVAL 1 DAY AS day,
                 e.user_id
          FROM events e CROSS JOIN generate_series(0, 6) AS g(x)
        )
        SELECT c.day,
               CAST(count(DISTINCT c.user_id) AS BIGINT)
                 AS active_users_7d
        FROM contrib c
        WHERE c.day IN (SELECT day FROM days)
        GROUP BY 1 ORDER BY 1
        """,
        "price_bands": CANDLES_CTE
        + """
        SELECT CAST(b.band AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_candles,
               min(c.close) AS min_close,
               max(c.close) AS max_close
        FROM candles c
        JOIN (VALUES (0, 0.0, 50.0), (1, 50.0, 100.0),
                     (2, 100.0, 150.0), (3, 150.0, 1e12)) b(band, lo, hi)
          ON c.close >= b.lo AND c.close < b.hi
        GROUP BY 1 ORDER BY 1
        """,
        "asof_price": CANDLES_CTE
        + """
        , ev AS (
          SELECT event_id,
                 CASE WHEN event_type < 'm' THEN 'EXCH_A'
                      ELSE 'EXCH_B' END AS exchange,
                 'SYM' || CAST(user_id % 8 AS VARCHAR) AS symbol,
                 ts
          FROM events
        )
        SELECT e.event_id, e.exchange, e.symbol,
               c.start AS asof_start, c.close AS asof_close
        FROM ev e ASOF JOIN candles c
          ON e.exchange = c.exchange AND e.symbol = c.symbol
         AND e.ts >= c.start
        """,
        "volume_bars": CANDLES_CTE
        + """
        , cum AS (
          SELECT exchange, symbol, start, open, high, low, close,
                 CAST(round(volume, 6) AS DECIMAL(28,6)) AS vol_dec,
                 CAST(coalesce(sum(CAST(round(volume, 6) AS DECIMAL(28,6)))
                   OVER (PARTITION BY exchange, symbol ORDER BY start
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   CAST(0 AS DECIMAL(28,6))) AS DOUBLE) AS cum_prev
          FROM candles),
        b AS (
          SELECT *, CAST(floor(cum_prev / 500.0) AS BIGINT) AS bar_id
          FROM cum)
        SELECT exchange, symbol, bar_id,
               min(start) AS bar_start,
               round(arg_min(open, start), 6) AS open,
               round(max(high), 6) AS high,
               round(min(low), 6) AS low,
               round(arg_max(close, start), 6) AS close,
               CAST(sum(vol_dec) AS DOUBLE) AS volume,
               CAST(count(*) AS BIGINT) AS n_candles
        FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "asof_price_forward": CANDLES_CTE
        + """
        , ev AS (
          SELECT event_id,
                 CASE WHEN event_type < 'm' THEN 'EXCH_A'
                      ELSE 'EXCH_B' END AS exchange,
                 'SYM' || CAST(user_id % 8 AS VARCHAR) AS symbol,
                 ts
          FROM events
        )
        SELECT e.event_id, e.exchange, e.symbol,
               c.start AS asof_start, c.close AS asof_close
        FROM ev e ASOF LEFT JOIN candles c
          ON e.exchange = c.exchange AND e.symbol = c.symbol
         AND e.ts <= c.start
        """,
        "repair_window": CANDLES_CTE
        + f"""
        SELECT exchange, symbol,
               time_bucket(INTERVAL '15 minutes', start) AS candle_start,
               {_ROLLUP_AGG}
        FROM candles
        WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
          AND start >= TIMESTAMP '2024-01-05 00:00:00'
          AND start <  TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY 1, 2, 3
        """,
        "watchdog_cycle": CANDLES_CTE
        + f"""
        SELECT exchange, symbol,
               time_bucket(INTERVAL '5 minutes', start) AS candle_start,
               {_ROLLUP_AGG}
        FROM candles GROUP BY 1, 2, 3
        """,
        "price_percentiles": CANDLES_CTE
        + """
        SELECT symbol,
               round(quantile_cont(close, 0.5), 6) AS p50,
               round(quantile_cont(close, 0.95), 6) AS p95,
               round(quantile_cont(close, 0.99), 6) AS p99,
               CAST(count(*) AS BIGINT) AS n
        FROM candles GROUP BY symbol ORDER BY symbol
        """,
        "gap_missing_count": CANDLES_CTE
        + """
        , bounds AS (
            SELECT exchange, symbol, min(start) AS lo, max(start) AS hi
            FROM candles GROUP BY 1, 2
        ), grid AS (
            SELECT exchange, symbol,
                   unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS start
            FROM bounds
        ), missing AS (
            SELECT exchange, symbol, start FROM grid
            EXCEPT
            SELECT exchange, symbol, start FROM candles
        )
        SELECT exchange, symbol, CAST(count(*) AS BIGINT) AS n_missing
        FROM missing GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "gap_islands": CANDLES_CTE
        + """
        , one AS (
            SELECT * FROM candles
            WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
        ), bounds AS (
            SELECT exchange, symbol, min(start) AS lo, max(start) AS hi
            FROM one GROUP BY 1, 2
        ), grid AS (
            SELECT exchange, symbol,
                   unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS start
            FROM bounds
        ), missing AS (
            SELECT exchange, symbol, start FROM grid
            EXCEPT
            SELECT exchange, symbol, start FROM one
        ), flagged AS (
            SELECT exchange, symbol, start,
                   CASE WHEN lag(start) OVER w IS NULL
                         OR epoch(start) - epoch(lag(start) OVER w) > 60
                        THEN 1 ELSE 0 END AS new_island
            FROM missing
            WINDOW w AS (PARTITION BY exchange, symbol ORDER BY start)
        ), ids AS (
            SELECT exchange, symbol, start,
                   sum(new_island) OVER (
                     PARTITION BY exchange, symbol ORDER BY start
                     ROWS UNBOUNDED PRECEDING
                   ) AS island
            FROM flagged
        )
        SELECT exchange, symbol, min(start) AS gap_start, max(start) AS gap_end,
               CAST(count(*) AS BIGINT) AS n_missing
        FROM ids GROUP BY exchange, symbol, island
        """,
        "backfill_plan": CANDLES_CTE
        + """
        , bounds AS (
            SELECT symbol, min(start) AS upper FROM candles GROUP BY symbol
        ), chunks AS (
            SELECT symbol, upper,
                   unnest(generate_series(
                     TIMESTAMP '2023-12-28 00:00:00',
                     upper - INTERVAL 1 SECOND,
                     INTERVAL 1000 MINUTE)) AS chunk_start
            FROM bounds WHERE upper > TIMESTAMP '2023-12-28 00:00:00'
        )
        SELECT symbol, chunk_start,
               least(chunk_start + INTERVAL 1000 MINUTE, upper) AS chunk_end,
               CAST(row_number() OVER (
                 PARTITION BY symbol ORDER BY chunk_start DESC) AS BIGINT)
                 AS chunk_index
        FROM chunks
        """,
        "validate_quarantine": CANDLES_INVALID_CTE
        + f"""
        SELECT * FROM candles_invalid WHERE NOT ({_VALID_COND})
        """,
    }
    # Stored-index IVF-PQ search returns exactly the inline
    # composition's results (parity pytest in tests/test_ivf_index),
    # so its oracle IS the inline twin.
    sql["emb_ivfpq_indexed_topk"] = sql["emb_ivf_pq_topk"]
    # append == rebuild == inline trained composition (pytest-proven
    # chain, see _q_emb_ivf_appended_topk) -> same DuckDB twin
    sql["emb_ivf_appended_topk"] = sql["emb_ivf_trained_topk"]
    # ADC shortlist + exact re-rank (the FAISS refine step): wrap the
    # ivfadc twin's ranked CTE — shortlist is its top-30, re-ranked on
    # exact squared-L2 against the ORIGINAL vectors (str.replace, not
    # .format: the SQL carries struct literals)
    _RERANK_TAIL = """, shortlist AS (
          SELECT q_id, vec_id FROM ranked WHERE rank <= 30
        ), exact AS (
          SELECT s.q_id, s.vec_id,
                 round(list_sum(list_transform(list_zip(q.q_emb, n.emb),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS exact_d
          FROM shortlist s
          JOIN qv q USING (q_id)
          JOIN n ON n.vec_id = s.vec_id
        )
        SELECT * FROM (
          SELECT q_id, vec_id, exact_d,
                 CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY exact_d ASC, vec_id ASC) AS BIGINT) AS rank
          FROM exact)
        WHERE rank <= 10
        ORDER BY q_id, rank
        """
    sql["emb_ivfadc_rerank_topk"] = sql["emb_ivfadc_topk"].replace(
        "SELECT * FROM ranked WHERE rank <= 10", _RERANK_TAIL
    )
    assert "exact_d" in sql["emb_ivfadc_rerank_topk"]  # replace landed
    # stored BM25 index search == from-text scorer by construction
    # (the index tables ARE bm25_topk's censuses at rest) -> same twin
    sql["doc_bm25_indexed_topk"] = sql["doc_bm25_topk"]
    # appended BM25 == rebuild == from-text scorer (pytest-proven
    # chain, see _q_doc_bm25_appended_topk) -> same DuckDB twin
    sql["doc_bm25_appended_topk"] = sql["doc_bm25_topk"]
    # retrieval-quality readout wraps the hybrid twin verbatim: the
    # fused ranking is re-derived as a CTE, truth = the dense exact
    # top-10 (dd at r_d <= 10, already self-excluded), metrics are
    # decimal-summed 12-dp log2 gains — the lm_score discipline
    sql["emb_hybrid_eval"] = (
        sql["emb_hybrid_rrf"].rsplit("SELECT q_id, doc_id, r_s AS sparse_rank", 1)[0]
        + """, results AS (
          SELECT q_id, doc_id, rank FROM (
            SELECT q_id, doc_id,
                   CAST(row_number() OVER (
                     PARTITION BY q_id ORDER BY rrf DESC, doc_id)
                     AS BIGINT) AS rank
            FROM fused
          ) WHERE rank <= 10
        ), truth AS (
          SELECT q_id, doc_id FROM dd WHERE r_d <= 10
        ), hits AS (
          SELECT r.q_id, r.rank
          FROM results r JOIN truth t USING (q_id, doc_id)
        ), dcg AS (
          SELECT q_id, CAST(count(*) AS BIGINT) AS n_found,
                 sum(CAST(round(1.0 / log2(rank + 1.0), 12)
                          AS DECIMAL(20,12))) AS dcg,
                 CAST(min(rank) AS BIGINT) AS first_hit
          FROM hits GROUP BY 1
        ), ideal AS (
          SELECT sum(CAST(round(1.0 / log2(i + 1.0), 12)
                          AS DECIMAL(20,12))) AS idcg
          FROM range(1, 11) t(i)
        ), qdim AS (
          SELECT DISTINCT q_id FROM results
        )
        SELECT q.q_id,
               CAST(COALESCE(d.n_found, 0) AS BIGINT)
                 AS n_relevant_found,
               CAST(COALESCE(d.n_found, 0) AS DOUBLE) / 10
                 AS recall_at_k,
               COALESCE(1.0 / d.first_hit, 0.0) AS mrr,
               COALESCE(CAST(d.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE),
                        0.0) AS ndcg_at_k
        FROM qdim q LEFT JOIN dcg d USING (q_id) CROSS JOIN ideal i
        ORDER BY q_id
        """
    )
    assert "ndcg_at_k" in sql["emb_hybrid_eval"]
    # stored NB model serve == in-query classifier by construction
    # (the index tables ARE _nb_model's censuses at rest) -> same twin
    sql["doc_source_nb_indexed"] = sql["doc_source_nb"]
    # sparse scoring is a decimal-exact regrouping of the dense sum
    # (ext/text._nb_score sparse=True; pytest asserts row-identical
    # output) -> same DuckDB twin
    sql["doc_source_nb_sparse"] = sql["doc_source_nb"]
    # appended NB == rebuild == in-query classifier (the per-batch
    # partials sum exactly for disjoint doc sets, pytest-proven
    # chain, see _q_doc_source_nb_appended) -> same DuckDB twin
    sql["doc_source_nb_appended"] = sql["doc_source_nb"]
    # confusion matrix wraps the NB twin verbatim so the two can
    # never disagree on classifier semantics
    sql["doc_source_nb_confusion"] = (
        "SELECT actual_source, pred_source,"
        " CAST(count(*) AS BIGINT) AS n_docs FROM ("
        + sql["doc_source_nb"]
        + ") GROUP BY 1, 2 ORDER BY 1, 2"
    )
    # appended IVF-PQ == rebuild == inline composition (pytest-proven
    # chain, see _q_emb_ivfpq_appended_topk) -> same DuckDB twin
    sql["emb_ivfpq_appended_topk"] = sql["emb_ivf_pq_topk"]
    # Indexed-serving hybrid RRF (VERDICT r10 #1): the dense side is
    # the inline ivf_pq composition (indexed serve == inline,
    # pytest-proven) re-aimed at the hybrid's query set (vec_id < 3)
    # and depth 20; the sparse side is the from-text BM25 SQL
    # (indexed serve == from-text scorer — the index tables ARE its
    # censuses at rest); the fusion tail is byte-identical to
    # emb_hybrid_rrf's.  str.replace, not .format (struct literals).
    _HYBRID_IDX_TAIL = r""", dd AS (
          SELECT q_id, vec_id AS doc_id, r_d FROM (
            SELECT q_id, vec_id,
                   CAST(rank AS BIGINT) AS r_d
            FROM ranked
          ) WHERE r_d <= 20
        ), toks AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS tokens
          FROM documents
        ), dl AS (
          SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks
        ), qterms AS (
          SELECT doc_id AS q_id, unnest(list_distinct(tokens)) AS term
          FROM toks WHERE doc_id < 3
        ), tok AS (
          SELECT doc_id, unnest(tokens) AS term FROM toks
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok WHERE term IN (SELECT DISTINCT term FROM qterms)
          GROUP BY 1, 2
        ), dft AS (
          SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM tf GROUP BY 1
        ), stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 round(avg(dl), 6) AS avgdl
          FROM dl
        ), sparse AS (
          SELECT qt.q_id, tf.doc_id,
                 round(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * (1.2 + 1.0))
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                 ), 6) AS bm25
          FROM qterms qt
          JOIN tf ON tf.term = qt.term AND tf.doc_id <> qt.q_id
          JOIN dl ON dl.doc_id = tf.doc_id
          JOIN dft ON dft.term = tf.term, stats
          GROUP BY 1, 2
        ), sd AS (
          SELECT q_id, doc_id, r_s FROM (
            SELECT q_id, doc_id,
                   CAST(row_number() OVER (
                     PARTITION BY q_id ORDER BY bm25 DESC, doc_id)
                     AS BIGINT) AS r_s
            FROM sparse
          ) WHERE r_s <= 20
        ), fused AS (
          SELECT COALESCE(s.q_id, d.q_id) AS q_id,
                 COALESCE(s.doc_id, d.doc_id) AS doc_id,
                 s.r_s, d.r_d,
                 COALESCE(1.0 / (60 + s.r_s), 0)
                   + COALESCE(1.0 / (60 + d.r_d), 0) AS rrf
          FROM sd s FULL OUTER JOIN dd d
            ON s.q_id = d.q_id AND s.doc_id = d.doc_id
        )
        SELECT q_id, doc_id, r_s AS sparse_rank, r_d AS dense_rank,
               round(rrf, 6) AS rrf_score, rank
        FROM (
          SELECT q_id, doc_id, r_s, r_d, rrf,
                 CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY rrf DESC, doc_id)
                   AS BIGINT) AS rank
          FROM fused
        ) WHERE rank <= 10
        ORDER BY q_id, rank
        """
    sql["emb_hybrid_indexed_rrf"] = (
        sql["emb_ivf_pq_topk"]
        .replace(
            "FROM n WHERE vec_id >= 100 AND vec_id < 103",
            "FROM n WHERE vec_id < 3",
        )
        .replace("SELECT * FROM ranked WHERE rank <= 10", _HYBRID_IDX_TAIL)
    )
    assert "rrf_score" in sql["emb_hybrid_indexed_rrf"]  # replace landed
    assert "vec_id < 3" in sql["emb_hybrid_indexed_rrf"]
    # funnel conversion summary wraps the funnel oracle verbatim so
    # the two can never disagree on chain semantics
    sql["event_funnel_rates"] = (
        "WITH funnel AS ("
        + sql["event_funnel"]
        + """
        ), fan AS (
          SELECT unnest(generate_series(1, funnel_level)) AS level
          FROM funnel WHERE funnel_level >= 1
        ), reach AS (
          SELECT level, CAST(count(*) AS BIGINT) AS n_users
          FROM fan GROUP BY 1
        )
        SELECT CAST(level AS BIGINT) AS level, n_users,
          CAST(n_users AS DOUBLE)
            / first_value(n_users) OVER (ORDER BY level
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS conversion_from_start,
          CAST(n_users AS DOUBLE) / lag(n_users) OVER (ORDER BY level)
            AS step_conversion
        FROM reach ORDER BY level
        """
    )
    return sql
