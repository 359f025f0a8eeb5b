"""Plan-regression tests: lock in the physical properties the engine
is designed around (docs/ARCHITECTURE.md plan audit).  A change that
silently reintroduces per-level cascade shuffles, breaks predicate
pushdown, or turns top-N into a full sort fails here, not in a 100 TB
deployment.
"""

import io
import re
from contextlib import redirect_stdout

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators import cascade, dedup_latest


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_cascade_single_shuffle(spark, sf_dir):
    c = dedup_latest(candles_from_events(spark, sf_dir))
    full = cascade(c)[1440]
    # derivation agg + dedup agg + the one cascade repartition = 3;
    # anything more means a level started shuffling again.
    assert _exchanges(_plan(full)) <= 3


def test_topn_plans_take_ordered(spark, sf_dir):
    from trade_data_collection_service_spark.operators.queries import recent_candles

    q = recent_candles(candles_from_events(spark, sf_dir), "EXCH_A", "SYM0", "1m", 200)
    assert "TakeOrderedAndProject" in _plan(q)


def test_q1_pushdown_and_pruning(spark, sf_dir):
    from trade_data_collection_service_spark.ext.tpch import q1_pricing_summary

    plan = _plan(q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # column pruning: the scan must not read l_orderkey/l_partkey etc.
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert read_schema and "l_orderkey" not in read_schema.group(1)


def test_q3_broadcasts_dimension(spark, sf_dir):
    from trade_data_collection_service_spark.ext.tpch import q3_shipping_priority

    assert "BroadcastHashJoin" in _plan(q3_shipping_priority(spark, sf_dir))


def test_dedup_is_aggregation_not_sort(spark, sf_dir):
    plan = _plan(dedup_latest(candles_from_events(spark, sf_dir)))
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_vocab_topk_is_take_ordered(spark, sf_dir):
    from trade_data_collection_service_spark.ext.pipeline import vocab_topk

    plan = _plan(vocab_topk(spark.read.parquet(f"{sf_dir}/documents.parquet")))
    # top-k over the vocabulary must never be a global sort
    assert "TakeOrderedAndProject" in plan


def test_sampling_is_map_only(spark, sf_dir):
    from trade_data_collection_service_spark.ext.pipeline import train_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # split assignment fuses into the scan: zero exchanges before sort
    plan = _plan(train_split(docs))
    scan_part = plan.split("Sort", 1)[-1]
    assert _exchanges(plan.split("Sort", 1)[0]) == 0 or "Exchange" not in scan_part


def test_reservoir_uses_window_group_limit(spark, sf_dir):
    from trade_data_collection_service_spark.ext.pipeline import reservoir_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(reservoir_per_group(docs, "lang", "doc_id", 10))
    # rank<=n pushes into WindowGroupLimit: only 10 rows per group
    # survive past the exchange (Spark 3.5+ optimization)
    assert "WindowGroupLimit" in plan


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    from trade_data_collection_service_spark.ext.text import bm25_topk

    plan = _plan(bm25_topk(spark, sf_dir, k=10))
    # The top-k over scored docs must plan as TakeOrderedAndProject
    # (per-partition heaps), never an unpartitioned rank window over
    # every doc containing >= 1 query term.  The only Window allowed
    # is the rank attach AFTER the k-row limit.
    assert "TakeOrderedAndProject" in plan


def test_hll_register_agg_is_partial(spark, sf_dir):
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.candles import events_df
    from trade_data_collection_service_spark.functions.sketch import hll_distinct

    ev = events_df(spark, sf_dir).withColumn("day", F.date_trunc("day", "ts"))
    plan = _plan(hll_distinct(ev, ["day"], "user_id"))
    # two-phase hash agg: map-side partial max before the shuffle
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_quantized_topk_broadcasts_queries(spark, sf_dir):
    from trade_data_collection_service_spark.ext.similarity import quantized_topk

    plan = _plan(quantized_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    from trade_data_collection_service_spark.ext.pipeline import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(decontaminate(docs))
    assert "BroadcastHashJoin" in plan  # corpus never shuffles on shingle
    assert "SortMergeJoin" not in plan


def test_pack_sequences_sort_is_partition_local(spark, sf_dir):
    from trade_data_collection_service_spark.ext.pipeline import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    # the packing window sorts within pack_group partitions only —
    # "Sort [...], false" is the non-global flag; the sole global sort
    # is the presentation orderBy(doc_id).
    import re

    globals_ = re.findall(r"Sort \[[^\]]*\], (true|false)", plan)
    assert globals_.count("false") >= 1
    assert globals_.count("true") <= 1


def test_q9_broadcasts_all_dims_single_fact_shuffle(spark, sf_dir):
    from trade_data_collection_service_spark.ext.tpch import q9_product_profit

    plan = _plan(q9_product_profit(spark, sf_dir))
    # part/supplier/nation are broadcast; only lineitem⋈orders shuffles
    assert plan.count("BroadcastHashJoin") >= 3
    # the pre-filtered part name predicate reaches the part scan
    assert "p_name" in plan.split("PushedFilters", 1)[1][:4000]


def test_q16_anti_join_is_broadcast(spark, sf_dir):
    from trade_data_collection_service_spark.ext.tpch import q16_supplier_count

    plan = _plan(q16_supplier_count(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_funnel_windows_share_one_sort(spark, sf_dir):
    from trade_data_collection_service_spark.candles import events_df
    from trade_data_collection_service_spark.ext.pipeline import window_funnel

    plan = _plan(window_funnel(events_df(spark, sf_dir)))
    # one data exchange (user_id) + one presentation sort exchange;
    # the k-1 range windows and the aggregate reuse the same sort
    assert _exchanges(plan) == 2, plan


def test_tfidf_terms_uses_window_group_limit(spark, sf_dir):
    from trade_data_collection_service_spark.ext.text import tfidf_terms

    plan = _plan(tfidf_terms(spark, sf_dir, 5))
    # per-doc top-k must push into WindowGroupLimit (k-heaps per
    # partition key), never a global sort; df table joins broadcast
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_ema_scan_stays_jvm_side(spark, sf_dir):
    from trade_data_collection_service_spark.operators.ema import macd, with_ema

    c = candles_from_events(spark, sf_dir)
    plan = _plan(
        with_ema(
            c.select("exchange", "symbol", "start", "close"),
            ["exchange", "symbol"], "start", ["close"], [20], ["e"],
        )
    )
    # the recurrence is pure window algebra: no pandas/Python eval
    # anywhere (the whole point vs the applyInPandas folk solution)
    for banned in ("BatchEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert banned not in plan, banned
    # block cumsum + row_number run as window execs over the one sort
    assert "Window" in plan
    # MACD shares the fast/slow sort: exactly 2 sorts of the full
    # candle table (rn pass + signal-line pass), not one per EMA
    mplan = _plan(macd(c))
    for banned in ("BatchEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert banned not in mplan, banned


def test_macd_runtime_plan_reuses_exchanges(spark, sf_dir):
    """VERDICT r6 #7: the signal-line pass necessarily re-sorts (its
    input — the macd series — does not exist until the first pass
    publishes it, and the block-summary windows repartition on
    (keys, blk)), but the shared fast/slow subtree must NOT execute
    twice: at runtime AQE stitches the identical first-pass exchanges
    together as ReusedExchange.  Assert on the FINAL adaptive plan —
    the static plan shows 0 reuse by construction."""
    from trade_data_collection_service_spark.operators.ema import macd

    df = macd(candles_from_events(spark, sf_dir))
    df.collect()  # materialize so the adaptive plan is final
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1, plan[:2000]


def test_ngram_topk_is_take_ordered(spark, sf_dir):
    from trade_data_collection_service_spark.ext.text import ngram_topk

    plan = _plan(
        ngram_topk(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    )
    # corpus-wide top-k must be a per-partition heap, never a full sort
    assert "TakeOrderedAndProject" in plan
    # the count groupBy partial-aggregates before the exchange
    assert "partial_count" in plan or "HashAggregate" in plan


def test_event_paths_topk_is_take_ordered(spark, sf_dir):
    from trade_data_collection_service_spark.candles import events_df
    from trade_data_collection_service_spark.ext.pipeline import (
        event_paths_topk,
    )

    plan = _plan(event_paths_topk(events_df(spark, sf_dir)))
    assert "TakeOrderedAndProject" in plan


def test_duplicate_spans_hot_gram_safe_shape(spark, sf_dir):
    """Hot-gram guard (VERDICT r8 #2): the gram-occurrence count must
    come from a map-side-combined groupBy (partial_count), NEVER a
    window function over partitionBy(gram) — window functions cannot
    partially aggregate, so a mega-boilerplate gram would concentrate
    every occurrence in one task.  The corpus is scanned once: the
    window table is a localCheckpoint boundary (Scan ExistingRDD)
    feeding both the census and the hit join, so zero parquet scans
    appear in the SQL plan and the tokenize/window build runs once.
    The hit set is one gram equi-join (broadcast or AQE-skew-
    splittable shuffle) — no nested-loop/cartesian."""
    from trade_data_collection_service_spark.ext.dedup import duplicate_spans

    df = duplicate_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), k=5
    )
    plan = _plan(df)
    # corpus materialized once behind the checkpoint boundary
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0, plan[:2000]
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) >= 1
    # census is a partial-aggregable groupBy on gram, not a window
    assert "partial_count" in plan
    # the only Window left is _merge_spans's per-doc sort window —
    # none may partition by gram (the unguarded straggler shape)
    assert not re.search(
        r"windowspecdefinition\(gram", plan
    ), "gram-partitioned window is back"
    # exactly one equi-join for the hit set, never a nested loop
    joins = re.findall(
        r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan
    )
    assert len(joins) == 1, joins
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_source_nb_argmax_is_window_free(spark, sf_dir):
    """The NB classifier's argmax must stay a map-side-combinable
    min-struct aggregate — a per-doc rank window here would sort the
    (doc × source) expansion through window state for no reason, and
    the census aggregates must partially aggregate (map-side combine)
    before their shuffles."""
    from trade_data_collection_service_spark.ext.text import source_nb

    plan = _plan(source_nb(spark, sf_dir))
    assert not re.search(r"\(\d+\) Window", plan), "argmax became a window"
    # r14: the dense path pivots the census to per-source columns
    # (partial_max) and scores with per-doc conditional sums
    # (partial_sum); the tokenize passes sit behind the shared
    # localCheckpoint so their partial_count no longer shows in this
    # plan.  The requirement is unchanged: every visible aggregate
    # must partially aggregate before its exchange.
    assert "partial_max" in plan or "partial_min" in plan
    assert "partial_sum" in plan or "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_bm25_indexed_serve_prunes_to_query_terms(spark, sf_dir, tmp_path):
    """The stored-index serve path must push the query-vocabulary
    In-filter into BOTH posting-side scans (postings + df) and never
    read the documents table — the whole point of the index is that
    serve cost is independent of corpus text bytes."""
    from trade_data_collection_service_spark.ext.text import (
        bm25_search_indexed,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)
    plan = _plan(bm25_search_indexed(spark, path))
    assert plan.count("PushedFilters: [In(term") >= 2, plan[:2000]
    assert "documents.parquet" not in plan
    # top-k is a bounded TakeOrderedAndProject, never a full sort
    assert "TakeOrderedAndProject" in plan


def test_temperature_mix_never_reaggregates_the_corpus(spark, sf_dir):
    """The α-power normalizer must aggregate the DIMENSION table, not
    the corpus: the groupBy(source) census is a lazy localCheckpoint
    boundary (Catalyst re-derives unshared subplans per reference —
    un-checkpointed, the corpus scan ran once per census reference,
    3× total; caught by this test's first version), so the plan shows
    ZERO parquet scans (the one corpus scan runs at checkpoint
    materialization) and only ExistingRDD feeds downstream."""
    from trade_data_collection_service_spark.ext.pipeline import (
        temperature_mixture_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(temperature_mixture_weights(docs))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0, plan[:2000]
    assert len(re.findall(r"Scan ExistingRDD", plan)) >= 1


def test_hashed4_logprob_scans_corpus_once(spark, sf_dir):
    """The hashed order-4 LM's bucket-row table feeds BOTH censuses
    and the scoring join — it must be a lazy localCheckpoint boundary
    (Catalyst re-derives unshared subplans per reference: without it
    the corpus tokenize+lag pass runs three times).  Plan shows zero
    parquet scans of documents beyond the output's own doc_id join
    and at least one ExistingRDD feed."""
    from trade_data_collection_service_spark.ext.text import (
        hashed4_logprob,
    )

    plan = _plan(hashed4_logprob(spark, sf_dir))
    # the only parquet scan allowed is the 1-column doc_id coverage
    # join; the tokenize+lag pass is behind the checkpoint boundary
    scans = re.findall(r"\(\d+\) Scan parquet[^\n]*", plan)
    assert len(scans) <= 1, scans
    assert len(re.findall(r"Scan ExistingRDD", plan)) >= 1
    # no window beyond the (pre-checkpoint) per-doc lag: the serving
    # plan itself is join + aggregate only
    assert "ntile" not in plan


def test_source_cap_uses_window_group_limit(spark, sf_dir):
    from trade_data_collection_service_spark.ext.pipeline import source_cap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(source_cap(docs, cap=25))
    # the per-source quota must push into WindowGroupLimit (local
    # top-cap per map task BEFORE the shuffle) — the property that
    # makes a viral domain ship `cap` rows per task, not its corpus
    assert "WindowGroupLimit" in plan
