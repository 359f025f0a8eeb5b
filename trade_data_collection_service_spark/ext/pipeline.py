"""Training-data pipeline utilities over ``documents`` / ``events``:
deterministic sampling and split assignment, vocabulary building,
PII scrubbing, and event sessionization.

All pure column expressions (whole-stage codegen, no UDFs), each with
an exact DuckDB oracle twin in __spark_entry__.  Determinism contract:
every "random" choice is an md5-hex comparison on a salted key —
reproducible across engines, runs, and cluster sizes, and stable under
repartitioning (the classic requirement for dataset splits: a doc's
split must never depend on which executor saw it).

Scale notes:
- Sampling/split/scrub are map-only — no shuffle at all; they fuse
  into the parquet scan.
- vocab_topk shuffles (token, partial-count) pairs only — map-side
  combine collapses each partition's counts first — then TakeOrdered
  for the global top-k; never a full sort of the vocabulary.
- sessionize shuffles once on user_id (window partition key); the
  running-sum session numbering is the gaps-and-islands idiom
  (operators/gaps.py W4) applied to user activity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.text import with_tokens

# Per-language keep thresholds on the first two md5-hex chars of the
# salted doc key: P(prefix < 'cc') = 204/256 ≈ 80%, '80' → 50%,
# '40' → 25%.  Fixed-width lowercase hex compares lexicographically ==
# numerically, so the same string comparison runs on both engines.
SAMPLE_THRESHOLDS = {"en": "cc", "es": "80", "de": "40"}
SPLIT_SALT = "split-v1"


def _hash_prefix(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt + "|"), key)), 1, 2)


def _split_expr(prefix: Column) -> Column:
    """The ONE hash-range → train/val/test rule (prefix < '0a' test
    ~3.9%, < '14' val ~3.9%, else train), shared by the per-doc and
    grouped splits so the thresholds cannot desynchronize."""
    return (
        F.when(prefix < "0a", F.lit("test"))
        .when(prefix < "14", F.lit("val"))
        .otherwise(F.lit("train"))
    )


def stratified_sample(
    docs: DataFrame, thresholds: dict[str, str] | None = None, salt: str = "sample-v1"
) -> DataFrame:
    """Deterministic per-language downsampling (the language-rebalance
    step of corpus curation): keep a doc iff its salted hash prefix is
    below the language's threshold."""
    thresholds = thresholds or SAMPLE_THRESHOLDS
    prefix = _hash_prefix(F.col("doc_id").cast("string"), salt)
    thr: Column = F.lit("00")
    for lang, t in sorted(thresholds.items()):
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    return (
        docs.withColumn("hash_prefix", prefix)
        .filter(F.col("hash_prefix") < thr)
        .select("doc_id", "lang", "source", "hash_prefix")
        .orderBy("doc_id")
    )


def train_split(docs: DataFrame, salt: str = SPLIT_SALT) -> DataFrame:
    """Deterministic train/val/test assignment by hash range:
    prefix < '0a' → test (~3.9%), < '14' → val (next ~3.9%), else
    train.  Membership depends only on (salt, doc_id)."""
    prefix = _hash_prefix(F.col("doc_id").cast("string"), salt)
    return docs.select(
        "doc_id", "lang", _split_expr(prefix).alias("split")
    ).orderBy("doc_id")


def grouped_train_split(
    docs: DataFrame, group_col: str = "source", salt: str = SPLIT_SALT
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the hash key is the
    GROUP (source/domain/url-host), not the doc, so every document of
    a group lands on the same side of the split.  Near-duplicates
    cluster within a source — a per-doc split (``train_split``) puts
    one copy in train and its sibling in test, and the eval leaks;
    grouping by provenance is the standard defense (same motivation
    as the dedup ladder, applied to the split boundary).

    Same hash-range rule as ``train_split`` (shared ``_split_expr``;
    probabilities now hold at GROUP grain), deterministic in
    (salt, group).  The assignment itself is one projection — no
    group census, no join; the trailing ``orderBy`` is presentation
    only (the oracle compare is order-insensitive) and is the sole
    exchange in the plan — drop it when composing into a pipeline."""
    prefix = _hash_prefix(F.col(group_col).cast("string"), salt)
    return docs.select(
        "doc_id",
        F.col(group_col).alias("grp"),
        _split_expr(prefix).alias("split"),
    ).orderBy("doc_id")


def source_cap(docs: DataFrame, cap: int = 50) -> DataFrame:
    """Per-source quota (the C4/CCNet domain cap): keep at most
    ``cap`` docs per source, best quality first (ties → lowest
    doc_id), so no single domain dominates the training mix.

    Scale shape: the rank filter is a ``row_number() <= cap`` over
    (source | quality desc, doc_id), which Catalyst rewrites to a
    WindowGroupLimit — each map task keeps only its local top-``cap``
    per source BEFORE the shuffle (plan-asserted in
    tests/test_plans.py), so the exchange carries O(cap × sources ×
    partitions) rows, not the corpus.  That is exactly the per-domain
    selection a 100 TB curation run needs: a viral domain with 10⁹
    docs ships ``cap`` rows per map task, never 10⁹.

    Quality is :func:`~trade_data_collection_service_spark.ext.text.
    quality_of`'s score; the doc_id↔doc_id join to recover ``source``
    is key-aligned and pre-cap (the scorer's token arrays never cross
    the exchange — only (doc_id, score) pairs do)."""
    from trade_data_collection_service_spark.ext.text import quality_of

    q = quality_of(docs).select("doc_id", "quality_score")
    sided = docs.select("doc_id", "source").join(q, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    return (
        sided.withColumn(
            "src_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("src_rank") <= cap)
        .select("doc_id", "source", "quality_score", "src_rank")
        .orderBy("source", "src_rank")
    )


def split_leakage(
    docs: DataFrame, threshold: float = 0.5, salt: str = SPLIT_SALT
) -> DataFrame:
    """Train/test contamination audit: which near-duplicate pairs
    STRADDLE the per-doc train/val/test split?  Composes the LSH
    pair-finder with :func:`train_split`'s hash rule — the eval-leak
    check every curation run should close with (a test doc whose
    near-twin sits in train inflates the eval).

    Per-doc split sides are pure hash expressions on the pair columns
    (zero joins); recovering each side's ``source`` for the
    ``grouped_would_leak`` verdict joins the (tiny) verified-pair
    table to (doc_id, source) twice — candidate pairs, not the
    corpus, cross the exchange.  ``grouped_would_leak`` applies
    :func:`grouped_train_split`'s group-hash rule to both sources:
    same-source duplicate pairs (the common case — mirrors, reposts,
    boilerplate within a domain) can never straddle the grouped
    split, so the False rows quantify exactly how much leakage the
    provenance-hashed split closes; the residual True rows are
    cross-source duplicates, which only dedup (not split design)
    can fix."""
    from trade_data_collection_service_spark.ext.dedup import (
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(docs, threshold=threshold)

    def side(c: str) -> Column:
        # the ONE split rule, applied to a pair column — doc ids get
        # train_split's assignment, sources grouped_train_split's
        return _split_expr(_hash_prefix(F.col(c).cast("string"), salt))

    ids = docs.select("doc_id", "source")
    crossing = (
        pairs.withColumn("split_a", side("doc_a"))
        .withColumn("split_b", side("doc_b"))
        .filter(F.col("split_a") != F.col("split_b"))
    )
    return (
        crossing.join(
            ids.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
            ),
            "doc_a",
        )
        .join(
            ids.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "split_a",
            "split_b",
            (side("src_a") != side("src_b")).alias("grouped_would_leak"),
        )
        .orderBy("doc_a", "doc_b")
    )


def ab_conversion_chisq(
    events: DataFrame, window_hours: int = 4, salt: str = "ab-v1"
) -> DataFrame:
    """Experiment analysis: deterministic 50/50 A/B assignment of
    click events (md5 coin on event_id — the split/sampler idiom),
    conversion = a purchase by the same user within ``window_hours``
    (the event_attribution window), and the 2×2 chi-square statistic
    — the readout an experimentation pipeline runs per variant.

    The fixture's assignment is null (the coin ignores everything
    real), so chi² ≈ 0 is the EXPECTED reading — the operator proves
    the machinery, a real experiment supplies a real assignment
    column instead of the coin.  Only the statistic is emitted, not
    a p-value: the chi² CDF needs the incomplete gamma function,
    which is libm territory (engine-varying ulps) — at 1 dof the
    usual significance cutoffs (3.84 → p<.05) are constants the
    caller compares against.

    Scale shape: one user-equi range join (clicks ⋈ purchases, the
    attribution shape — SortMergeJoin on user with the time bound as
    residual), one per-click max, one global aggregate; the chi²
    arithmetic happens on four scalars.  All counts are exact
    integers; the statistic divides doubles in one fixed expression
    order, identical in the DuckDB twin."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("ts"))
        & (
            F.col("p_ts")
            <= F.col("ts") + F.expr(f"INTERVAL {window_hours} HOURS")
        ),
        "left",
    )
    per_click = joined.groupBy("event_id").agg(
        F.max(F.col("p_ts").isNotNull().cast("long")).alias("conv")
    )
    variant = F.when(
        _hash_prefix(F.col("event_id").cast("string"), salt) < "80",
        F.lit("A"),
    ).otherwise(F.lit("B"))
    cont = per_click.select(variant.alias("v"), "conv").agg(
        F.sum(F.when(F.col("v") == "A", F.col("conv"))).alias("conv_a"),
        F.sum(
            F.when(F.col("v") == "A", 1 - F.col("conv"))
        ).alias("miss_a"),
        F.sum(F.when(F.col("v") == "B", F.col("conv"))).alias("conv_b"),
        F.sum(
            F.when(F.col("v") == "B", 1 - F.col("conv"))
        ).alias("miss_b"),
    )
    a, b = F.col("conv_a").cast("double"), F.col("miss_a").cast("double")
    c, d = F.col("conv_b").cast("double"), F.col("miss_b").cast("double")
    n = ((a + b) + c) + d
    num = a * d - b * c
    denom = ((a + b) * (c + d)) * ((a + c) * (b + d))
    return cont.select(
        (F.col("conv_a") + F.col("miss_a")).alias("n_a"),
        F.col("conv_a"),
        (F.col("conv_b") + F.col("miss_b")).alias("n_b"),
        F.col("conv_b"),
        F.round(a / (a + b), 6).alias("rate_a"),
        F.round(c / (c + d), 6).alias("rate_b"),
        F.when(
            denom > 0, F.round((n * (num * num)) / denom, 6)
        ).alias("chi2"),
    )


def vocab_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus vocabulary: top-k tokens by total occurrences (ties →
    lexicographic), with document frequency — the tokenizer-training /
    stop-list precursor."""
    tok = with_tokens(docs).select(
        "doc_id", F.explode("tokens").alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token")
    ).limit(k)


# Planted-PII fixture (FIXTURES.md pattern): the synthetic corpus has
# no PII, so every 7th doc gets a deterministic email + long number
# appended — in the Spark source AND the oracle CTE — giving the
# scrubber real positives to find.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+"
PII_NUMBER_RE = r"[0-9]{3,}"


def documents_with_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com id 55501"),
        F.col("doc_id").cast("string"),
    )
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, planted).otherwise(F.col("text")),
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Scrub emails and long digit runs (phone/account-number proxy)
    from text; report per-doc hit counts and the md5 of the scrubbed
    text (full text stays out of the result — compare digests, not
    documents)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>"),
        PII_NUMBER_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(PII_NUMBER_RE)).cast("long").alias("n_numbers"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    ).orderBy("doc_id")


def sessionize(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-user sessionization: a gap > ``gap_minutes`` between
    consecutive events starts a new session.  One shuffle (window on
    user_id); the deterministic event order is (ts, event_id).

    Output: one row per session — (user_id, session_seq, session_start,
    session_end, n_events, total_value)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    # unix_micros rejects TIMESTAMP_NTZ (parquet naive timestamps are
    # inferred as NTZ under Spark 4's inferTimestampNTZ default); cast
    # to TIMESTAMP first — sessions are pinned UTC, so the reinterpret
    # is lossless and cancels in the difference anyway.
    ts = F.col("ts")
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        ts = ts.cast("timestamp")
    new_session = (
        (F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w)))
        > F.lit(gap_us)
    ).cast("int")
    sess = events.withColumn(
        "session_seq",
        F.sum(F.coalesce(new_session, F.lit(1))).over(w).cast("long"),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # decimal-sum determinism (memory rule: never hash-compare
            # a float sum whose accumulation order can differ)
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessionization via Spark's built-in ``session_window``
    — the merging-session-windows aggregation operator, the same one
    Structured Streaming uses for streaming sessionization, so this is
    the engine's streaming-ready twin of :func:`sessionize` (which
    builds sessions with an analytic lag/sum window instead).

    Boundary semantics match ``sessionize`` exactly: Spark merges an
    event landing exactly ``gap`` after the previous one into the same
    session (window end ``last+gap`` is inclusive for the merge test),
    i.e. only a strictly-greater gap starts a new session — verified
    by tests/test_pipeline_ops.py, so the two forms are
    session-for-session identical and share the islands oracle.

    One shuffle on (user_id, merged window); no analytic pass, no
    per-user sort — at 100 TB this is strictly cheaper than the
    lag/sum form because the partial aggregation merges windows
    map-side before the exchange.

    Output: (user_id, session_start, session_end, n_events,
    total_value), one row per session, ordered for the oracle."""
    ts = F.col("ts")
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        ts = ts.cast("timestamp")
    return (
        events.withColumn("ts_c", ts)
        .groupBy(
            "user_id", F.session_window("ts_c", f"{gap_minutes} minutes")
        )
        .agg(
            F.min("ts_c").alias("session_start"),
            F.max("ts_c").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


def heavy_hitters(docs: DataFrame, phi: float = 0.001) -> DataFrame:
    """Exact corpus-relative heavy hitters over bigram phrases: every
    consecutive word pair whose occurrence count is >= ``phi`` x the
    total bigram count, with its corpus frequency.  The classic
    streaming problem (Misra-Gries / SpaceSaving approximate it) is
    EXACT here in two aggregates: Spark's map-side partial aggregation
    is already the per-partition candidate compaction those sketches
    hand-roll, so one phrase-count shuffle + a 1-row broadcast total
    (the repo's no-collect scalar idiom) gives the exact answer with
    sketch-like shuffle volume — (phrase, partial_count) pairs cross
    the wire, never document text.

    Unlike ``vocab_topk`` (fixed k) the output adapts to the corpus:
    a phrase qualifies by its share, so the result is scale-invariant
    under corpus growth with stable phrase distribution — the
    boilerplate/template-phrase detector of a curation pipeline."""
    t = F.col("tokens")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tok = with_tokens(docs).select(F.explode(bigrams).alias("phrase"))
    counts = tok.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occurrences"))
    total = counts.agg(F.sum("n_occurrences").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences")
            >= (F.lit(phi) * F.col("n_total")).cast("double")
        )
        .select(
            "phrase",
            "n_occurrences",
            F.round(
                F.col("n_occurrences").cast("double") / F.col("n_total"), 8
            ).alias("frequency"),
        )
        .orderBy(F.col("n_occurrences").desc(), "phrase")
    )


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n: int = 10,
    salt: str = "res-v1",
) -> DataFrame:
    """Deterministic fixed-size sample per group ("reservoir" by salted
    hash rank): the n smallest md5(salt|id) per group.  Unlike a true
    reservoir it is reproducible and stable under repartitioning and
    re-runs — the property an eval-set builder needs.  One shuffle on
    the group key; rows beyond rank n never leave the exchange
    (window + filter → rank pushdown via WindowGroupLimit)."""
    key = F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key, id_col)
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= n)
        .select(group_col, id_col, "rk")
        .orderBy(group_col, "rk")
    )


def decontaminate(
    docs: DataFrame,
    k: int = 3,
    salt: str = "bench-v1",
    threshold: str = "08",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any k-word
    shingle with the (held-out) benchmark set.

    The benchmark membership is a deterministic salted-hash cut
    (prefix < threshold ⇒ ~3% of docs), standing in for a real eval
    suite.  Scale shape: the benchmark's distinct shingle set is
    SMALL (eval suites are thousands of docs, not billions) and
    BROADCASTS; the training corpus explodes its shingles once and
    hits the broadcast hash set — a map-side join, so the corpus
    itself never shuffles on shingle text.  The only shuffle is the
    per-doc hit-count groupBy on doc_id.  This is the standard
    13-gram-overlap decontamination from LLM-training practice
    (GPT-3/PaLM-style), restated as two DataFrame joins.
    """
    from trade_data_collection_service_spark.ext.dedup import (
        exploded_shingles,
    )

    # exploded_shingles inlines the shingle generator into explode —
    # routing it through withColumn + explode(col) made Generate
    # re-evaluate the array construction per OUTPUT shingle (6.9 s →
    # 1.4 s for this query at sf0.1; the trap is documented on
    # exploded_shingles itself).
    is_bench = _hash_prefix(F.col("doc_id").cast("string"), salt) < threshold
    bench_shingles = (
        exploded_shingles(docs.filter(is_bench), k=k)
        .select(F.col("sh").alias("s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE shingle construction per train doc: explode first, LEFT-join
    # the broadcast benchmark set to tag hits, and take totals + hit
    # counts in a single aggregation.
    train = exploded_shingles(docs.filter(~is_bench), k=k).select(
        "doc_id", F.col("sh").alias("s")
    )
    return (
        train.join(F.broadcast(bench_shingles), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count("_hit").cast("long").alias("n_hit_shingles"),
        )
        .filter(F.col("n_hit_shingles") > 0)
        .select(
            "doc_id",
            "n_hit_shingles",
            "n_shingles",
            F.round(F.col("n_hit_shingles") / F.col("n_shingles"), 6).alias(
                "hit_ratio"
            ),
        )
        .orderBy("doc_id")
    )


def pack_sequences(
    docs: DataFrame, budget: int = 512, salt: str = "pack-v1"
) -> DataFrame:
    """Deterministic sequence packing: assign each doc a (pack_group,
    bin_id, start_offset) so docs concatenate into ~budget-token
    training sequences.

    Packing is inherently order-dependent, so the order is pinned to
    md5(salt|doc_id) — reproducible across runs, engines, and cluster
    layouts.  Scale shape: the hash prefix splits the corpus into 256
    independent packing streams, so the running-token-offset window
    sorts WITHIN partitions (a partitioned window, never a global
    sort); each stream packs greedily by cumulative token count, and
    a doc's bin is the bin containing its start offset.  At 100 TB
    you'd raise the group count (4 hex chars → 65k streams) to keep
    per-stream sort volumes flat — the plan shape is unchanged.
    """
    t = with_tokens(docs).select(
        "doc_id", F.size("tokens").cast("long").alias("n_tokens")
    )
    key = F.md5(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string")))
    g = t.withColumn("order_key", key).withColumn(
        "pack_group", F.substring("order_key", 1, 2)
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("order_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return (
        g.withColumn("start_offset", offset)
        .select(
            "doc_id",
            "pack_group",
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / budget).cast("long").alias("bin_id"),
        )
        .orderBy("doc_id")
    )


def _md5_uniform(key: Column, salt: str) -> Column:
    """The deterministic uniform coin every sampler here shares: the
    first 32 md5 bits of ``salt|key`` scaled to [0,1) — exact
    integer-valued double arithmetic, bit-identical across engines,
    runs, and partitionings.  ONE home (r11 review): the expression
    is exactness-critical, and a fork between two samplers would
    silently decorrelate their draws."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )


def importance_sample(
    scored_docs: DataFrame,
    prob_col: str = "quality_score",
    salt: str = "imp-v1",
) -> DataFrame:
    """Quality-weighted (importance) sampling: keep each doc with
    probability = clamp(prob_col, 0, 1) — higher-quality docs survive
    more often, the standard soft quality filter between a hard
    threshold and keep-everything.

    Deterministic like every sampler here: the "uniform" draw is the
    first 32 md5 bits of the salted doc id scaled to [0,1) — exact
    integer-valued double arithmetic, so the SAME docs are kept on any
    engine, run, or partitioning.  Map-only: fuses into the scan,
    zero shuffle."""
    u = _md5_uniform(F.col("doc_id"), salt)
    p = F.least(F.greatest(F.col(prob_col), F.lit(0.0)), F.lit(1.0))
    return (
        scored_docs.withColumn("u", F.round(u, 6))
        .filter(u < p)
        .select("doc_id", F.col(prob_col).alias("keep_prob"), "u")
        .orderBy("doc_id")
    )


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    standard pre-training/RAG preparation step (pack_sequences'
    complement: that op concatenates short docs, this one splits long
    ones).

    Chunks start every ``chunk_tokens - overlap`` tokens and carry
    ``chunk_tokens`` tokens (the final chunk may be shorter); every
    document yields at least one chunk.  Map-only: sequence + slice +
    posexplode inside codegen, a 1-to-N fan-out with no shuffle, so it
    scales with scan bandwidth.  Results carry the chunk digest, not
    the text (compare digests, not documents).

    Output: (doc_id, chunk_id, start_token, n_chunk_tokens, chunk_md5).
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    stride = chunk_tokens - overlap
    t = with_tokens(docs)
    chunks = t.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("tokens"), F.lit(stride)),
                lambda s: F.struct(
                    s.alias("start_token"),
                    F.slice("tokens", s, chunk_tokens).alias("chunk"),
                ),
            )
        ).alias("pos", "c"),
    )
    return chunks.select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("chunk_id"),
        F.col("c.start_token").cast("long").alias("start_token"),
        F.size("c.chunk").cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", "c.chunk")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


def daily_event_counts(events: DataFrame) -> DataFrame:
    """Per (event_type, day) counts — the tiny state table the anomaly
    scorer reads (O(types × days) rows regardless of event volume;
    map-side combined)."""
    return events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))


def densify_daily_counts(daily: DataFrame) -> DataFrame:
    """Fill each event_type's day grid (min..max day) with zero-count
    rows for absent days.  A total ingest outage emits NO rows into
    the counts table — the primary signal the reference watchdog
    detects via resampled missing dates (data_quality_check.py:248-250)
    — so the scorer must see those days as n_events=0, not skip them.
    The grid is O(types × days) rows: the per-type span aggregate is a
    tiny two-scalar groupBy and the sequence explode is map-side."""
    grid = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    return grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )


def anomaly_scores(daily: DataFrame, z_threshold: float = 2.5) -> DataFrame:
    """Score daily counts against the trailing 7-day baseline
    (mean/std over rows -7..-1).  The counts are densified first
    (``densify_daily_counts``), so 7 preceding ROWS is exactly 7
    preceding CALENDAR days and an outage day scores as n_events=0 —
    a large NEGATIVE z.  Flags on |z| > threshold: spikes and drops
    are both anomalies.  Window state is 7 rows per event_type; mean
    and std are rounded before the z-score so the flag is
    engine-portable; days without enough history (std undefined or
    zero) are never flagged."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    scored = densify_daily_counts(daily).withColumn(
        "base_mean", F.round(F.avg("n_events").over(w), 6)
    ).withColumn("base_std", F.round(F.stddev_samp("n_events").over(w), 6))
    z = F.when(
        F.col("base_std") > 0,
        F.round((F.col("n_events") - F.col("base_mean")) / F.col("base_std"), 6),
    )
    return (
        scored.withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("z")) > z_threshold, F.lit(False)),
        )
        .orderBy("event_type", "day")
    )


def event_anomaly(events: DataFrame, z_threshold: float = 2.5) -> DataFrame:
    """Windowed volume-anomaly detection: per (event_type, day) counts
    scored against the trailing 7-day baseline — the standard
    data-quality tripwire on an ingest pipeline.  Composition of
    ``daily_event_counts`` + ``anomaly_scores``; the streaming twin
    (streaming/anomaly.py) maintains the counts table incrementally
    and reads scores off it with the identical scorer."""
    return anomaly_scores(daily_event_counts(events), z_threshold)


def window_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_minutes: int = 30,
) -> DataFrame:
    """ClickHouse ``windowFunnel`` analog (the reference stack's
    engine ships it as a native aggregate): per user, the deepest
    funnel level k such that events of type ``steps[0..k-1]`` occur in
    order within ``window_minutes`` of the FIRST step's event.

    Chain semantics: non-strict order (equal timestamps allowed,
    ties resolved by event time only), window anchored at the level-1
    event — ``ts_k - ts_1 <= window`` for every accepted chain.

    Implementation is pure window algebra, no explode and no
    self-joins: one shuffle on user_id, then k-1 conditional
    range-window passes over the SAME sort order (Catalyst reuses the
    sort).  Each row of type steps[j] carries the best (latest)
    level-1 anchor of any accepted steps[j-1] row in the trailing
    window; a chain is accepted when that anchor is still within
    ``window`` of the current row.  Carrying the ANCHOR time (not the
    previous step's time) is what pins the whole chain to the level-1
    event, matching windowFunnel.

    At 100 TB: state is per-user sorted ranges — the same shape as
    sessionization; no candidate blowup because each row carries one
    anchor, not a set."""
    w_us = window_minutes * 60 * 1_000_000
    ts = F.col("ts")
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        ts = ts.cast("timestamp")
    ev = events.withColumn("ep", F.unix_micros(ts))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep")
        .rangeBetween(-w_us, Window.currentRow)
    )
    # anchor[j] (per row): latest level-1 time starting an accepted
    # j-step chain whose step-j row is in the trailing window.
    accepted_anchor = F.when(
        F.col("event_type") == steps[0], F.col("ep")
    )  # level 1: a row anchors itself
    row_levels = [
        F.when(F.col("event_type") == steps[0], F.lit(1)).otherwise(0)
    ]
    for j, step in enumerate(steps[1:], start=2):
        best_prev = F.max(accepted_anchor).over(w)
        row_ok = (
            (F.col("event_type") == step)
            & best_prev.isNotNull()
            & (best_prev >= F.col("ep") - F.lit(w_us))
        )
        accepted_anchor = F.when(row_ok, best_prev)
        row_levels.append(F.when(row_ok, F.lit(j)).otherwise(0))
    # per-row level, then a plain aggregate — the k-1 range windows
    # share ONE sort/exchange and the groupBy reuses its partitioning
    # (plan: 1 data exchange + 1 presentation sort, any k)
    flagged = ev.select(
        "user_id", F.greatest(*row_levels).alias("_lvl")
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.max("_lvl").cast("int").alias("funnel_level"))
        .orderBy("user_id")
    )


def retention_matrix(events: DataFrame) -> DataFrame:
    """Cohort retention (the ClickHouse ``retention`` aggregate
    generalized to the standard cohort matrix): users are cohorted by
    the day of their first event; for every (cohort_day, day_offset)
    the count of cohort users active that day.

    Two aggregations + one equi-join on user_id — the join key is the
    same as the aggregation key, so at scale the per-user firsts
    co-partition with the per-user activity (no broadcast needed, no
    skew: one row per user on each side)."""
    ts = F.col("ts")
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        ts = ts.cast("timestamp")
    # day as a truncated TIMESTAMP, not DATE — the repo's convention
    # (event_anomaly does the same): DATE round-trips differently
    # through pandas in the two engines.
    ev = events.withColumn("day", F.date_trunc("day", ts))
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.select("user_id", "day").distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Trailing-N-day distinct active users per day (rolling DAU/WAU) —
    the engagement twin of daily_event_counts, and a window no SQL
    engine can express as a frame spec (COUNT(DISTINCT) has no
    windowed form): instead each event is fanned out to the
    ``window_days`` report-days it is visible in via a map-side
    ``sequence``+``explode`` (bounded 1-to-N, no shuffle), then ONE
    exact count-distinct per report-day.

    Report days are restricted to days that actually saw events (the
    trailing fan-out would otherwise invent up to N−1 empty days past
    the data's end); the day list is an aggregate-sized dimension, so
    the semi-join broadcasts.

    Scale shape: fan-out is linear (window_days × events) and
    map-only; the count-distinct shuffles (day, user) pairs once,
    partially deduplicated map-side.  No window over an unpartitioned
    day axis anywhere."""
    ts = F.col("ts")
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        ts = ts.cast("timestamp")
    day = F.date_trunc("day", ts)
    contrib = events.select(
        F.explode(
            F.sequence(
                day,
                F.timestamp_add("DAY", F.lit(window_days - 1), day),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
        "user_id",
    )
    real_days = events.select(day.alias("day")).distinct()
    return (
        contrib.join(F.broadcast(real_days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias(f"active_users_{window_days}d"))
        .orderBy("day")
    )


def chunk_dupes(docs: DataFrame, chunk_tokens: int = 32) -> DataFrame:
    """Cross-document duplicated chunks — boilerplate detection at
    sub-document granularity (the practical stand-in for suffix-array
    substring dedup): documents are cut into aligned fixed-size token
    chunks (``chunk_documents`` with zero overlap), trailing partial
    chunks are dropped (unequal lengths never compare equal), and a
    digest groupBy reports every chunk text shared by more than one
    document.

    Scale shape: the only shuffle carries (chunk_md5, doc_id) pairs —
    digests, never text — partially aggregated map-side; identical to
    the exact_dedup shape but at chunk grain (dedup.py:74)."""
    full = chunk_documents(docs, chunk_tokens, 0).filter(
        F.col("n_chunk_tokens") == chunk_tokens
    )
    return (
        full.groupBy("chunk_md5")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("chunk_md5")
    )


def mixture_weights(docs: DataFrame) -> DataFrame:
    """Per-source sampling weights that rebalance the corpus to a
    UNIFORM source mix — the domain-reweighting step a training-data
    pipeline runs before sampling (compose with
    ``importance_sample``: multiply each document's keep-probability
    by its source's weight and the expected post-sampling mix is
    uniform across sources).

    weight_s = n_total / (n_sources · n_s): > 1 for under-represented
    sources, < 1 for over-represented ones; Σ_s n_s·weight_s =
    n_total, so total expected volume is preserved.

    Scale shape: one map-side-combined groupBy(source) — the result
    is dimension-sized — plus a 1-row broadcast scalar for the
    totals.  The census is a lazy localCheckpoint boundary: it is
    referenced by both the totals aggregate and the output, and
    Catalyst re-derives unshared subplans per reference — without the
    boundary the CORPUS scan behind it runs once per reference
    (plan-asserted in tests/test_plans.py for the α variant).
    All-integer inputs make every emitted double an exact IEEE
    quotient in both engines."""
    per = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    tot = per.agg(
        F.sum("n_docs").alias("n_total"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("n_total")).alias(
                "share"
            ),
            (
                F.col("n_total").cast("double")
                / (F.col("n_sources") * F.col("n_docs"))
            ).alias("weight"),
        )
        .orderBy("source")
    )


def temperature_mixture_weights(
    docs: DataFrame, alpha: float = 0.3
) -> DataFrame:
    """Temperature-/α-sampled source mixture (Conneau et al. 2020,
    XLM-R §3.1; the mT5/multilingual-pretraining recipe): the target
    mix is q_s ∝ p_s^α — α=1 keeps the natural mix, α→0 approaches
    uniform (:func:`mixture_weights` is exactly that limit), and the
    usual 0.2–0.7 range up-samples the tail without letting a huge
    head source drown it.  Emits per source the natural share p_s,
    the target share q_s, the sampling weight q_s/p_s (multiply into
    a sampler's keep-probability), and the expected post-sampling doc
    count q_s·n_total (total volume preserved: Σ q_s = 1).

    Scale shape: identical to ``mixture_weights`` — one
    map-side-combined dimension-sized groupBy(source) plus 1-row
    broadcast scalars; the α-power normalizer is a second aggregate
    over the DIMENSION table (n_sources rows), never the corpus.

    Determinism: pow is libm-class (like the ln family), so each
    p_s^α is rounded to 12 dp and decimal-summed — the normalizer is
    bit-identical across engines; every emitted double is a quotient
    of exact operands."""
    # lazy checkpoint: per/powered are each referenced twice and the
    # corpus census would otherwise be re-scanned per reference
    per = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    tot = per.agg(F.sum("n_docs").alias("n_total"))
    p = F.col("n_docs").cast("double") / F.col("n_total")
    powered = per.crossJoin(F.broadcast(tot)).withColumn(
        "p_alpha",
        F.round(F.pow(p, F.lit(float(alpha))), 12).cast("decimal(20,12)"),
    )
    powered = powered.localCheckpoint(eager=False)
    norm = powered.agg(F.sum("p_alpha").alias("z"))
    # divide as DOUBLES of bit-identical decimal operands — decimal
    # division scale rules differ between engines, double division
    # of identical operands cannot
    q = F.col("p_alpha").cast("double") / F.col("z").cast("double")
    return (
        powered.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            p.alias("share"),
            q.alias("target_share"),
            (q / p).alias("weight"),
            (q * F.col("n_total")).alias("expected_docs"),
        )
        .orderBy("source")
    )


def resampled_mixture(
    docs: DataFrame,
    alpha: float = 0.3,
    base_rate: float = 0.5,
    salt: str = "mix-v1",
) -> DataFrame:
    """The composition :func:`temperature_mixture_weights` and
    :func:`importance_sample` exist for (VERDICT r10 #8): actually
    RESAMPLE the corpus toward the α-tempered target mix and report
    the achieved per-source mix.  Each document's keep-probability is
    ``min(1, base_rate · weight_source)`` — the per-source weight
    q_s/p_s multiplied into a global sampling rate, exactly what the
    two operators' docstrings describe — drawn with the
    importance_sample md5 coin (same salt discipline: deterministic,
    map-only, engine-portable).

    Output, per source: n_docs (natural), n_kept (post-sample),
    target_share (q_s), achieved_share (n_kept / Σ n_kept) — target
    vs achieved side by side is the tuning readout; they converge as
    n_s grows except where min(1, ·) clips an up-weighted tail
    source (base_rate · weight > 1 cannot over-sample without
    replacement — visible as achieved < target, the honest cap).

    Scale shape: the weight table is dimension-sized (broadcast
    back onto the corpus for the one map-side filter pass); two
    corpus scans total — one for the census behind the weights, one
    for the sampling pass — which is the floor for any
    census-then-sample design.  All comparisons are exact IEEE on
    engine-identical operands (the weight doubles are quotients of
    bit-identical decimals; the draw is an exact integer-valued
    double)."""
    w = temperature_mixture_weights(docs, alpha).select(
        "source", "n_docs", "target_share", "weight"
    )
    u = _md5_uniform(F.col("doc_id"), salt)
    p = F.least(F.lit(1.0), F.lit(float(base_rate)) * F.col("weight"))
    kept = (
        docs.select("doc_id", "source")
        .join(F.broadcast(w.select("source", "weight")), "source")
        .filter(u < p)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    joined = w.join(kept, "source", "left").withColumn(
        "n_kept", F.coalesce("n_kept", F.lit(0)).cast("long")
    )
    joined = joined.localCheckpoint(eager=False)  # dimension-sized;
    # referenced by the total and the output below
    total = joined.agg(F.sum("n_kept").alias("total_kept"))
    return (
        joined.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_kept",
            "target_share",
            (
                F.col("n_kept").cast("double") / F.col("total_kept")
            ).alias("achieved_share"),
        )
        .orderBy("source")
    )


def funnel_rates(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_minutes: int = 30,
) -> DataFrame:
    """Funnel conversion summary over ``window_funnel``: per level,
    how many users reached AT LEAST that level, the conversion from
    the funnel's top, and the step-over-step conversion — the numbers
    a funnel dashboard actually renders.

    Each user's deepest level fans out map-only to the 1..level rows
    it witnesses (levels are the constant-sized step list), then one
    count per level; the rate windows run over exactly
    ``len(steps)`` rows, so the unpartitioned orderBy is bounded by
    the funnel definition, not the data."""
    f = window_funnel(events, steps, window_minutes)
    reach = (
        f.filter(F.col("funnel_level") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.col("funnel_level"))
            ).alias("level")
        )
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.orderBy("level").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return reach.select(
        F.col("level").cast("long").alias("level"),
        "n_users",
        (
            F.col("n_users").cast("double") / F.first("n_users").over(w)
        ).alias("conversion_from_start"),
        (
            F.col("n_users").cast("double")
            / F.lag("n_users").over(Window.orderBy("level"))
        ).alias("step_conversion"),
    ).orderBy("level")


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every ordered pair of consecutive events (by ts,
    tie-broken on event_id) the transition count and row-normalized
    probability — the session-flow model behind next-action
    prediction and funnel diagnosis.

    One window lead per user (the events table's natural layout) and
    one event_type x event_type groupBy — the output is
    vocabulary-squared-sized, independent of data volume, and the
    probability divides two exact counts (identical operands in both
    engines, no rounding needed)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wf)).alias("p"),
    ).orderBy("from_type", "to_type")


def event_paths_topk(events: DataFrame, depth: int = 3, k: int = 10) -> DataFrame:
    """Top-k opening paths: each user's first ``depth`` events (by ts,
    tie-broken on event_id) joined into a ">"-separated path string,
    counted across users — the onboarding-flow census.

    One window rank per user, a depth-bounded sort_array per user
    (``depth`` structs, constant state), one path groupBy with
    map-side combine, and a TakeOrderedAndProject for the top-k
    (count desc, path asc tiebreak — deterministic)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= depth)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("path_len"),
        )
    )
    return (
        paths.groupBy("path", "path_len")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(k)
    )


def conversion_latency(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "4 hours"
) -> DataFrame:
    """Time-to-convert distribution by hour of click: for each click
    with a purchase inside the attribution horizon, the latency to
    the FIRST such purchase, summarized per click hour-of-day — the
    campaign-timing read on top of the attribution join
    (streaming/interval_join.py supplies the pair definition, so the
    batch summary and the stream-stream join can never disagree on
    what a conversion is).

    Latencies are exact epoch-microsecond differences (integer
    arithmetic end to end); the median interpolates two longs
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the
    price_percentiles contract), and mean divides an exact long sum.
    Shape: the user_id-partitioned interval join, one min-per-click
    groupBy (map-side combined), then a 24-row hour groupBy."""
    from trade_data_collection_service_spark.streaming.interval_join import (
        attribution_pairs,
    )

    pairs = attribution_pairs(clicks, purchases, horizon)
    first = pairs.groupBy("user_id", "click_id", "click_ts").agg(
        F.min("purchase_ts").alias("first_purchase_ts")
    )
    # unix_micros rejects TIMESTAMP_NTZ (see sessionize note); the
    # cast is a lossless UTC reinterpret and cancels in the difference
    ts_c = F.col("click_ts").cast("timestamp")
    ts_p = F.col("first_purchase_ts").cast("timestamp")
    lat_us = F.unix_micros(ts_p) - F.unix_micros(ts_c)
    lat = first.select(
        F.hour("click_ts").cast("long").alias("click_hour"),
        lat_us.alias("lat_us"),
    )
    return (
        lat.groupBy("click_hour")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            (F.min("lat_us") / F.lit(1e6)).alias("min_latency_s"),
            (F.max("lat_us") / F.lit(1e6)).alias("max_latency_s"),
            F.round(
                F.percentile("lat_us", F.lit(0.5)) / F.lit(1e6), 6
            ).alias("p50_latency_s"),
            F.round(
                (
                    F.sum("lat_us").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(1e6)
                ),
                6,
            ).alias("mean_latency_s"),
        )
        .orderBy("click_hour")
    )
