"""Distributed BPE merge training — the tokenizer-construction step
of a training-data pipeline (Sennrich et al. 2016, arXiv:1508.07909),
run as an iterative Spark algorithm in the same style as the k-means
trainer (ext/kmeans.py): per iteration ONE distributed aggregation
and ONE driver-side scalar (the argmax pair), never corpus data.

Word-level BPE (the classic formulation): each distinct word becomes
a symbol sequence (characters + terminal ``</w>``) weighted by its
corpus frequency; each merge round counts adjacent symbol pairs over
the weighted vocabulary, picks the most frequent pair
(deterministic tie-break: lexicographic), and rewrites the
vocabulary map-side with a left-to-right non-overlapping fold.

Scale shape: after the initial word count the working set is the
DISTINCT-WORD vocabulary (weights carry corpus mass), so merge
rounds cost O(vocab), independent of corpus size — exactly how
production BPE trainers shard.  The pair count is a map-side-combined
groupBy; the winning pair is a ``.limit(1).collect()`` of one row
(bounded driver traffic, kmeans-style); the merge itself is an
``aggregate`` fold over each word's symbol array (no UDF, no
Python).  The vocabulary is ``localCheckpoint``-ed each round to cut
the growing lineage (same discipline as ext/cluster.py's iterative
connected components).

No DuckDB oracle: the algorithm is iterative with a data-dependent
argmax per round (the kmeans precedent — SURVEY.md §5's
pytest-verified class); determinism is total (exact integer counts +
lexicographic tie-break), locked by the known-corpus pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_WORD = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, weight) distinct-word vocabulary with corpus
    frequencies — the working set every merge round operates on."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    """word → array of single-character symbols + terminal marker."""
    return vocab.select(
        "word",
        "weight",
        F.concat(
            F.split(F.col("word"), ""),
            F.array(F.lit(END_WORD)),
        ).alias("syms"),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the vocabulary."""
    t = F.col("syms")
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("a"),
                F.element_at(t, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        symbols.select("weight", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("weight").alias("n"))
    )


def _merge_pair(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every word's symbol array merging adjacent (a, b) →
    a+b left-to-right without overlap — one aggregate fold per word
    (state: rewritten prefix + pending symbol), pure map-side."""
    merged = F.lit(a + b)
    fold = F.aggregate(
        "syms",
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("pend"),
        ),
        lambda acc, x: F.when(
            acc["pend"].isNull(),
            F.struct(acc["out"].alias("out"), x.alias("pend")),
        )
        .when(
            (acc["pend"] == a) & (x == b),
            # merge consumes both; nothing pends (prevents overlap
            # in runs like a,b,a,b and a,a,a with a==b)
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                x.alias("pend"),
            )
        ),
        lambda acc: F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
    )
    return symbols.select("word", "weight", fold.alias("syms"))


def train_bpe(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns (merges, final_symbols): ``merges`` is the ordered rule
    list [(left, right, weighted_count), ...]; ``final_symbols`` the
    segmented vocabulary after applying them.  Stops early when no
    pair occurs twice."""
    symbols = _initial_symbols(word_vocab(docs, text_col))
    symbols = symbols.localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(symbols)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, int(n)))
        symbols = _merge_pair(symbols, a, b).localCheckpoint(eager=False)
    return merges, symbols


def segment_words(
    words: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Apply learned merge rules, in order, to a (word, weight)
    frame — the tokenizer-apply side (same fold, broadcast-free:
    rules live in the plan)."""
    symbols = _initial_symbols(words)
    for a, b, _ in merges:
        symbols = _merge_pair(symbols, a, b)
    return symbols
