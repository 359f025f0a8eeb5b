"""Property-based tests for the passage-dedup family (r8) against an
independent pure-Python reference (the test_asof_ema_properties
pattern): random small-alphabet corpora force heavy gram collisions,
internal repetition, adjacency merges, and fully-duplicated docs —
the planted-corpus tests' edge space, sampled instead of enumerated.
Example counts stay small: each example runs Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trade_data_collection_service_spark.ext.dedup import (
    dedup_passages_keep_first,
    duplicate_spans,
    strip_duplicate_spans,
)

K = 3  # small k so short random docs produce windows


def _ref_hits(corpus: dict[int, list[str]], keep_first: bool):
    """Reference: positioned K-gram census over the token lists."""
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    for doc_id in sorted(corpus):
        toks = corpus[doc_id]
        for i in range(len(toks) - K + 1):
            occ.setdefault(tuple(toks[i : i + K]), []).append((doc_id, i + 1))
    hits: dict[int, set[int]] = {}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        marked = sorted(sites)[1:] if keep_first else sites
        for doc_id, start in marked:
            hits.setdefault(doc_id, set()).add(start)
    return hits


def _ref_spans(corpus, keep_first=False):
    spans = {}
    for doc_id, starts in _ref_hits(corpus, keep_first).items():
        cur = None
        for s in sorted(starts):
            if cur is not None and s <= cur[1] + 1:  # overlap or adjacency
                cur = (cur[0], max(cur[1], s + K - 1), cur[2] + 1)
            else:
                if cur:
                    spans.setdefault(doc_id, []).append(cur)
                cur = (s, s + K - 1, 1)
        if cur:
            spans.setdefault(doc_id, []).append(cur)
    return spans


def _ref_strip(corpus, keep_first):
    out = {}
    spans = _ref_spans(corpus, keep_first)
    for doc_id, toks in corpus.items():
        covered = set()
        for s, e, _ in spans.get(doc_id, []):
            covered.update(range(s, e + 1))
        kept = [t for i, t in enumerate(toks, start=1) if i not in covered]
        out[doc_id] = (" ".join(kept), len(toks) - len(kept))
    return out


@st.composite
def corpus_case(draw):
    n_docs = draw(st.integers(min_value=1, max_value=5))
    words = ["aa", "bb", "cc"]  # 3-letter alphabet -> heavy collisions
    return {
        doc_id: [
            draw(st.sampled_from(words))
            for _ in range(draw(st.integers(1, 12)))
        ]
        for doc_id in range(1, n_docs + 1)
    }


def _docs_df(spark, corpus):
    return spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], ["doc_id", "text"]
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_case())
def test_duplicate_spans_match_reference(spark, corpus):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(_docs_df(spark, corpus), k=K).collect()
    }
    want = {
        (doc_id, s, e, n)
        for doc_id, spans in _ref_spans(corpus).items()
        for s, e, n in spans
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_case())
def test_strip_and_keep_first_match_reference(spark, corpus):
    df = _docs_df(spark, corpus)
    got_strip = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in strip_duplicate_spans(df, k=K).collect()
    }
    assert got_strip == _ref_strip(corpus, keep_first=False)
    got_kf = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in dedup_passages_keep_first(df, k=K).collect()
    }
    assert got_kf == _ref_strip(corpus, keep_first=True)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_case())
def test_hashed_grams_equal_literal_on_random_corpora(spark, corpus):
    """hash_grams (128-bit md5 keys) is output-identical to literal
    grams across the sampled edge space — the heavy-collision
    3-word-alphabet corpora stress exactly the grouping/joining the
    key swap touches."""
    df = _docs_df(spark, corpus)
    lit_spans = sorted(
        tuple(r) for r in duplicate_spans(df, k=K).collect()
    )
    hashed = sorted(
        tuple(r) for r in duplicate_spans(df, k=K, hash_grams=True).collect()
    )
    assert lit_spans == hashed
    lit_kf = sorted(
        tuple(r) for r in dedup_passages_keep_first(df, k=K).collect()
    )
    hashed_kf = sorted(
        tuple(r)
        for r in dedup_passages_keep_first(
            df, k=K, hash_grams=True
        ).collect()
    )
    assert lit_kf == hashed_kf
