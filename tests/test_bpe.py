"""Distributed BPE trainer (ext/bpe.py): merge rules learned on a
known corpus must match a hand-run of the Sennrich algorithm, the
merge fold must be left-to-right non-overlapping (the classic
``aaa`` / ``abab`` traps), and apply-side segmentation must round-trip
the learned rules."""

from __future__ import annotations

import collections

from trade_data_collection_service_spark.ext.bpe import (
    END_WORD,
    segment_words,
    train_bpe,
    word_vocab,
)


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference implementation: textbook pair-count + merge loop
    with the same lexicographic tie-break."""
    vocab = {
        tuple(list(w) + [END_WORD]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b, n))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges, vocab


def test_bpe_matches_reference_on_known_corpus(spark):
    # Sennrich-style toy corpus: "low lower lowest newest widest"
    text = "low low low lower lower newest newest newest newest widest"
    docs = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    freqs = collections.Counter((text + " " + text).split())
    want_merges, want_vocab = _py_bpe(dict(freqs), 8)
    got_merges, got_syms = train_bpe(docs, 8)
    assert got_merges == want_merges
    got_vocab = {
        tuple(r["syms"]): r["weight"] for r in got_syms.collect()
    }
    assert got_vocab == {k: v for k, v in want_vocab.items()}


def test_merge_fold_is_left_to_right_non_overlapping(spark):
    # 'aaaa' with merge (a,a): left-to-right gives [aa, aa], never
    # the overlapping [a, aa, a] or greedy-wrong [aa, a, a]
    docs = spark.createDataFrame(
        [(1, "aaaa aaa abab")], ["doc_id", "text"]
    )
    words = word_vocab(docs)
    seg = {
        r["word"]: r["syms"]
        for r in segment_words(words, [("a", "a", 0)]).collect()
    }
    assert seg["aaaa"] == ["aa", "aa", END_WORD]
    assert seg["aaa"] == ["aa", "a", END_WORD]
    ab = {
        r["word"]: r["syms"]
        for r in segment_words(words, [("a", "b", 0)]).collect()
    }
    assert ab["abab"] == ["ab", "ab", END_WORD]


def test_bpe_early_stop_when_no_repeats(spark):
    docs = spark.createDataFrame([(1, "xy")], ["doc_id", "text"])
    merges, _ = train_bpe(docs, 10)
    assert merges == []  # every pair occurs once: below threshold


def test_batched_equals_sequential_on_planted_corpus(spark):
    """VERDICT r6 #2: the batched trainer must produce the IDENTICAL
    ordered rule list as the one-rule-per-round classic loop.  Planted
    corpus mixes disjoint frequent pairs (batchable) with interacting
    runs (forces the guards): same rules, same final vocabulary."""
    import random

    rng = random.Random(42)
    alphabet = "abcdefgh"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(120)
    ]
    # plant heavy disjoint pairs and interacting chains
    words += ["lo", "low", "lower", "lowest"] * 9
    words += ["ababab", "aaab", "bba"] * 7
    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])

    seq_stats: dict = {}
    bat_stats: dict = {}
    seq_merges, seq_syms = train_bpe(docs, 18, batch=1, stats=seq_stats)
    bat_merges, bat_syms = train_bpe(docs, 18, batch=8, stats=bat_stats)
    assert bat_merges == seq_merges
    assert len(seq_merges) == 18
    # and both match the textbook reference
    freqs = collections.Counter(text.split())
    want_merges, want_vocab = _py_bpe(dict(freqs), 18)
    assert seq_merges == want_merges
    got_vocab = {tuple(r["syms"]): r["weight"] for r in bat_syms.collect()}
    assert got_vocab == want_vocab
    # batching must actually cut the round count (the job envelope)
    assert seq_stats["rounds"] == 18
    assert bat_stats["rounds"] < 18


def test_batched_equals_sequential_many_disjoint_pairs(spark):
    """A corpus whose top pairs are mutually disjoint at strictly
    descending counts compresses many rules into ONE round; rule
    order must still match sequential."""
    # doubled pairs inside each word push (a,b)/(c,d)/(e,f) strictly
    # above the 50/40/30-count interacting tail ((b,a), (q,</w>), ...)
    text = " ".join(["ababq"] * 50 + ["cdcdr"] * 40 + ["efefs"] * 30)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    stats: dict = {}
    bat, _ = train_bpe(docs, 3, batch=16, stats=stats)
    seq, _ = train_bpe(docs, 3, batch=1)
    assert bat == seq
    assert [(a, b) for a, b, _ in bat] == [
        ("a", "b"), ("c", "d"), ("e", "f")
    ]
    assert [n for _, _, n in bat] == [100, 80, 60]
    assert stats["rounds"] == 1  # all three accepted in one round


def test_batched_guard_on_interacting_riser(spark):
    """Riser trap: merging the top pair creates a new symbol whose
    pairs immediately out-rank the next disjoint candidate — the
    batch guard must fall back to sequential behavior here."""
    # 'xyz' x30: top pair (x,y) n=30; after merge, riser (xy,z) n=30
    # beats the planted disjoint pair (c,d) n=20.
    text = " ".join(["xyz"] * 30 + ["cd"] * 20)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    bat, _ = train_bpe(docs, 3, batch=8)
    seq, _ = train_bpe(docs, 3, batch=1)
    assert bat == seq
    freqs = collections.Counter(text.split())
    want, _ = _py_bpe(dict(freqs), 3)
    assert bat == want


def test_batched_self_pair_ends_batch(spark):
    """ADVICE r7 (high): a self-pair (a, a) breaks the riser bound —
    merging it over odd-length runs creates (aa, a) whose witness is
    the self-pair's OWN occurrences, so its post-merge count can
    outrank a pair accepted later in the same batch.  The repro
    corpus {aaa:40, aab:9, aaab:34, b:1} sequentially learns
    (a,a) then (aa,a) then (b,</w>); an unguarded batch emitted
    (a,a),(b,</w>),(aa,a).  The fix: a self-pair terminates its
    batch, so batched == sequential == textbook here."""
    freqs = {"aaa": 40, "aab": 9, "aaab": 34, "b": 1}
    words = []
    for w, f in freqs.items():
        words += [w] * f
    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    want, _ = _py_bpe(freqs, 5)
    seq, _ = train_bpe(docs, 5, batch=1)
    for b in (2, 8, 16):
        bat, _ = train_bpe(docs, 5, batch=b)
        assert bat == seq == want, f"batch={b}: {bat} != {seq}"
    assert [(a, b) for a, b, _ in seq[:3]] == [
        ("a", "a"), ("aa", "a"), ("b", END_WORD)
    ]


def test_batched_self_pair_head_and_mid_prefix(spark):
    """Self-pair both as the round's argmax head and mid-prefix after
    disjoint non-self rules: batched must stay identical to the
    sequential/textbook order in each case."""
    # mid-prefix: disjoint (x,y) outranks the self-pair (a,a), which
    # must still end the batch before the interacting tail
    text = " ".join(["xy"] * 60 + ["aaa"] * 25 + ["aaab"] * 20 + ["cd"] * 15)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    freqs = collections.Counter(text.split())
    want, _ = _py_bpe(dict(freqs), 6)
    seq, _ = train_bpe(docs, 6, batch=1)
    bat, _ = train_bpe(docs, 6, batch=8)
    assert bat == seq == want


def test_fast_mode_whole_prefix_batching(spark):
    """exact=False (VERDICT r7 #7): the whole disjoint prefix is
    accepted per round — rule ORDER may diverge from sequential, but
    on the self-pair corpus the accepted SET matches and the final
    segmentation is identical (the out-of-order rule, (b,</w>), is
    disjoint from the self-merge chain, so the merges commute)."""
    freqs = {"aaa": 40, "aab": 9, "aaab": 34, "b": 1}
    words = []
    for w, f in freqs.items():
        words += [w] * f
    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    seq, seq_syms = train_bpe(docs, 3, batch=1)
    fast_stats: dict = {}
    fast, fast_syms = train_bpe(docs, 3, batch=8, stats=fast_stats, exact=False)
    # documented divergence: order differs...
    assert [(a, b) for a, b, _ in fast] == [
        ("a", "a"), ("b", END_WORD), ("aa", "a")
    ]
    assert fast != seq
    # ...but the accepted set and the resulting segmentation agree
    assert sorted((a, b) for a, b, _ in fast) == sorted(
        (a, b) for a, b, _ in seq
    )
    assert {tuple(r["syms"]): r["weight"] for r in fast_syms.collect()} == {
        tuple(r["syms"]): r["weight"] for r in seq_syms.collect()
    }
    assert fast_stats["rounds"] == 2  # 3 rules in 2 jobs


def test_fast_mode_matches_exact_on_disjoint_tiers(spark):
    """Where the guards never fire (strictly-descending disjoint top
    pairs), exact=False is identical to exact batching — same rules,
    same single round."""
    text = " ".join(["ababq"] * 50 + ["cdcdr"] * 40 + ["efefs"] * 30)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    stats: dict = {}
    fast, _ = train_bpe(docs, 3, batch=16, stats=stats, exact=False)
    exact, _ = train_bpe(docs, 3, batch=16)
    assert fast == exact
    assert stats["rounds"] == 1


def _py_encode(text: str, merges, vocab: dict[str, int]) -> list[int]:
    """Reference encoder: per word chars+</w>, apply rules in order
    (left-to-right non-overlapping per rule), map via vocab (-1 UNK)."""
    ids: list[int] = []
    for w in text.lower().split():
        syms = list(w) + [END_WORD]
        for a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        ids.extend(vocab.get(s, -1) for s in syms)
    return ids


def test_encode_corpus_matches_reference(spark):
    """Corpus-scale tokenizer apply: encode_corpus must equal the
    per-doc pure-python encoder on the trained rules — ids, order,
    empty docs, and UNK characters included."""
    from trade_data_collection_service_spark.ext.bpe import (
        corpus_alphabet,
        encode_corpus,
        token_vocab,
    )

    train_rows = [
        (1, "low low low low low lower lower newest newest"),
        (2, "newest newest newest newest widest widest widest"),
    ]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    merges, _ = train_bpe(train, n_merges=8)
    assert merges
    vocab = token_vocab(merges, corpus_alphabet(word_vocab(train)))
    vmap = dict(vocab)
    # ids are deterministic and dense: 0..len-1, alphabet first
    # (sorted), then merge outputs in merge order
    assert sorted(vmap.values()) == list(range(len(vmap)))
    alpha = [t for t, _ in vocab if len(t) == 1 or t == END_WORD]
    assert alpha == sorted(alpha)
    merged_toks = [a + b for a, b, _ in merges]
    tail = [t for t, _ in vocab[len(alpha):]]
    assert tail == [t for t in merged_toks if t not in set(alpha)]

    enc_rows = [
        (10, "low lower newest"),
        (11, "widest low low"),
        (12, ""),             # empty doc must survive with []
        (13, None),           # NULL text likewise
        (14, "zebra qux"),    # z/q/u/x unseen in training -> -1 UNK
    ]
    docs = spark.createDataFrame(enc_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in encode_corpus(docs, merges, vocab=vocab).collect()
    }
    assert set(got) == {10, 11, 12, 13, 14}
    for doc_id, text in enc_rows:
        want = _py_encode(text or "", merges, vmap)
        assert got[doc_id] == (want, len(want)), doc_id
    assert got[12] == ([], 0) and got[13] == ([], 0)
    assert -1 in got[14][0]


def test_encode_corpus_self_vocab_roundtrip(spark):
    """Encoding the training corpus itself with its own learned vocab
    has no UNKs, and per-doc token counts sum to the segmented-vocab
    weighted symbol count (the same corpus mass, two routes)."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.ext.bpe import (
        encode_corpus,
    )

    rows = [
        (1, "hug hug hug pug pug hugs bun bun"),
        (2, "pug pugs hugs hugs hug bun"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges, seg = train_bpe(docs, n_merges=6)
    enc = encode_corpus(docs, merges)
    assert enc.filter(F.array_contains("token_ids", -1)).count() == 0
    total = enc.agg(F.sum("n_tokens")).collect()[0][0]
    mass = seg.select(
        F.sum(F.size("syms") * F.col("weight")).alias("m")
    ).collect()[0][0]
    assert total == mass and total > 0


def test_encode_corpus_plan_is_jvm_side(spark):
    """The corpus encode must stay whole-JVM: no row-at-a-time Python
    (BatchEvalPython) and no Arrow eval anywhere in the plan — the
    fold/join/flatten pipeline is higher-order expressions only."""
    from trade_data_collection_service_spark.ext.bpe import encode_corpus

    docs = spark.createDataFrame(
        [(1, "hug hug pug"), (2, "pug bun hug")], ["doc_id", "text"]
    )
    merges, _ = train_bpe(docs, n_merges=4)
    plan = (
        encode_corpus(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEval" not in plan
