"""Property-based tests for the r11 second-wave operators: the Bloom
pre-filter can NEVER drop a true match (any key set, either integral
key type), z-order covering cells can NEVER under-cover a box (any
domain/box/prefix), and the normalizing digest folds EVERY case/
punctuation/whitespace mutation of a text (any text, any mutation).

Row generation is plain-Python; Spark evaluates the operators.
Example counts are small because each example runs Spark jobs; the
zorder covering property is pure driver arithmetic and runs many
more examples.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trade_data_collection_service_spark.functions.zorder import (
    _interleave,
    covering_buckets,
)

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(max_examples=300, deadline=None)
@given(
    bits_x=st.integers(min_value=3, max_value=20),
    bits_y=st.integers(min_value=3, max_value=20),
    pb=st.integers(min_value=1, max_value=6),
    data=st.data(),
)
def test_covering_buckets_never_under_cover(bits_x, bits_y, pb, data):
    """Pure driver property: every in-box point's cell is in the
    covering list, for arbitrary domains, prefix widths, and boxes
    (including degenerate single-point boxes)."""
    mx, my = (1 << bits_x) - 1, (1 << bits_y) - 1
    x0 = data.draw(st.integers(0, mx))
    x1 = data.draw(st.integers(x0, mx))
    y0 = data.draw(st.integers(0, my))
    y1 = data.draw(st.integers(y0, my))
    meta = {
        "prefix_bits": pb,
        "shift_x": max(bits_x - pb, 0),
        "shift_y": max(bits_y - pb, 0),
    }
    cells = set(covering_buckets(meta, (x0, x1), (y0, y1)))
    # sample corner + interior points of the box
    xs = {x0, x1, (x0 + x1) // 2}
    ys = {y0, y1, (y0 + y1) // 2}
    for x in xs:
        for y in ys:
            cell = _interleave(
                x >> meta["shift_x"], y >> meta["shift_y"], pb
            )
            assert cell in cells, (x, y, cell, sorted(cells))


@_SLOW
@given(
    keys=st.sets(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=40,
    ),
    probes=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=60,
    ),
    as_int=st.booleans(),
)
def test_bloom_never_false_negative(spark, keys, probes, as_int):
    """For ANY dim key set and ANY probe list — including negative
    keys and an int-typed probe column against a bigint-built filter
    — every probe that IS a dim key passes might_contain."""
    from trade_data_collection_service_spark.functions.bloom import (
        bloom_build,
    )

    dim = spark.createDataFrame([(k,) for k in keys], "k long")
    bloom = bloom_build(dim, "k", bits_per_key=8, k=3)
    # ensure some true hits are present among the probes
    all_probes = list(probes) + list(keys)
    if as_int and all(abs(p) < 2**31 for p in all_probes):
        fact = spark.createDataFrame(
            [(p,) for p in all_probes], "p int"
        )
    else:
        fact = spark.createDataFrame(
            [(p,) for p in all_probes], "p long"
        )
    kept = {
        r["p"]
        for r in fact.filter(bloom.might_contain(F.col("p"))).collect()
    }
    assert keys <= kept


@_SLOW
@given(
    words=st.lists(
        st.text(
            alphabet="abcxyz019", min_size=1, max_size=6
        ),
        min_size=1,
        max_size=12,
    ),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_normalized_dedup_folds_any_mutation(spark, words, seed):
    """A doc and a case/punctuation/whitespace mutation of it always
    share a normalized-dedup group (n_variants >= 2 when the raw
    bytes differ)."""
    import random

    from trade_data_collection_service_spark.ext.dedup import (
        normalized_dedup,
    )

    rng = random.Random(seed)
    text = " ".join(words)
    mutated = []
    for w in words:
        t = w.upper() if rng.random() < 0.5 else w
        if rng.random() < 0.5:
            t = t + rng.choice([",", "!", ";", "..."])
        mutated.append(t)
    sep = rng.choice(["  ", " \t ", " , "])
    mut = sep.join(mutated) + rng.choice(["", " !!"])
    docs = spark.createDataFrame(
        [(0, text), (1, mut)], ["doc_id", "text"]
    )
    out = normalized_dedup(docs).collect()
    assert len(out) == 1 and out[0]["n_copies"] == 2
    assert out[0]["canonical_doc_id"] == 0
    if mut != text:
        assert out[0]["n_variants"] == 2
