"""Explicit Bloom-filter semi-join reduction: pre-filter the fact
side of a selective join MAP-SIDE, before anything shuffles.

The shape it targets: ``fact ⋈ σ(dim)`` where the filtered dim is
small in KEYS but the fact is huge — every fact row that cannot
possibly match still pays the shuffle in a plain sort-merge join.
A Bloom filter built from the dim keys and applied in the fact's
scan stage drops the provable non-matches for the cost of k hashes
per row; the exact join afterwards re-verifies every survivor, so a
false positive costs one extra shuffled row, NEVER a wrong result
(the oracle twin is the plain join).

Spark ships this as a runtime optimization (InjectRuntimeFilter,
``spark.sql.optimizer.runtime.bloomFilter.enabled``) gated on size
thresholds tuned for clusters (10 GB application-side scans); this
module is the explicit, always-available form, and doubles as the
engine's reusable Bloom primitive.

One filter, one hash family (xxhash64 over k seed tokens, always
computed JVM-side), two membership paths:
- **literal path** (default, ≤ ``BLOOM_MAX_BITS``): the word array
  folds into the plan as a constant and the k probes are pure
  codegen (shift/mask/element_at) — zero Python in the hot loop,
  fuses into the parquet scan;
- **pandas path** (any size): the words live in a SparkContext
  broadcast and a vectorized Arrow-batched pandas UDF does ONLY the
  word gather (numpy index + bitwise-and) over the JVM-computed
  positions — the 100 TB shape when the dim has millions of keys
  and a plan literal would bloat every task.  Because the positions
  come from the same expressions, the two paths keep IDENTICAL row
  sets (pytest-proven, tests/test_bloom.py).

Build cost: two jobs over the (small) dim — a distinct-count to size
``m``, then one explode(k positions) + groupBy(word) + bit_or
aggregate whose result is m/64 longs on the driver.  That is the
classic mergeable-sketch shape (functions/sketch.py family): partial
word-masks OR map-side, so the shuffle carries at most m/64 rows per
partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# literal-path budget: 2^16 bits = 1024 longs in the plan.  Beyond
# this, build with large_ok=True and probe via the pandas path.
BLOOM_MAX_BITS = 1 << 16


def _one() -> Column:
    # built lazily: F.lit needs an active session at call time
    return F.lit(1).cast("long")


class BloomFilter:
    """m bits in m/64 longs + k seeds + the build-side key type.
    Plain driver object — build once per dim, reuse across any
    number of fact filters."""

    def __init__(self, m: int, k: int, words: list[int], key_type: str):
        assert m % 64 == 0 and len(words) == m // 64
        self.m, self.k, self.words = m, k, words
        self.key_type = key_type
        # (appId, Broadcast) — the pandas path broadcasts the word
        # array ONCE per filter per application, not once per probe
        # (review finding: per-call broadcasts leak for the session)
        self._bc: tuple | None = None

    def positions(self, key: Column) -> list[Column]:
        """The k probe lanes: xxhash64(seed-token, key) mod m —
        JVM-side, shared verbatim by build and BOTH membership
        paths (pmod keeps lanes non-negative).  The probe key is
        CAST to the build side's type first: xxhash64 hashes by
        physical type (int 7 and bigint 7 hash differently), and a
        type-mismatched probe would silently drop TRUE matches —
        the one failure mode a Bloom pre-filter must never have."""
        return [
            F.pmod(
                F.xxhash64(F.lit(s), key.cast(self.key_type)),
                F.lit(self.m),
            )
            for s in range(self.k)
        ]

    def might_contain(self, key: Column) -> Column:
        """Literal-path membership: AND over k probes of
        (words[pos>>6] & (1<<(pos&63))) != 0 — constant-folded array,
        whole-stage codegen.  NULL keys may pass (xxhash64 folds a
        null input into the seed) — sound because the exact join
        behind the pre-filter drops them, which is why
        bloom_semijoin guards the join type."""
        arr = F.array(*[F.lit(w) for w in self.words])
        cond = F.lit(True)
        for pos in self.positions(key):
            word = F.element_at(
                arr, F.shiftrightunsigned(pos, 6).cast("int") + 1
            )
            # variable-amount shift: the F.shiftleft wrapper only
            # takes a literal count, the SQL function takes a column
            mask = F.call_function(
                "shiftleft", _one(), (pos % 64).cast("int")
            )
            cond = cond & (word.bitwiseAND(mask) != 0)
        return cond

    def might_contain_pandas(self, df: DataFrame, key: str) -> Column:
        """Broadcast-variable membership for filters too big to be a
        plan literal: the probe POSITIONS are still the JVM xxhash64
        expressions (packed into one array column), and the pandas
        UDF does only the vectorized word gather against the
        broadcast — never row-at-a-time, and bit-identical to the
        literal path by construction."""
        from pyspark.sql.types import BooleanType

        sc = df.sparkSession.sparkContext
        if self._bc is None or self._bc[0] != sc.applicationId:
            # words carry bit 63 (negative as JVM longs): view the
            # int64 bit pattern as uint64 — a direct uint64
            # conversion of a negative Python int is rejected by
            # numpy >= 2.0
            self._bc = (
                sc.applicationId,
                sc.broadcast(
                    np.array(self.words, dtype=np.int64).view(
                        np.uint64
                    )
                ),
            )
        bc = self._bc[1]

        @F.pandas_udf(BooleanType())
        def member(pos: pd.Series) -> pd.Series:
            words = bc.value
            if not len(pos):
                return pd.Series([], dtype=bool)
            # positions are pmod-non-negative longs: safe as uint64
            mat = np.array(pos.tolist(), dtype=np.uint64)  # (n, k)
            hit = (
                words[(mat >> np.uint64(6)).astype(np.int64)]
                >> (mat & np.uint64(63))
            ) & np.uint64(1)
            return pd.Series(hit.all(axis=1))

        return member(F.array(*self.positions(F.col(key))))


def bloom_build(
    dim: DataFrame,
    key: str,
    bits_per_key: int = 16,
    k: int = 5,
    large_ok: bool = False,
) -> BloomFilter:
    """Distributed Bloom build over the dim keys.  ``m`` is sized to
    ``bits_per_key`` × distinct keys, rounded up to a power of two;
    builds past BLOOM_MAX_BITS require ``large_ok=True`` (the caller
    is promising to probe via the pandas path — or to reconsider and
    let Spark broadcast the dim outright)."""
    n = dim.select(key).distinct().count()
    m = 1 << max(10, (max(n, 1) * bits_per_key - 1).bit_length())
    if m > BLOOM_MAX_BITS and not large_ok:
        raise ValueError(
            f"bloom of {n} keys needs m={m} bits > {BLOOM_MAX_BITS}; "
            "pass large_ok=True and probe with might_contain_pandas"
        )
    key_type = dict(dim.dtypes)[key]
    probe = BloomFilter(m, k, [0] * (m // 64), key_type)
    rows = (
        dim.select(F.col(key)).na.drop()
        .select(
            F.explode(F.array(*probe.positions(F.col(key)))).alias("pos")
        )
        .select(
            F.shiftrightunsigned(F.col("pos"), 6).alias("w"),
            F.call_function(
                "shiftleft", _one(), (F.col("pos") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * (m // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return BloomFilter(m, k, words, key_type)


def bloom_semijoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """``fact ⋈ dim`` with a Bloom pre-filter on the fact side: the
    k-probe membership test fuses into the fact's scan stage and
    drops non-matching rows BEFORE the join's exchange; the join
    re-verifies exactly.  Only ``inner``/``left_semi`` are legal —
    any outer flavor must keep the rows the pre-filter drops."""
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(
            f"bloom pre-filter is only sound for inner/semi joins: {how}"
        )
    # ADVICE r11: auto-degrade instead of erroring at scale — a dim
    # past the literal-path budget builds with large_ok=True and
    # probes via the broadcast+pandas path; the explicit ValueError
    # stays for direct bloom_build/might_contain callers who asked
    # for the plan-literal shape by name.
    bloom = bloom or bloom_build(dim, dim_key, large_ok=True)
    if bloom.m <= BLOOM_MAX_BITS:
        pre = fact.filter(bloom.might_contain(F.col(fact_key)))
    else:
        pre = fact.filter(bloom.might_contain_pandas(fact, fact_key))
    return pre.join(
        dim, pre[fact_key] == dim[dim_key], how
    )
