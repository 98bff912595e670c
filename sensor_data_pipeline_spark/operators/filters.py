"""Runtime Bloom-filter building blocks (the explicit form of Spark's
`spark.sql.optimizer.runtime.bloomFilter.*` row-level filtering).

The bitmap is m=8192 bits as 128 packed longs carried in a ONE-ROW
map<word,mask> column: build it with one tiny shuffle (bit positions ->
64-bit words via map-side-combinable bit_or), broadcast ~1 KiB instead
of the key set, and prune the probe scan with k=5 pure-JVM map lookups
per row. The hash schedule is deterministic integer arithmetic
(Kirsch-Mitzenmacher double hashing over fixed primes) rather than
xxhash64 precisely so a SQL oracle — or any other engine — can replay
exact candidacy bit for bit (q261's correctness gate hash-checks even
the false-positive count).

Guarantee (property-tested in tests/test_properties.py): a key that was
inserted ALWAYS passes `bloom_contains` — Bloom filters have no false
negatives; false positives are bounded by the (m, k, n) geometry.

Reference analog: the reference filters per-record with a fixed
predicate before publishing (src/modules/dd/producer.c:214-231); this
is the distributed equivalent where the predicate itself is a
compressed set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M = 8192  # bits
BLOOM_K = 5
_P1 = 2654435761  # Knuth multiplicative constant
_P2 = 4294967291  # largest prime < 2^32


def _h12(key: Column) -> tuple[Column, Column]:
    """(h1, h2) for a positive BIGINT key column. The key folds to 31
    bits before the multiply so the product stays < 2^63 for any key a
    100 TB corpus could mint."""
    a = ((key % F.lit(2147483648)) * F.lit(_P1)) % F.lit(_P2)
    h1 = a % F.lit(BLOOM_M)
    h2 = (a % F.lit(BLOOM_M - 1)) + F.lit(1)
    return h1, h2


def bloom_positions(key: Column) -> Column:
    """Array of the k bit positions for a key (double hashing)."""
    h1, h2 = _h12(key)
    return F.transform(
        F.sequence(F.lit(0), F.lit(BLOOM_K - 1)),
        lambda i: (h1 + i.cast("long") * h2) % F.lit(BLOOM_M),
    )


def bloom_bitmap(keys: DataFrame, key_col: str, out_col: str = "bloom") -> DataFrame:
    """ONE-ROW DataFrame holding the packed bitmap as a DENSE
    array<long> of BLOOM_M/64 words (~1 KiB).

    Shuffle cost is O(BLOOM_M/64) rows (the 64-bit words), with the
    bit_or combining map-side — never O(keys). The dense array (not a
    map, not a position set) is what makes the probe O(1):
    element_at by integer INDEX is constant-time, while Spark map
    lookups and array_contains both scan their entries per row —
    O(set size) per probe row, which the 10x-replica sweep measured
    as the dominant cost on multi-million-row probes."""
    pos = keys.select(F.explode(bloom_positions(F.col(key_col))).alias("p"))
    words = pos.groupBy((F.col("p") / 64).cast("int").alias("w")).agg(
        F.bit_or(
            F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int"))
        ).alias("mask")
    )
    sparse = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(BLOOM_M // 64 - 1)),
        lambda i: F.coalesce(F.col("_m")[i.cast("int")], F.lit(0).cast("long")),
    )
    # the O(words * map-scan) densification runs ONCE on a 1-row frame;
    # every per-row probe after it is pure indexed access
    return sparse.select(dense.alias(out_col))


def bloom_contains(bloom_col: Column, key: Column) -> Column:
    """Boolean column: every one of the key's k bits is set.

    The k tests are UNROLLED into plain conjuncts instead of a
    transform+forall pair: higher-order array functions are evaluated
    on the interpreted expression path (outside whole-stage codegen),
    and the probe runs once per scanned row — measured 67.8s -> 2.8s
    on a 1.5M-row probe at the sf1 replica when the HOF form was
    replaced with k codegen-able boolean terms over the dense-array
    bitmap (element_at by index is O(1); map lookups scan)."""
    h1, h2 = _h12(key)
    test = None
    for i in range(BLOOM_K):
        p = (h1 + F.lit(i).cast("long") * h2) % F.lit(BLOOM_M)
        word = F.element_at(bloom_col, ((p / 64).cast("int") + 1))
        t = word.bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        ) != 0
        test = t if test is None else (test & t)
    return test
