"""Bloom-filter membership with deterministic, cross-engine-exact bits.

The bounded-memory "seen before?" primitive of a 100 TB pipeline:
decontamination against a reference corpus, incremental-ingest dedup,
and join pre-filtering all reduce to probing a set too big to broadcast
exactly.  A Bloom filter (Bloom 1970) answers with NO false negatives
and a tunable false-positive rate.

Like operators/sketches.py, the hash functions are md5-derived so the
exact bit pattern — and therefore every probe answer, INCLUDING the
false positives — is reproducible by the DuckDB relational twin.  This
is the property Spark's built-in ``DataFrameStatFunctions.bloomFilter``
cannot offer (engine-private hashing, driver-side blob).

Representation: the filter is a DataFrame of SET BIT POSITIONS (one row
per distinct position, <= m rows) rather than a packed binary blob —
the relational form composes with joins, stays under Catalyst, and a
positions table at m = 2^18 is ~2 MB, broadcastable.  Build is one
fixed-keyspace distinct (map-side combining); probe is k broadcast
joins + an all-bits-present count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BLOOM_K = 4          # hash functions
BLOOM_M = 1 << 18    # bits; n keys -> FP rate ~ (1 - e^(-kn/m))^k


def _bit_pos(key_col, i: int):
    """Bit position of hash row i: fold of the first 5 md5 hex chars
    (20 bits) mod m — m divides 2^20, so the mod is unbiased."""
    h = F.md5(F.concat(F.lit("bloom%d:" % i),
                       F.col(key_col).cast("string")))
    return (F.conv(F.substring(h, 1, 5), 16, 10).cast("long")
            % BLOOM_M)


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Set-bit positions of the filter over ``df[key_col]``: one
    ``bit_pos`` column, distinct.  The shuffle carries at most
    min(k*n, m) rows regardless of input size."""
    bits = df.select(F.explode(F.array(*[
        _bit_pos(key_col, i) for i in range(BLOOM_K)
    ])).alias("bit_pos"))
    return bits.distinct()


def bloom_probe(bits: DataFrame, keys: DataFrame,
                key_col: str = "key") -> DataFrame:
    """Probe every row of ``keys``: maybe_member is true iff ALL k
    addressed bits are set (no false negatives; false positives at the
    designed rate, and deterministic).  The bits table broadcasts."""
    # the bits table feeds k probe joins: materialize it once instead of
    # re-planning (and re-executing) the build distinct per join
    bits = bits.localCheckpoint()
    probes = keys.select(
        F.col(key_col).alias("key"),
        *[_bit_pos(key_col, i).alias("p%d" % i) for i in range(BLOOM_K)],
    )
    hit = probes
    for i in range(BLOOM_K):
        side = F.broadcast(bits.select(
            F.col("bit_pos").alias("p%d" % i),
            F.lit(1).alias("h%d" % i),
        ))
        hit = hit.join(side, "p%d" % i, "left")
    all_set = None
    for i in range(BLOOM_K):
        c = F.col("h%d" % i).isNotNull()
        all_set = c if all_set is None else (all_set & c)
    return hit.select("key", all_set.alias("maybe_member"))
