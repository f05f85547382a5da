"""Bloom filter: no false negatives, deterministic bits, python-reference
parity, sane false-positive rate."""

import hashlib

from pyspark.sql import functions as F

from wikiprep_spark.operators.bloom import (
    BLOOM_K, BLOOM_M, bloom_build, bloom_probe,
)


def _py_bits(keys):
    bits = set()
    for key in keys:
        for i in range(BLOOM_K):
            h = hashlib.md5(("bloom%d:%s" % (i, key)).encode()).hexdigest()
            bits.add(int(h[:5], 16) % BLOOM_M)
    return bits


def test_bloom_bits_match_python_reference(spark):
    keys = ["k%d" % i for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r["bit_pos"] for r in bloom_build(df, "key").collect()}
    assert got == _py_bits(keys)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(2000).select(
        F.col("id").cast("string").alias("key"))
    bits = bloom_build(members, "key")
    probes = spark.range(12000).select(
        F.col("id").cast("string").alias("key"))
    got = {r["key"]: r["maybe_member"]
           for r in bloom_probe(bits, probes).collect()}
    # every member answers true
    assert all(got[str(i)] for i in range(2000))
    # FP rate on the 10k non-members: design ~ (1-e^(-kn/m))^k ~ 9e-5
    # at k=4, n=2000, m=2^18 — allow two orders of slack
    fps = sum(1 for i in range(2000, 12000) if got[str(i)])
    assert fps <= 20


def test_bloom_probe_determinism_across_partitionings(spark):
    members = spark.range(500).select(
        F.col("id").cast("string").alias("key"))
    probes = spark.range(3000).select(
        F.col("id").cast("string").alias("key"))
    a = sorted(map(tuple, bloom_probe(
        bloom_build(members.repartition(3), "key"), probes).collect()))
    b = sorted(map(tuple, bloom_probe(
        bloom_build(members.repartition(11), "key"),
        probes.repartition(2)).collect()))
    assert a == b
