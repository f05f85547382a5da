"""HLL distinct + count-min sketch: accuracy bounds, determinism, and a
pure-python reference of the exact same md5 register math."""

import hashlib
import math

from pyspark.sql import functions as F

from wikiprep_spark.operators.sketches import (
    CMS_DEPTH, CMS_WIDTH, HLL_M, cms_build, cms_estimate, hll_distinct,
)


def _py_hll(keys, salt="hll"):
    """Reference implementation of the register math in plain python."""
    regs = {}
    for k in keys:
        h = hashlib.md5(("%s:%s" % (salt, k)).encode()).hexdigest()
        reg = int(h[:3], 16)
        tail = int(h[3:15], 16)
        rho = 49 if tail == 0 else 49 - tail.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    sum_int = sum(1 << (49 - r) for r in regs.values())
    sum_int += (HLL_M - len(regs)) * (1 << 49)
    zeros = HLL_M - len(regs)
    raw = ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
           * 562949953421312.0) / sum_int
    if raw <= 10240.0 and zeros > 0:
        est = 4096.0 * math.log(4096.0 / zeros)
    else:
        est = raw
    return round(est, 4), len(regs)


def test_hll_matches_python_reference(spark):
    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 777).alias("k"), F.lit("g").alias("g"))
    got = hll_distinct(df, "k", ["g"]).collect()[0]
    exp_est, exp_regs = _py_hll([i % 777 for i in range(n)])
    assert got["registers_used"] == exp_regs
    assert got["hll_distinct"] == exp_est


def test_hll_accuracy_and_partition_invariance(spark):
    n_true = 20000
    df = spark.range(n_true).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("g"))
    for parts in (2, 16):
        rows = {r["g"]: r["hll_distinct"]
                for r in hll_distinct(df.repartition(parts),
                                      "k", ["g"]).collect()}
        for g, exact in ((0, 10000), (1, 10000)):
            # 4096 registers -> ~1.6% standard error; allow 5 sigma
            assert abs(rows[g] - exact) / exact < 0.08
        if parts == 2:
            first = rows
    assert first == rows  # integer register sums: bit-identical


def test_cms_never_underestimates_and_is_tight_for_heavy_keys(spark):
    rows = [("hub", i) for i in range(500)] + [
        ("k%d" % (i % 50), i) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v long")
    sketch = cms_build(df, "k")
    assert sketch.count() <= CMS_DEPTH * CMS_WIDTH
    keys = df.select("k").distinct()
    est = {r["key"]: r["cms_cnt"]
           for r in cms_estimate(sketch, keys, "k").collect()}
    exact = {r["k"]: r["cnt"]
             for r in df.groupBy("k").agg(
                 F.count("*").alias("cnt")).collect()}
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c                    # CMS lower-bound guarantee
    # 51 keys in 1024 buckets: the heavy key is almost surely collision-
    # free in at least one of the 4 rows
    assert est["hub"] == exact["hub"]
