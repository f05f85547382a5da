"""Probabilistic sketches with deterministic, cross-engine-exact math.

Two classic streaming sketches re-expressed as Spark aggregations whose
every bit is reproducible by a relational twin (the driver's DuckDB
oracle):

- ``hll_distinct``: HyperLogLog distinct counting (Flajolet et al. 2007).
  Registers come from md5 (available verbatim in both engines) instead of
  an engine-private hash, and the harmonic-mean denominator is carried as
  an INTEGER sum of two-powers (sum of 2^(49-rho) <= 2^61, inside int64),
  so the estimate is one double division from an exactly-reproducible
  integer — no float-summation-order drift between engines.
- ``cms_build`` / ``cms_estimate``: a count-min sketch (Cormode &
  Muthukrishnan 2005) with d=4 md5-derived rows, again bit-reproducible.

Scale shape: both sketches are map-side-combining aggregations onto a
FIXED key space (4096 registers / d x w counters) — the shuffle moves at
most that many partial rows per map task regardless of input size, which
is the whole point of sketching a 100 TB column.  The estimate step is a
projection + tiny-table join; nothing funnels through one task except the
final <= 4096-row reduce.

Reference parity note: the reference engine has no sketches — these are
part of the training-data-pipeline surface (distinct URLs/users per
partition, heavy-hitter estimation before choosing a salting strategy),
complementing the EXACT profile in operators/stats.key_skew_stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 2^49 — the fixed-point scale of the HLL harmonic sum (rho <= 49)
_POW49 = 1 << 49

# m = 4096 registers (p = 12): standard error ~ 1.04/sqrt(m) ~ 1.6%
HLL_P = 12
HLL_M = 1 << HLL_P

# the estimator expression is shared VERBATIM with the DuckDB oracle so
# the double arithmetic folds identically on both engines (same literal
# text => same parse => same operation order)
HLL_EST_EXPR = (
    "round(CASE WHEN ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0"
    " * 562949953421312.0) / sum_int <= 10240.0 AND zeros > 0"
    " THEN 4096.0 * ln(4096.0 / zeros)"
    " ELSE ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0"
    " * 562949953421312.0) / sum_int END, 4)"
)


def _hex_to_long(col):
    """Parse a short hex string column to BIGINT (Spark conv route; the
    DuckDB twin folds hex digits with strpos — different route, same exact
    integer)."""
    return F.conv(col, 16, 10).cast("long")


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str],
                 salt: str = "hll") -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group as a HyperLogLog sketch.

    Register index = first 3 md5 hex chars (12 bits); rho = leading-zero
    count of the next 48 bits (12 hex chars) + 1, computed as
    49 - bitlength(tail) via ``bin()`` (minimal-width binary in both
    engines).  Each register contributes the INTEGER 2^(49 - max_rho) to
    the harmonic sum; absent registers contribute 2^49.  Small-range
    (linear counting) correction applied per the original paper.

    Output: group_cols + (hll_distinct double, registers_used bigint).
    Plan: groupBy(group, register) max  ->  groupBy(group) sum — two
    map-side-combining exchanges over a <= m-per-group key space.
    """
    h = F.md5(F.concat(F.lit(salt + ":"),
                       F.col(key_col).cast("string")))
    reg = _hex_to_long(F.substring(h, 1, 3))
    tail = _hex_to_long(F.substring(h, 4, 12))
    # bitlength via bin(): '0' has length 1, so guard tail=0 explicitly
    rho = (
        F.when(tail == 0, F.lit(49))
        .otherwise(F.lit(49) - F.length(F.bin(tail)))
        .cast("int")
    )
    per_reg = (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )
    per_group = per_reg.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(1L, 49 - max_rho)")).alias("present"),
        F.count("*").cast("long").alias("registers_used"),
    )
    return (
        per_group
        .withColumn(
            "sum_int",
            F.col("present")
            + (F.lit(HLL_M) - F.col("registers_used")) * F.lit(_POW49))
        .withColumn("zeros", F.lit(HLL_M) - F.col("registers_used"))
        .select(
            *group_cols,
            F.expr(HLL_EST_EXPR).alias("hll_distinct"),
            "registers_used",
        )
    )


# ---------------------------------------------------------------------------
# count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 1024  # divides 4096, so (12-bit fold) % width is unbiased


def _cms_bucket(key_col, row: int):
    h = F.md5(F.concat(F.lit("cms%d:" % row),
                       F.col(key_col).cast("string")))
    return _hex_to_long(F.substring(h, 1, 3)) % CMS_WIDTH


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build a d x w count-min sketch of ``key_col``'s frequency
    distribution: one row per (sketch_row, bucket) with the collision
    count.  A single map-side-combining aggregation onto a fixed
    d*w = 4096-cell key space — the shuffle is O(4096) per map task at
    any input size."""
    rows = df.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("sketch_row"),
                 _cms_bucket(key_col, i).alias("bucket"))
        for i in range(CMS_DEPTH)
    ])).alias("c"))
    return (
        rows.groupBy(F.col("c.sketch_row").alias("sketch_row"),
                     F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame,
                 key_col: str = "key") -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the estimate is
    min over the d rows of the addressed counters — never below the true
    count (classic CMS guarantee, unit-tested).  ``keys`` is expected to
    be small (candidate heavy hitters); the sketch side is <= 4096 rows,
    so the join broadcasts."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        *[_cms_bucket(key_col, i).alias("b%d" % i)
          for i in range(CMS_DEPTH)],
    )
    est = probes
    for i in range(CMS_DEPTH):
        side = F.broadcast(sketch.where(F.col("sketch_row") == i).select(
            F.col("bucket").alias("b%d" % i),
            F.col("cnt").alias("c%d" % i),
        ))
        est = est.join(side, "b%d" % i)
    return est.select(
        "key",
        F.least(*[F.col("c%d" % i)
                  for i in range(CMS_DEPTH)]).alias("cms_cnt"),
    )
