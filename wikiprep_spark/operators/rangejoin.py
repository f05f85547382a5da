"""Interval/range join via bin bucketing — the classic Spark gap.

Spark compiles a pure range predicate (``p BETWEEN s AND e``) to
BroadcastNestedLoopJoin or CartesianProduct: every (point, interval)
combination is tested, O(|P| x |I|) — dead at any real scale.  Engines
with a native range join (DuckDB's IEJoin, the piecewise-merge-join
family) sort instead; the standard Spark-native equivalent (documented
in Databricks' range-join optimization and the interval-join literature)
is BIN BUCKETING, built here from plain DataFrame ops:

- choose a bin width ``w`` (about the typical interval span);
- every interval [s, e] is exploded to the bins it covers —
  ceil((e - s + 1) / w) rows, bounded by span/w;
- every point p belongs to exactly ONE bin, floor(p / w);
- equi-join on the bin, then apply the exact range filter.

Because a point has exactly one bin, each qualifying (point, interval)
pair meets exactly once — no post-join dedup.  Cost: one equi-shuffle of
|P| + |I| x avg_bins rows, instead of the nested-loop product.  Skew is
explicit: an interval spanning many bins costs span/w rows (the caller
sizes w against the interval-length distribution; the 100 TB version
sizes it from q_profile-style stats on e - s).

The relational oracle uses DuckDB's native theta join over the same
inputs — an independent implementation, same contract as the as-of
oracle (q_asof_attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, start_col: str, end_col: str,
                  bin_width: int) -> DataFrame:
    """Inner-join ``points`` to every interval with
    start <= point <= end (integer domain — cast dates to day numbers
    first).  Returns all point columns + all interval columns.

    ``bin_width`` must be positive; intervals with e < s produce no
    rows (filtered, not errored: reversed intervals are data noise at
    ingest scale)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    p = F.col(point_col).cast("long")
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    iv = (
        intervals.where(e >= s)
        .withColumn(
            "_bin",
            F.explode(F.sequence(
                F.floor(s / bin_width), F.floor(e / bin_width))))
    )
    pt = points.withColumn("_bin", F.floor(p / bin_width))
    return (
        pt.join(iv, "_bin")
        .where((p >= s) & (p <= e))
        .drop("_bin")
    )
