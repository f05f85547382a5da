"""numeric_profile + json_field_stats: python-reference parity, null
handling, interpolation definition, partition invariance."""

import statistics

from pyspark.sql import functions as F

from wikiprep_spark.operators.profile import json_field_stats, numeric_profile


def _py_quantile(sorted_vals, q):
    """numpy-linear / quantile_cont interpolation at h = (n-1)q."""
    n = len(sorted_vals)
    h = (n - 1) * q
    lo = int(h)
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * (h - lo)


def test_numeric_profile_matches_python(spark):
    vals = [1.25, 7.5, 3.0, 9.75, 2.5, 8.0, 4.25, None]
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = numeric_profile(df, "v", ["g"]).collect()[0]
    present = sorted(v for v in vals if v is not None)
    assert got["n_rows"] == 8 and got["n_nulls"] == 1
    assert got["min_val"] == 1.25 and got["max_val"] == 9.75
    assert got["mean_val"] == round(sum(present) / len(present), 6)
    assert got["stddev_val"] == round(statistics.stdev(present), 6)
    for q, col in ((0.25, "q_25"), (0.5, "q_50"),
                   (0.75, "q_75"), (0.95, "q_95")):
        assert got[col] == round(_py_quantile(present, q), 6), col


def test_numeric_profile_partition_invariance_and_single_value(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 0.25).alias("v"))
    a = sorted(map(tuple, numeric_profile(df.repartition(13),
                                          "v", ["g"]).collect()))
    b = sorted(map(tuple, numeric_profile(df.repartition(2),
                                          "v", ["g"]).collect()))
    assert a == b
    one = spark.createDataFrame([("x", 5.0)], "g string, v double")
    got = numeric_profile(one, "v", ["g"]).collect()[0]
    assert got["stddev_val"] == 0.0 and got["q_50"] == 5.0


def test_json_field_stats(spark):
    rows = [("a", '{"k": 3}'), ("a", '{"k": 7}'),
            ("a", 'not json'), ("a", '{"other": 1}'),
            ("b", '{"k": -2}')]
    df = spark.createDataFrame(rows, "g string, props string")
    got = {r["g"]: r for r in
           json_field_stats(df, "props", "k", ["g"]).collect()}
    assert (got["a"]["n_parsed"], got["a"]["sum_val"],
            got["a"]["min_val"], got["a"]["max_val"]) == (2, 10, 3, 7)
    assert (got["b"]["n_parsed"], got["b"]["sum_val"]) == (1, -2)


def test_json_field_stats_malformed_numeric_payload_nulls(spark):
    # ANSI mode: a plain cast of '"abc"' to long would RAISE and kill the
    # query where the DuckDB twin's TRY_CAST nulls it — the operator must
    # treat it as unparseable on both engines
    rows = [("a", '{"k": "abc"}'), ("a", '{"k": 4}')]
    df = spark.createDataFrame(rows, "g string, props string")
    got = json_field_stats(df, "props", "k", ["g"]).collect()[0]
    assert (got["n_parsed"], got["sum_val"]) == (1, 4)
