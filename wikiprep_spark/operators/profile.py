"""Column profiling for data-quality triage at ingest time.

``numeric_profile`` computes, per group, the statistics a pipeline
operator needs before choosing how to treat a numeric column (clip
ranges, detect drift, size histogram buckets): row/null counts, min/max,
mean, sample stddev, and exact linear-interpolated percentiles.

Cross-engine exactness contract (the DuckDB-twin discipline used across
this repo):

- mean and stddev are derived from DECIMAL(30,12) power sums (sum and
  sum of squares of the decimal-cast values) — decimal addition is
  order-independent, so the sums are bit-identical under any
  partitioning/engine, and the final float expressions mirror the twin
  operation-for-operation.
- percentiles use Spark's exact ``percentile`` aggregate, whose linear
  interpolation at rank h = (n-1)*q is the same definition as DuckDB's
  ``quantile_cont`` (and numpy's default).  EXACT percentile holds the
  group's values in memory — the right tool for bounded groups (here:
  per event_type).  For unbounded groups at 100 TB the scale path is
  ``approx_percentile`` (t-digest, bounded memory), exposed via
  ``approx=True`` and gated rows-only (sketch internals are
  engine-private, unlike everything else in this file).

The squares stay inside DECIMAL(38,*): values are cast to DECIMAL(18,6)
before squaring (documented domain: |value| < 10^12 with input precision
<= 6 decimals — asserted nowhere, stated here), giving (37,12) products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# mirrored verbatim by the oracle: variance from power sums,
# (s2 - s1^2/n) / (n-1), guarded for n = 1
_STD_EXPR = (
    "CASE WHEN n_vals > 1 THEN "
    "sqrt((s2d - (s1d * s1d) / n_vals) / (n_vals - 1.0)) "
    "ELSE 0.0 END"
)


def numeric_profile(df: DataFrame, val_col: str, group_cols: list[str],
                    quantiles: tuple = (0.25, 0.5, 0.75, 0.95),
                    approx: bool = False) -> DataFrame:
    """Per-group profile of a numeric column.

    Output: group_cols + (n_rows, n_nulls, min_val, max_val, mean_val,
    stddev_val, q_25, q_50, ... one column per requested quantile),
    floats rounded to 6.
    """
    v = F.col(val_col)
    dec = v.cast("decimal(18,6)")
    qlist = ", ".join(repr(float(q)) for q in quantiles)
    pfun = "approx_percentile" if approx else "percentile"
    aggs = [
        F.count("*").cast("long").alias("n_rows"),
        F.count(v).cast("long").alias("n_vals"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
        F.sum(dec).alias("s1"),
        F.sum(dec * dec).alias("s2"),
        F.expr(f"{pfun}({val_col}, array({qlist}))").alias("qs"),
    ]
    prof = df.groupBy(*group_cols).agg(*aggs)
    qcols = [
        F.round(F.element_at("qs", i + 1), 6).alias(
            "q_%02d" % int(round(q * 100)))
        for i, q in enumerate(quantiles)
    ]
    return (
        prof
        .withColumn("s1d", F.col("s1").cast("double"))
        .withColumn("s2d", F.col("s2").cast("double"))
        .select(
            *group_cols,
            "n_rows",
            (F.col("n_rows") - F.col("n_vals")).cast("long")
            .alias("n_nulls"),
            "min_val", "max_val",
            F.round(F.col("s1d") / F.col("n_vals"), 6).alias("mean_val"),
            F.round(F.expr(_STD_EXPR), 6).alias("stddev_val"),
            *qcols,
        )
    )


def json_field_stats(df: DataFrame, json_col: str, field: str,
                     group_cols: list[str]) -> DataFrame:
    """Extract an integer field from a JSON string column (JVM-side
    ``get_json_object`` — no Python) and profile it per group: count of
    parseable rows, decimal-exact sum, min/max.  The schema-on-read
    pattern for semi-structured event payloads."""
    raw = F.get_json_object(F.col(json_col), "$." + field)
    # try_cast, not cast: under ANSI mode a malformed numeric payload
    # would RAISE here while the DuckDB twin's TRY_CAST nulls it out —
    # null on both engines is the schema-on-read contract for dirty data
    val = raw.try_cast("long")
    return (
        df.select(*group_cols, val.alias("v"))
        .groupBy(*group_cols)
        .agg(
            F.count("v").cast("long").alias("n_parsed"),
            F.sum(F.col("v").cast("decimal(30,0)")).cast("long")
            .alias("sum_val"),
            F.min("v").alias("min_val"),
            F.max("v").alias("max_val"),
        )
    )
