"""As-of (point-in-time) join: for each left row, the single right row
with the greatest right timestamp <= the left timestamp within the same
key — the operator behind attribution ("which view preceded this
purchase"), point-in-time feature lookup, and slowly-changing-dimension
resolution.  Spark has no built-in as-of join; the naive encodings are a
range cross-join (quadratic row explosion per key) or a per-left-row
subquery (re-scans the right side).

Scale shape: UNION the two sides with a side tag, one shuffle on the key,
one per-key sort on (ts, side), then a running ``last(right_payload,
ignorenulls=True)`` carry-forward window — every right row is read once,
every left row emits once, and the only data movement is the single
key-partitioned exchange both sides share.  This is the merge-join
formulation every native as-of implementation (kdb+ aj, DuckDB ASOF,
pandas merge_asof) uses, expressed relationally so Catalyst plans it.
A key's full history must fit one task's sort (same contract as
sessionization); at 100 TB that holds for per-user/per-instrument keys,
and a pathological hot key is visible in the same skew metrics AQE uses.

Determinism: right rows are deduplicated to one per (key, ts) by the
lexicographically greatest payload struct, and at equal timestamps the
right row sorts BEFORE the left row (backward-inclusive semantics,
matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` — which is also the
independent oracle twin, a genuinely different implementation of the same
operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame, right: DataFrame, on: str,
    left_ts: str = "ts", right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Backward-inclusive as-of left join.  Returns every ``left`` row's
    columns plus ``right_cols`` (NULL when no right row at-or-before the
    left timestamp exists for the key).  ``right_cols`` must not collide
    with left column names."""
    rpay = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    r = (
        # NULL right timestamps can never satisfy l.ts >= r.ts under ASOF
        # semantics, but the ascending window order sorts them FIRST and
        # the carry-forward would hand their payload to every left row of
        # the key — drop them up front (DuckDB ASOF oracle parity on
        # dirty data)
        right.where(F.col(right_ts).isNotNull())
        .select(F.col(on).alias("_k"),
                F.col(right_ts).alias("_ts"), rpay)
        # one row per (key, ts): greatest payload struct wins — makes the
        # carry-forward independent of input order and engine
        .groupBy("_k", "_ts").agg(F.max("_r").alias("_r"))
        .withColumn("_side", F.lit(0))
    )
    lcols = left.columns
    l = (
        left.select(
            F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
            F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
            F.lit(1).alias("_side"), F.struct(*lcols).alias("_l"),
        )
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
        .unionByName(l)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(
            *[F.col(f"_l.{c}").alias(c) for c in lcols],
            *[F.col(f"_m.{c}").alias(c) for c in right_cols],
        )
    )
