"""Bucketed parquet table layout — the shuffle-elimination primitive for
repeated large-to-large joins at 100 TB.

A fact table that will be joined on the same key by many downstream jobs
(triples on subj, anchors on target, link counts on title) should be
WRITTEN pre-hashed: Spark's bucketed parquet tables persist the hash
partitioning in the catalog, so a later join of two tables bucketed on
the join key with the same bucket count runs as a sort-merge join with
ZERO Exchange on either side — the shuffle is paid once at write time and
amortized over every subsequent consumer.  (Reference analogue: the
sorted .anchor_text/stats outputs of wikiprep are the same idea —
/root/reference/lib/Wikiprep/Output/Legacy.pm writes sorted files so
downstream tools can merge-join them; bucketing is the cluster-native
form.)

tests/test_bucketed.py proves the property on the physical plan: the
bucketed-by-doc_id join shows no hashpartitioning Exchange, while the
identical plain-parquet join shows two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def save_bucketed(df: DataFrame, table: str, keys: list[str],
                  num_buckets: int = 32, path: str | None = None,
                  sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and by default per-bucket sorted)
    parquet table registered in the session catalog.  ``path`` makes it
    an external table (the catalog only stores layout metadata); sorting
    within buckets additionally removes the join-time Sort for
    merge-joins and keeps row-group min/max statistics tight for
    key-range pruning."""
    w = df.write.format("parquet").mode("overwrite")
    w = w.bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucket_spec(spark, table: str) -> tuple[list[str], int] | None:
    """(bucket columns, bucket count) of a catalog table, or None if the
    table is not bucketed — lets a planner pick a co-located join
    strategy only when both sides actually share the layout."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols, n = None, None
    for r in rows:
        if r["col_name"] == "Num Buckets":
            n = int(r["data_type"])
        if r["col_name"] == "Bucket Columns":
            cols = [c.strip(" `") for c in
                    r["data_type"].strip("[]").split(",")]
    if cols is None or n is None:
        return None
    return cols, n
