"""Sequence packing for pretraining: lay every document's tokens out on
one global token stream (deterministic doc_id order) and chunk the stream
into fixed-length training sequences — the GPT-style concat-and-chunk
step that turns a curated corpus into (sequence, offset) training rows.
Output is each document's placement: absolute token offset, and the first
and last training sequence it lands in.

Scale shape — the distributed prefix sum: the naive encoding is a single
window ``sum(n) OVER (ORDER BY doc_id)``, which funnels the ENTIRE corpus
through one task (an unpartitioned window's sort is a single reducer —
exactly the anti-pattern the plan audit exists to catch).  Instead:

1. range-partition by doc_id and sort within partitions (the global sort,
   P-way parallel),
2. per-partition running sums (window partitioned BY the partition id —
   parallel),
3. a prefix-offset table of P rows (one per partition) cumulated on a
   single tiny task and broadcast back.

The only single-partition work is over P rows, not N.  The result is
invariant to where the range boundaries fall (a prefix sum doesn't care
how the ordered stream is sliced), so sampling-based range boundaries
don't threaten determinism, and the relational oracle can use the naive
one-window form — same numbers, different plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from wikiprep_spark.operators.dedup import normalized_text


def pack_sequences(
    docs: DataFrame, seq_len: int = 2048,
    id_col: str = "doc_id", text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, tok_start, seq_first, seq_last): each document's
    half-open token span [tok_start, tok_start + n_tokens) on the global
    stream ordered by doc_id, and the fixed-length sequences (0-based,
    ``seq_len`` tokens each) its first and last token fall in.  Documents
    whose normalized text is empty still occupy a zero-length position
    (n_tokens >= 1 for any non-empty text; split of "" yields one empty
    token, counted — consistent with token_stats)."""
    toks = F.split(normalized_text(text_col), " ")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n"),
    )
    if num_partitions:
        d = d.repartitionByRange(num_partitions, "doc_id")
    else:
        d = d.repartitionByRange("doc_id")
    d = (
        d.sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
        # TWO consumers (per-row cumsum and per-pid offsets) must observe
        # IDENTICAL partition boundaries; today that holds only because
        # ReuseExchange dedups the identical exchange subtree — pin it
        # with one materialization so a plan change can never misalign
        # the pid-to-offset mapping (the pagerank/triangles pattern)
        .localCheckpoint()
    )
    wl = (
        Window.partitionBy("pid").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("lcum", F.sum("n").over(wl))
    # P rows: cumulative byte... token offset of each partition's start.
    # The single-partition window here is over num_partitions rows only.
    wp = (
        Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        d.groupBy("pid").agg(F.sum("n").alias("ptot"))
        .select("pid",
                (F.sum("ptot").over(wp) - F.col("ptot")).alias("poff"))
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            (F.col("poff") + F.col("lcum") - F.col("n")).alias("tok_start"),
            F.floor((F.col("poff") + F.col("lcum") - F.col("n"))
                    / seq_len).alias("seq_first"),
            F.floor((F.col("poff") + F.col("lcum") - 1)
                    / seq_len).alias("seq_last"),
        )
    )
