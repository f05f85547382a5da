"""Full-text retrieval over the document corpus: BM25 scoring + top-k.

The reference's anchor-text dictionary (lib/Wikiprep/Output/Legacy.pm
anchor_text sink) exists to feed exactly this kind of downstream ranking;
here the engine provides the ranking itself as a first-class batch
operator, the way a training-data pipeline scores documents against probe
queries (quality probes, topic probes, eval-set leakage probes).

Formula: Lucene/Robertson BM25 with the +1 idf smoothing,

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Scale shape (the part that matters at 100 TB): the query-term set is tiny
and KNOWN, so the term filter is an ``isin`` literal predicate applied
BEFORE the tokens ever reach a shuffle — the corpus-sized explode is
pruned to query-term hits map-side, and every remaining join is either
broadcast (idf table, query map: |terms| rows) or keyed on doc_id with
per-doc cardinality <= |query terms|.  Document length rides the explode
as a projected column, so no separate corpus-wide length join exists.
All JVM-side column expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wikiprep_spark.operators.dedup import normalized_text

BM25_K1 = 1.2
BM25_B = 0.75

# deterministic probe queries over the corpus vocabulary
DEFAULT_QUERIES = {
    1: "hash join table",
    2: "window agg stream",
    3: "customer order scan",
    4: "slow query filter vector",
}


def bm25_topk(
    docs: DataFrame, queries: dict[int, str] | None = None, k: int = 10,
    id_col: str = "doc_id", text_col: str = "text",
    k1: float = BM25_K1, b: float = BM25_B, round_to: int = 6,
) -> DataFrame:
    """(query_id, doc_id, score, rnk): top-``k`` documents per query by
    BM25, rnk 1-based.  Scores are rounded BEFORE ranking and ties broken
    by ascending doc_id, so the ordering is reproducible across engines
    (two docs with identical rounded scores can never swap)."""
    if queries is None:
        queries = DEFAULT_QUERIES
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        [(qid, t) for qid, q in queries.items()
         for t in dict.fromkeys(q.split())],
        "query_id long, term string",
    )
    all_terms = sorted({t for q in queries.values() for t in q.split()})

    toks = F.split(normalized_text(text_col), " ")
    # corpus stats: one map-side projection + a 1-row aggregate
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("double").alias("dl"),
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    # term frequencies for QUERY terms only: the isin literal prunes the
    # exploded tokens before the (doc_id, term) shuffle
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("double").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .where(F.col("term").isin(*all_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"),
             F.max("dl").alias("dl"))
    )

    # document frequencies + idf: |terms| rows, broadcast back
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                1.0 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("idf"),
            "avgdl",
        )
    )

    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.col("idf") * F.col("tf") * (k1 + 1.0)
                / (F.col("tf")
                   + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("score_raw")
        )
        .select(
            "query_id", "doc_id",
            F.round("score_raw", round_to).alias("score"),
        )
    )
    from pyspark.sql import Window

    # two-phase top-k: a single window partitioned by query_id alone would
    # funnel every scored row for a query through one task — a hot
    # partition at corpus scale.  Phase 1 takes the per-bucket top-k over
    # (query_id, hash-salt) partitions (parallel, bounded output of
    # k * n_buckets rows per query); phase 2 ranks that small union.  The
    # result is exactly the global top-k: every global winner wins its
    # bucket too.
    n_buckets = 64
    bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets))
    w1 = Window.partitionBy("query_id", "bucket").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("bucket", bucket)
        .withColumn("brnk", F.row_number().over(w1))
        .where(F.col("brnk") <= k)
        .withColumn("rnk", F.row_number().over(w2))
        .where(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score", "rnk")
    )
