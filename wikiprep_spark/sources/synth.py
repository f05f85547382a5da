"""Deterministic synthetic EMBEDDINGS at arbitrary scale.

Companion to sources/corpus.synth_documents (the >10x data-scale
measurement corpus): generates clusterable unit-free vectors in the
driver testdata's ``embeddings`` shape (vec_id, embedding float[dim],
label) entirely with JVM codegen — spark.range + hash-seeded
higher-order functions, no python rows, no shuffle — so synthesizing
10^8 vectors is embarrassingly parallel.

Structure (what makes the scale measurement honest):
- every vector is topic-center + 0.3 x noise, topics = ``n_topics``
  hash-derived centers, so clustering operators (SemDeDup, IVF) see the
  cluster structure they are built for rather than isotropic noise;
- every ``dup_every``-th vector is a planted near-duplicate of its
  predecessor (same base vector, one hash-picked dimension nudged), so
  near-dup pair generation has a real, sparse signal at every scale —
  replicating the parquet instead would manufacture degenerate
  all-identical clusters and quadratic pair output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def synth_embeddings(spark: SparkSession, n_vecs: int, dim: int = 64,
                     n_topics: int = 16, dup_every: int = 200,
                     seed: int = 11) -> DataFrame:
    u = ("(cast(pmod(xxhash64({salt!r}, {key}, d, %d), 2001) as int)"
         " - 1000) / 1000.0" % seed)
    center = u.format(salt="c", key="topic")
    noise = u.format(salt="n", key="base")
    nudge = (f"if(is_dup AND d = cast(pmod(xxhash64('m', doc, {seed}),"
             f" {dim}) as int) + 1, 0.01, 0.0)")
    return (
        spark.range(n_vecs).select(F.col("id").alias("vec_id"))
        .withColumn(
            "is_dup",
            (F.col("vec_id") % dup_every == dup_every - 1)
            & (F.col("vec_id") > 0))
        .withColumn(
            "base",
            F.when(F.col("is_dup"), F.col("vec_id") - 1)
            .otherwise(F.col("vec_id")))
        .withColumn("doc", F.col("vec_id"))
        .withColumn(
            "topic",
            F.expr(f"cast(pmod(xxhash64('t', base, {seed}),"
                   f" {n_topics}) as int)"))
        .select(
            "vec_id",
            F.expr(
                f"transform(sequence(1, {dim}), d -> "
                f"cast({center} + 0.3 * ({noise}) + {nudge} as float))"
            ).alias("embedding"),
            F.col("topic").cast("int").alias("label"),
        )
    )
