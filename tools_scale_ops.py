#!/usr/bin/env python
"""Data-scale evidence for the round-5 operator family.

tools_scale10.py covers the kg pipeline (1x/10x/100x) and the LSH dedups;
this measures the newer corpus operators on the same two axes:

- documents axis: dedup_passages, cur_dsir, text_entity_mentions over
  sf0.01 (500 docs) -> sf0.1 (5k) -> 50k DISTINCT synthesized docs
  (sources/corpus.synth_documents — same vocabulary/length distribution,
  planted sparse near-dups; NOT replication).
- embeddings axis: semantic_dedup over sf0.1 (5k vectors) -> 100k
  synthesized clusterable vectors (sources/synth.synth_embeddings), with
  n_clusters scaled 16 -> 128 so the per-cluster pair test stays bounded
  (the SemDeDup paper's own scaling lever: cluster count grows with the
  corpus, cluster size does not).

Each level is materialized to parquet first so the measured window
contains only the operator.  Prints one JSON line; run on an idle host.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _cpu_probe, _settle  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "50000"))
N_SYNTH_VECS = int(os.environ.get("SPARK_GRAFT_SYNTH_VECS", "100000"))


def _timed(builder):
    t0 = time.time()
    n = builder().count()
    return round(time.time() - t0, 2), n


def main():
    from pyspark.sql import functions as F

    from wikiprep_spark.operators import dedup, entitylink, semdedup
    from wikiprep_spark.operators.curation import dsir_logweights
    from wikiprep_spark.plans.session import build_session
    from wikiprep_spark.sources.corpus import synth_documents
    from wikiprep_spark.sources.synth import synth_embeddings

    spark = build_session(app_name="wikiprep-scale-ops",
                          master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")

    out = {"cpus": CPUS, "probe_ms": round(_cpu_probe(), 1),
           "docs": {}, "emb": {}}
    tmp = tempfile.mkdtemp(prefix="wikiprep_scale_ops_")

    # ---- documents axis ---------------------------------------------
    levels = [
        ("sf0.01", lambda: spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet")),
        ("sf0.1", lambda: spark.read.parquet(
            "/root/testdata/sf0.1/documents.parquet")),
        (f"synth{N_SYNTH_DOCS}", lambda: _materialize(
            synth_documents(spark, N_SYNTH_DOCS).repartition(CPUS),
            os.path.join(tmp, "docs"), spark)),
    ]
    # warmup (JVM + python workers) outside every measured window
    wdocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dedup.dup_passages(wdocs).count()
    entitylink.link_entities(
        wdocs, entitylink.ngram_dictionary(wdocs, 5, 10), max_len=2
    ).count()
    _settle()

    for name, loader in levels:
        docs = loader()
        res = {"n_docs": docs.count()}
        res["dedup_passages"] = _timed(lambda: dedup.dup_passages(docs))
        res["cur_dsir"] = _timed(lambda: dsir_logweights(
            docs, docs.where(F.col("lang") == "en")))
        res["text_entity_mentions"] = _timed(lambda: entitylink.link_entities(
            docs, entitylink.ngram_dictionary(docs, 10, 30), max_len=2))
        out["docs"][name] = res
        _settle()

    # ---- embeddings axis --------------------------------------------
    semdedup.semantic_dedup(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        n_clusters=4).count()
    _settle()
    emb_levels = [
        ("sf0.1", lambda: spark.read.parquet(
            "/root/testdata/sf0.1/embeddings.parquet"), 16),
        (f"synth{N_SYNTH_VECS}", lambda: _materialize(
            synth_embeddings(spark, N_SYNTH_VECS).repartition(CPUS),
            os.path.join(tmp, "emb"), spark), 128),
    ]
    for name, loader, n_clusters in emb_levels:
        emb = loader()
        res = {"n_vecs": emb.count(), "n_clusters": n_clusters}
        res["semantic_dedup"] = _timed(lambda: semdedup.semantic_dedup(
            emb, n_clusters=n_clusters))
        out["emb"][name] = res
        _settle()

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


def _materialize(df, path, spark):
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


if __name__ == "__main__":
    main()
