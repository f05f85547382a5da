#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline number is end-to-end knowledge-graph pipeline throughput
(pages/sec, stage-0 parse through the triple count), the reference's
own progress metric (bin/wikiprep:398-409).  Additional per-query wall
times cover the relational, dedup, text and similarity operators.

Scaling-efficiency evidence (N vs 4N cores) is produced by bench_scaling.py
into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "20"))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q_join_revenue_by_nation",
    "q_window_top_order",
    "q_events_hourly",
    "dedup_exact",
    "text_quality",
    "text_fingerprint",
    "sim_cosine_topk",
    "graph_closure",
    "graph_components",
]


def _bench_near_dedup(spark, sf_dir):
    """Near-dup operators at production thresholds.

    The synthetic documents share a ~30-word vocabulary, so unigram sets
    are nearly identical across all docs and every pair is a genuine
    candidate (the sf0.01 correctness queries verify that case exactly);
    the bench measures the production configuration: 3-gram shingles +
    high threshold, so candidate volume reflects the LSH/prefix design
    rather than the degenerate vocabulary."""
    from pyspark.sql import functions as F

    from wikiprep_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lsh = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=4,
                                  threshold=0.8, shingle=3,
                                  max_bucket=10000)
    jac = dedup.token_jaccard_pairs(docs, threshold=0.8, shingle=3,
                                    hash_tokens=True)
    return {
        "dedup_minhash_lsh_sh3": lsh.select(
            "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")),
        "dedup_token_jaccard_sh3": jac.select(
            "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")),
    }


def run_kg_pipeline(spark, sf_dir: str, replicate: int):
    """Fused two-pass pipeline over a pre-materialized source table (the
    production configuration: input synthesis excluded from the measured
    window, stage outputs written to a work dir as on a cluster)."""
    import shutil
    import tempfile

    from wikiprep_spark.plans.pipeline import run_pipeline
    from wikiprep_spark.sources.corpus import build_src_pages

    tmp = tempfile.mkdtemp(prefix="wikiprep_bench_")
    src_path = os.path.join(tmp, "src_pages")
    build_src_pages(spark, sf_dir, replicate=replicate).write.parquet(
        src_path)

    t0 = time.time()
    src = spark.read.parquet(src_path)
    result = run_pipeline(spark, src, work_dir=os.path.join(tmp, "work"),
                          resume=False, fuse_parse=True)
    n_pages = result["_counts"]["transformed"]
    n_triples = result["_counts"]["triples"]
    wall = time.time() - t0
    # edge tables remain lazily derivable from the written outputs; drop
    # the scratch dir once the numbers are in hand
    shutil.rmtree(tmp, ignore_errors=True)
    return wall, n_pages, n_triples, result


def main():
    from wikiprep_spark.plans.queries import QUERIES
    from wikiprep_spark.plans.session import build_session

    spark = build_session(
        app_name="wikiprep-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    queries: dict = {}
    total = 0.0

    kg_wall, n_pages, n_triples, _ = run_kg_pipeline(spark, SF_DIR, REPLICATE)
    queries["kg_pipeline"] = round(kg_wall, 3)
    total += kg_wall

    for name in BENCH_QUERIES:
        t0 = time.time()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        total += dt

    for name, df in _bench_near_dedup(spark, SF_DIR).items():
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        total += dt

    out = {
        "metric": "kg_pages_per_sec",
        "value": round(n_pages / kg_wall, 2),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "total_sec": round(total, 3),
        "kg_pages": n_pages,
        "kg_triples": n_triples,
        "replicate": REPLICATE,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
