#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query isolation with the
noop sink, .explain("formatted") capture, and repeat timings.

NOT the driver bench — bench.py is frozen for measurement.  This file
exists so OPTIMIZATION_r06.md can cite isolated before/after numbers and
committed plan files (plans/r06/<query>_{before,after}.txt).

Usage:
  python bench_extra.py plans <out_suffix> [query ...]   # explain -> plans/r06/
  python bench_extra.py time <n_reps> [query ...]        # noop timings JSON
  python bench_extra.py kgstages                         # kg pipeline stage walls
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
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def _session():
    from wikiprep_spark.plans.session import build_session

    spark = build_session(
        app_name="wikiprep-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _runners(spark):
    """name -> zero-arg DataFrame builder, covering the bench surface
    (QUERIES entries + the near-dedup family with bench parameters)."""
    import bench as bench_mod
    from wikiprep_spark.plans.queries import QUERIES

    runners = {
        name: (lambda n=name: QUERIES[n](spark, SF_DIR))
        for name in QUERIES
    }
    runners.update(bench_mod._bench_near_dedup(spark, SF_DIR))
    return runners


def cmd_plans(suffix, names):
    spark = _session()
    runners = _runners(spark)
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = runners[name]()
        p = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        print(f"wrote {p}")
    spark.stop()


def cmd_time(reps, names):
    spark = _session()
    runners = _runners(spark)
    # warm the worker pool / codegen outside the measured windows
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()
    out = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            df = runners[name]()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
        print(json.dumps({name: samples}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


def cmd_kgstages():
    """One fused-mode kg pipeline run with per-stage walls (the bench's
    run_kg_pipeline path), reading metrics.jsonl before cleanup."""
    import shutil
    import tempfile

    from wikiprep_spark.plans.pipeline import run_pipeline
    from wikiprep_spark.sources.corpus import build_src_pages

    spark = _session()
    tmp = tempfile.mkdtemp(prefix="wikiprep_kgstage_")
    src_path = os.path.join(tmp, "src_pages")
    build_src_pages(spark, SF_DIR, replicate=REPLICATE).write.parquet(
        src_path)
    t0 = time.time()
    src = spark.read.parquet(src_path)
    result = run_pipeline(spark, src, work_dir=os.path.join(tmp, "work"),
                          resume=False, fuse_parse=True)
    wall = time.time() - t0
    print(json.dumps({
        "wall": round(wall, 3),
        "stages": result["_metrics"].stages,
        "counts": result["_counts"],
    }))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "plans":
        cmd_plans(sys.argv[2], sys.argv[3:])
    elif cmd == "time":
        cmd_time(int(sys.argv[2]), sys.argv[3:])
    elif cmd == "kgstages":
        cmd_kgstages()
    else:
        raise SystemExit(f"unknown command {cmd}")
