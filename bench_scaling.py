#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: the identical
knowledge-graph pipeline job on the identical input at two parallelism
levels standing in for N- and 4N-executor clusters.

Each level runs CPU-PINNED (taskset) to exactly N / 4N cores: plain
local[k] only limits task slots while JVM/GC/Arrow threads spill onto the
other idle cores, silently inflating the low-parallelism throughput.
Pinning makes "a cluster with N cores total" physically true.  Levels
default to 2 vs 8 cores — inside this sandbox's linear CPU region (the
guest kernel degrades single-process scheduling beyond ~8-16 concurrent
threads, a local-mode artifact no multi-executor cluster hits; see the
measurement note in plans/session.py).

Writes BENCH/BASELINE.md with throughput at both levels and scaling
efficiency = (throughput@4N / throughput@N) / 4.

Usage: python bench_scaling.py [N] (default 2 -> local[2] vs local[8]);
SPARK_GRAFT_SF_DIR / SPARK_GRAFT_REPLICATE env as in bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "160"))

_CHILD_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from wikiprep_spark.plans.session import build_session
from wikiprep_spark.plans.pipeline import run_pipeline
from wikiprep_spark.sources.corpus import build_src_pages

cores = {cores}
spark = build_session(app_name="wikiprep-scaling",
                      master="local[%d]" % cores,
                      shuffle_partitions=max(cores * 2, 8))
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
src = build_src_pages(spark, {sf_dir!r}, replicate={replicate})
result = run_pipeline(spark, src)
n_pages = result["transformed"].count()
n_triples = result["triples"].count()
wall = time.time() - t0
print("RESULT " + json.dumps({{"cores": cores, "wall": wall,
                               "pages": n_pages, "triples": n_triples,
                               "pages_per_sec": n_pages / wall}}))
spark.stop()
"""


def run_at(cores: int) -> dict:
    """Each measurement in a fresh driver process so levels share no state."""
    code = _CHILD_SNIPPET.format(
        repo=os.path.dirname(os.path.abspath(__file__)),
        cores=cores, sf_dir=SF_DIR, replicate=REPLICATE,
    )
    argv = [sys.executable, "-c", code]
    if os.path.exists("/usr/bin/taskset"):
        argv = ["taskset", "-c", f"0-{cores - 1}"] + argv
    out = subprocess.run(argv, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"run at local[{cores}] produced no result:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    lo = run_at(n)
    hi = run_at(4 * n)
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / 4.0

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH — knowledge-graph pipeline throughput & scaling\n\n"
            f"Input: synthetic corpus from `{SF_DIR}/documents.parquet` "
            f"(replicate={REPLICATE}, {lo['pages']} pages); identical job "
            f"and input at two parallelism levels (local[{n}] vs "
            f"local[{4*n}], each CPU-PINNED via taskset to exactly that "
            "many cores, standing in for N- and 4N-executor clusters per "
            "the round-1 sandbox protocol; pinning stops JVM/GC/Arrow "
            "threads from borrowing idle cores and inflating the "
            "low-parallelism number).\n\n"
            "| parallelism | pages | triples | wall (s) | pages/sec |\n"
            "|---|---|---|---|---|\n"
            f"| local[{n}] | {lo['pages']} | {lo['triples']} | "
            f"{lo['wall']:.1f} | {lo['pages_per_sec']:.1f} |\n"
            f"| local[{4*n}] | {hi['pages']} | {hi['triples']} | "
            f"{hi['wall']:.1f} | {hi['pages_per_sec']:.1f} |\n\n"
            f"**Scaling efficiency (N -> 4N): {eff:.3f}** "
            "(gate: >= 0.8)\n\n"
            "Reference anchor (BASELINE.md): ~60 pages/s/process, "
            "~170 pages/s aggregate on 12 processes (2011 hardware).\n"
        )
    print(json.dumps({"n_executors": n, "lo": lo, "hi": hi,
                      "scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
