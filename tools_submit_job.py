#!/usr/bin/env python
"""Cluster-style job entry point for ``spark-submit --py-files`` (the
north-rule launch mode).

The engine package is NOT assumed to be on the driver's filesystem path:
``wikiprep_spark`` must arrive via ``--py-files wikiprep_spark.zip``
exactly as it would on a real cluster (tests/test_submit.py runs this
file from a scratch directory to prove it).  Usage:

    spark-submit --master local[4] --py-files wikiprep_spark.zip \
        tools_submit_job.py <sf_dir> [work_dir]

Prints ``TRIPLES <n>`` on success.
"""

import sys

from pyspark.sql import SparkSession


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work_dir = sys.argv[2] if len(sys.argv) > 2 else None

    spark = SparkSession.builder.appName("wikiprep-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imported AFTER the session exists so the modules resolve from the
    # --py-files archive on a bare driver
    from wikiprep_spark.plans.pipeline import run_pipeline
    from wikiprep_spark.sources.corpus import build_src_pages

    src = build_src_pages(spark, sf_dir, limit=40)
    result = run_pipeline(spark, src, work_dir=work_dir)
    print("TRIPLES %d" % result["triples"].count())
    spark.stop()


if __name__ == "__main__":
    main()
