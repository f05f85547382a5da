"""interval_join: brute-force parity, bin-boundary cases, reversed
intervals, no-dup guarantee; weighted_sample: ES-key math + determinism."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from wikiprep_spark.operators.curation import weighted_sample
from wikiprep_spark.operators.rangejoin import interval_join


def test_interval_join_matches_brute_force(spark):
    pts = [(i, i * 7 % 100) for i in range(60)]
    ivs = [(j, j * 13 % 90, j * 13 % 90 + j % 11) for j in range(40)]
    p = spark.createDataFrame(pts, "pid long, p long")
    iv = spark.createDataFrame(ivs, "iid long, s long, e long")
    for width in (1, 4, 32, 1000):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(p, iv, "p", "s", "e", width).collect())
        exp = sorted((pid, iid) for pid, pv in pts
                     for iid, s, e in ivs if s <= pv <= e)
        assert got == exp, f"width={width}"
    # each qualifying pair appears exactly once (no bin-overlap dups)
    assert len(got) == len(set(got))


def test_interval_join_edges(spark):
    p = spark.createDataFrame([(1, 10), (2, -5)], "pid long, p long")
    iv = spark.createDataFrame(
        [(1, 10, 10),     # point-sized interval, boundary inclusive
         (2, 20, 5),      # reversed -> dropped
         (3, -10, -1)],   # negative domain
        "iid long, s long, e long")
    got = sorted((r["pid"], r["iid"])
                 for r in interval_join(p, iv, "p", "s", "e", 7).collect())
    assert got == [(1, 1), (2, 3)]
    with pytest.raises(ValueError):
        interval_join(p, iv, "p", "s", "e", 0)


def test_weighted_sample_matches_python(spark):
    rows = [(i, 10 + (i * 37) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [(r["doc_id"], r["rank"]) for r in
           weighted_sample(df, k=10).collect()]

    def es_key(i, w):
        b = int(hashlib.md5(b"wsample:%d" % i).hexdigest()[:4], 16) % 10000
        return math.pow((b + 0.5) / 10000.0, 1.0 / w)

    exp = sorted(rows, key=lambda r: (-es_key(r[0], r[1]), r[0]))[:10]
    assert got == [(doc, rank + 1) for rank, (doc, _) in enumerate(exp)]


def test_weighted_sample_prefers_heavy_items(spark):
    # two strata: weight 1 vs weight 1000 — the top-k should be
    # dominated by heavy items (u^(1/1000) ~ 1 for any u)
    rows = [(i, 1) for i in range(500)] + [
        (1000 + i, 1000) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [r["doc_id"] for r in weighted_sample(df, k=20).collect()]
    assert sum(1 for d in got if d >= 1000) >= 18
