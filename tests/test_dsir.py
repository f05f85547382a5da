"""DSIR importance weighting (Xie et al., NeurIPS'23).

The driver gate runs the full relational twin in DuckDB; these tests pin
the model arithmetic against a pure-Python reference (same md5-60bit
bucket hashing, add-k smoothing, Gumbel construction) and check the
selection ordering behaves as DSIR should: target-like docs outrank
off-target docs.
"""

import hashlib
import math

from pyspark.sql import functions as F

from wikiprep_spark.operators.curation import (
    DSIR_ADD_K, DSIR_BUCKETS, dsir_logweights,
)


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text, buckets):
    w = " ".join(text.lower().split()).split(" ")
    grams = list(w) + [f"{a} {b}" for a, b in zip(w, w[1:])]
    return [_h60(g) % buckets for g in grams]


def _py_dsir(docs, target, buckets=DSIR_BUCKETS, k=DSIR_ADD_K):
    fs = {i: _feats(t, buckets) for i, t in docs}
    ft = [b for i, t in target for b in _feats(t, buckets)]
    cs, ct = {}, {}
    for f in fs.values():
        for b in f:
            cs[b] = cs.get(b, 0) + 1
    for b in ft:
        ct[b] = ct.get(b, 0) + 1
    ns, nt = sum(cs.values()), len(ft)
    out = {}
    for i, f in fs.items():
        lw = sum(
            math.log((ct.get(b, 0) + k) / (nt + k * buckets))
            - math.log((cs.get(b, 0) + k) / (ns + k * buckets))
            for b in f
        )
        bucket = int(hashlib.md5(f"dsir:{i}".encode()).hexdigest()[:4],
                     16) % 10000
        g = -math.log(-math.log((bucket + 0.5) / 10000.0))
        out[i] = (len(f), round(lw, 6), round(lw + g, 6))
    return out


CORPUS = [
    (1, "the cat sat on the mat and looked at the dog"),
    (2, "der hund lief durch den park und bellte laut dabei"),
    (3, "the dog ran through the park and barked at the cat"),
    (4, "le chat est sur le tapis et regarde le chien"),
    (5, "solo"),   # single token: the no-bigram CASE branch
]
TARGET = [(10, "the cat and the dog sat on the mat"),
          (11, "a dog barked at a cat in the park")]


def test_dsir_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_feats"], r["log_weight"],
                         r["resample_score"])
           for r in dsir_logweights(docs, tgt).collect()}
    want = _py_dsir(CORPUS, TARGET)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 2e-6, (i, got[i], want[i])
        assert abs(got[i][2] - want[i][2]) < 2e-6
    # DSIR ordering: English docs sharing target vocabulary must outweigh
    # the German/French docs under an English target
    assert got[1][1] > got[2][1] and got[3][1] > got[4][1]


def test_dsir_self_target_is_flat(spark):
    """Target == source -> every feature's log-ratio is 0 -> all weights
    exactly 0 (the two smoothed multinomials coincide)."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = dsir_logweights(docs, docs).collect()
    assert len(rows) == len(CORPUS)
    assert all(r["log_weight"] == 0.0 for r in rows)


def test_dsir_query_target_slice(spark):
    """The driver query's target slice (lang='en') keeps every doc in the
    output exactly once."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dsir_logweights(docs, docs.where(F.col("lang") == "en"))
    n = out.count()
    assert n == docs.count()
    assert out.select("doc_id").distinct().count() == n
