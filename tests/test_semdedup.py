"""SemDeDup decisions: greedy-prefix semantics vs a numpy brute force,
keeper ordering, and the max_cluster conservative guard."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from wikiprep_spark.operators.semdedup import (
    semantic_dedup, semdedup_seed_centroids,
)

SF = "/root/testdata/sf0.001"


def _brute(vecs, centroids, eps):
    """Plain-python SemDeDup: assign -> order -> upper-triangular drop."""
    ids = sorted(vecs)
    cmat = {cid: np.array(c) for cid, c in centroids}

    def cos(a, b):
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b)))

    assign, csim = {}, {}
    for i in ids:
        best = min(((-cos(vecs[i], c), cid) for cid, c in cmat.items()))
        assign[i], csim[i] = best[1], -best[0]
    dropped = set()
    for cid in set(assign.values()):
        members = sorted((m for m in ids if assign[m] == cid),
                         key=lambda m: (-csim[m], m))
        for x, i in enumerate(members):
            for j in members[:x]:
                if cos(vecs[i], vecs[j]) >= eps:
                    dropped.add(i)
                    break
    return assign, dropped


def test_semdedup_matches_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = semdedup_seed_centroids(emb, n_clusters=8)
    got = semantic_dedup(emb, centroids=cents, eps=0.35).collect()
    vecs = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
            for r in emb.collect()}
    assign, dropped = _brute(vecs, cents, 0.35)
    assert len(got) == len(vecs)
    for r in got:
        assert r["cluster_id"] == assign[r["vec_id"]]
        assert r["is_duplicate"] == (r["vec_id"] in dropped)


def test_semdedup_seed_determinism(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = semdedup_seed_centroids(emb.repartition(7), n_clusters=4)
    b = semdedup_seed_centroids(emb.repartition(2), n_clusters=4)
    assert a == b
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    exp = sorted(ids, key=lambda i: hashlib.md5(
        b"sem:%d" % i).hexdigest())[:4]
    emb_by_id = {r["vec_id"]: [float(x) for x in r["embedding"]]
                 for r in emb.collect()}
    assert [c for _, c in a] == [emb_by_id[i] for i in exp]


def test_semdedup_hand_case_and_max_cluster_guard(spark):
    rows = [
        (1, [1.0, 0.0]),     # kept (closest to its centroid or first)
        (2, [1.0, 0.001]),   # near-identical to 1 -> duplicate
        (3, [0.0, 1.0]),     # orthogonal -> kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    got = {r["vec_id"]: r for r in semantic_dedup(
        emb, centroids=cents, eps=0.9).collect()}
    assert not got[1]["is_duplicate"]
    assert got[2]["is_duplicate"]
    assert not got[3]["is_duplicate"]
    assert got[1]["cluster_id"] == got[2]["cluster_id"] == 0
    assert got[3]["cluster_id"] == 1
    # guard: cluster 0 (size 2) exempted -> nothing dropped, all rows kept
    guarded = {r["vec_id"]: r for r in semantic_dedup(
        emb, centroids=cents, eps=0.9, max_cluster=1).collect()}
    assert len(guarded) == 3
    assert not any(r["is_duplicate"] for r in guarded.values())
