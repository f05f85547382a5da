"""PageRank + BM25 retrieval operators.

The driver gate compares these against generated DuckDB twins
(plans/oracles.py pagerank_oracle / bm25_oracle); these tests pin the
semantics against independent pure-Python references so the Spark side
and its SQL twin cannot share a bug.
"""

import math

import pytest
from pyspark.sql import functions as F

from wikiprep_spark.operators import retrieval
from wikiprep_spark.operators.graph import pagerank


def _py_pagerank(edges, d=0.85, iters=5):
    nodes = sorted({a for a, b in edges} | {b for a, b in edges})
    out = {n: 0 for n in nodes}
    for a, _ in edges:
        out[a] += 1
    n = len(nodes)
    r = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        contrib = {x: 0.0 for x in nodes}
        for a, b in edges:
            contrib[b] += r[a] / out[a]
        dm = sum(r[x] for x in nodes if out[x] == 0)
        r = {x: (1 - d) / n + d * (contrib[x] + dm / n) for x in nodes}
    return r


def test_pagerank_matches_reference(spark):
    # hub, chain, a dangling node (4), and a cycle
    edges = [(1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (5, 1),
             (5, 6), (6, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    want = _py_pagerank(edges)
    assert set(got) == set(want)
    for n_, v in want.items():
        assert got[n_] == pytest.approx(v, abs=1e-6)
    # dangling redistribution keeps total mass at 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def _py_bm25(docs, queries, k1=retrieval.BM25_K1, b=retrieval.BM25_B):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for qid, q in queries.items():
        for i, w in toks.items():
            s = 0.0
            for t in dict.fromkeys(q.split()):
                tf = w.count(t)
                if not tf:
                    continue
                df_ = sum(1 for ww in toks.values() if t in ww)
                idf = math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(w) / avgdl))
            if s > 0:
                out[(qid, i)] = round(s, 6)
    return out


def test_bm25_matches_reference(spark):
    docs = [
        (1, "hash join hash join table scan"),
        (2, "table scan filter filter filter"),
        (3, "window agg window agg stream stream stream"),
        (4, "hash table"),
        (5, "completely unrelated words here"),
    ]
    queries = {7: "hash join", 8: "stream filter"}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = retrieval.bm25_topk(df, queries=queries, k=3).collect()
    want = _py_bm25(docs, queries)
    got_scores = {(r["query_id"], r["doc_id"]): r["score"] for r in got}
    for key, sc in got_scores.items():
        assert sc == pytest.approx(want[key], abs=1e-6)
    # top-3 per query by (score desc, doc_id asc), rnk 1-based
    for qid in queries:
        ranked = sorted(
            ((i, s) for (q, i), s in want.items() if q == qid),
            key=lambda x: (-x[1], x[0]))[:3]
        got_q = sorted(
            (r["doc_id"] for r in got if r["query_id"] == qid))
        assert got_q == sorted(i for i, _ in ranked)
        by_rnk = {r["rnk"]: r["doc_id"]
                  for r in got if r["query_id"] == qid}
        assert [by_rnk[j + 1] for j in range(len(ranked))] == [
            i for i, _ in ranked]


def test_bm25_two_phase_topk_equals_global(spark):
    # the bucketed phase-1 prune must be invisible: compare against a
    # direct global ranking of the same scored set at a k small enough
    # that buckets could in principle hide a winner
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = retrieval.bm25_topk(docs, k=5)
    full = retrieval.bm25_topk(docs, k=10_000)  # k > corpus: no pruning
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    want = (
        full.select("query_id", "doc_id", "score")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect()))
