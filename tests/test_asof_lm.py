"""As-of join + bigram-LM perplexity operators.

The driver gate compares these against DuckDB twins (for the as-of join,
DuckDB's NATIVE ASOF JOIN — an independent engine implementation); these
tests pin the semantics against pure-Python / pandas references so the
Spark side and its SQL twin cannot share a bug.
"""

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikiprep_spark.operators.asof import asof_join
from wikiprep_spark.operators.lm import lm_perplexity

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_asof_join_semantics(spark):
    # key 1: matches incl. an exact-tie (inclusive), a duplicate right
    # timestamp (max-payload row wins), and a left row before any right.
    # key 2: right rows only (no left output).  key 3: left only -> NULLs.
    left = spark.createDataFrame(
        [(100, 1, _ts(5)), (101, 1, _ts(10)), (102, 1, _ts(0)),
         (103, 3, _ts(7))],
        "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 900), (1, _ts(5), 901), (1, _ts(2), 800),
         (2, _ts(1), 700)],
        "k long, ts timestamp, rid long")
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, on="k",
                           right_cols=("rid",)).collect()
    }
    assert got == {100: 901,   # tie at ts=5 is inclusive; max rid wins
                   101: 901,   # latest at-or-before 10 is ts=5
                   102: None,  # before any right row
                   103: None}  # key has no right rows


def test_asof_join_null_right_ts_never_matches(spark):
    # a right row with NULL ts sorts FIRST under the ascending window
    # order; without the explicit filter its payload would carry forward
    # as a "match" for every left row of the key, where the ASOF
    # predicate l.ts >= r.ts can never be true for NULL
    left = spark.createDataFrame([(100, 1, _ts(5))],
                                 "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 999), (1, _ts(2), 800)],
        "k long, ts timestamp, rid long")
    got = {r["lid"]: r["rid"]
           for r in asof_join(left, right, on="k",
                              right_cols=("rid",)).collect()}
    assert got == {100: 800}


def test_asof_join_matches_pandas_merge_asof(spark):
    # randomized-ish cross-check on real data: purchases vs views from the
    # sf0.001 events table, views deduped per (user, ts) by max event_id
    # exactly as the operator documents
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("lid"), "user_id", "ts")
    right = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("rid"))
    got = (
        asof_join(left, right, on="user_id", right_cols=("rid",))
        .orderBy("lid").toPandas()
    )
    lp = left.toPandas().sort_values("ts", kind="mergesort")
    rp = (
        right.toPandas()
        .groupby(["user_id", "ts"], as_index=False)["rid"].max()
        .sort_values("ts", kind="mergesort")
    )
    want = (
        pd.merge_asof(lp, rp, on="ts", by="user_id",
                      direction="backward", allow_exact_matches=True)
        .sort_values("lid")
    )
    assert len(got) == len(want) > 0
    assert list(got["lid"]) == list(want["lid"])
    g = got["rid"].astype("float64").fillna(-1.0)
    w = want["rid"].astype("float64").fillna(-1.0)
    assert list(g) == list(w)


def _py_bigram_ppl(texts, k=1.0):
    toks = {i: " ".join(t.lower().split()).split(" ") for i, t in texts}
    big, ctx, vocab = {}, {}, set()
    for w in toks.values():
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for i, w in toks.items():
        if len(w) < 2:
            continue
        nll = sum(
            -math.log((big[(a, b)] + k) / (ctx[a] + k * v))
            for a, b in zip(w, w[1:]))
        n = len(w) - 1
        out[i] = (n, round(nll / n, 6), round(math.exp(nll / n), 6))
    return out


def test_lm_perplexity_matches_reference(spark):
    texts = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the cat"),
        (3, "quantum flux capacitor inverts the cat"),
        (4, "the the the the"),
        (5, "singleton"),   # <2 tokens: excluded
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
           for r in lm_perplexity(df).collect()}
    want = _py_bigram_ppl(texts)
    assert set(got) == set(want) == {1, 2, 3, 4}
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)
        assert got[i][2] == pytest.approx(want[i][2], abs=2e-6)
    # the all-repeats doc must be the most predictable, the novel-words
    # doc the least — the signal the curation pipeline buckets on
    assert got[4][2] < got[1][2] < got[3][2]


def test_lm_perplexity_external_model(spark):
    # scoring under a model fitted on a DIFFERENT corpus: unseen bigrams
    # and contexts take the add-k mass (coalesced zero counts)
    model = spark.createDataFrame(
        [(10, "a b a b"), (11, "b c")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "a b c"), (2, "z z")], "doc_id long, text string")
    got = {r["doc_id"]: r["ppl"]
           for r in lm_perplexity(score, model_docs=model).collect()}
    # v=3 (a,b,c); d1: p(b|a)=(2+1)/(2+3)=0.6, p(c|b)=(1+1)/(2+3)=0.4
    want1 = math.exp((-math.log(0.6) - math.log(0.4)) / 2)
    # d2: z unseen everywhere -> p = (0+1)/(0+3)
    want2 = math.exp(-math.log(1.0 / 3.0))
    assert got[1] == pytest.approx(round(want1, 6), abs=2e-6)
    assert got[2] == pytest.approx(round(want2, 6), abs=2e-6)
