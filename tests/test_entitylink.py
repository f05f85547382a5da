"""Entity linker: longest-match containment, commonness argmax, n-gram
dictionary bootstrap, and a python brute-force over real testdata."""

from pyspark.sql import functions as F

from wikiprep_spark.operators.entitylink import (
    link_entities, ngram_dictionary, resolve_dictionary,
)

SF = "/root/testdata/sf0.001"


def _dict(spark, rows):
    return spark.createDataFrame(
        rows, "surface string, entity_id long, prior double")


def test_longest_match_containment(spark):
    docs = spark.createDataFrame(
        [(1, "Big data rocks and data wins")],
        "doc_id long, text string")
    d = _dict(spark, [("big data", 10, 0.9), ("data", 20, 0.8)])
    got = sorted(
        (r["pos"], r["surface"], r["entity_id"])
        for r in link_entities(docs, d).collect())
    # 'data' at pos 2 is strictly contained in 'big data' (pos 1, len 2)
    # -> dropped; the free-standing 'data' at pos 5 survives
    assert got == [(1, "big data", 10), (5, "data", 20)]


def test_partial_overlaps_both_survive(spark):
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string")
    d = _dict(spark, [("a b", 1, 0.5), ("b c", 2, 0.5)])
    got = sorted((r["pos"], r["surface"])
                 for r in link_entities(docs, d).collect())
    assert got == [(1, "a b"), (2, "b c")]  # neither contains the other


def test_normalization_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [(1, "  HELLO   world "), (2, ""), (3, "   ")],
        "doc_id long, text string")
    d = _dict(spark, [("hello world", 7, 1.0)])
    got = [(r["doc_id"], r["pos"], r["entity_id"])
           for r in link_entities(docs, d).collect()]
    assert got == [(1, 1, 7)]


def test_resolve_dictionary_argmax_and_prior(spark):
    anchors = spark.createDataFrame(
        [("jaguar", 100, 6), ("jaguar", 200, 3), ("jaguar", 300, 1),
         ("ok", 1, 2), ("tie", 5, 4), ("tie", 4, 4)],
        "surface string, entity_id long, weight long")
    got = {r["surface"]: (r["entity_id"], round(r["prior"], 6))
           for r in resolve_dictionary(anchors).collect()}
    assert got["jaguar"] == (100, 0.6)
    assert got["ok"] == (1, 1.0)
    assert got["tie"] == (4, 0.5)          # weight tie -> smaller id


def test_ngram_dictionary_ranks_by_doc_frequency(spark):
    docs = spark.createDataFrame(
        [(1, "x y common"), (2, "x y common"), (3, "x z common"),
         (4, "q common")],
        "doc_id long, text string")
    d = ngram_dictionary(docs, n_unigrams=2, n_bigrams=2)
    rows = {r["surface"]: (r["entity_id"], r["prior"])
            for r in d.collect()}
    assert rows["common"] == (1, 1.0)       # df 4 of 4 docs
    assert rows["x"] == (2, 0.75)
    assert set(rows) == {"common", "x", "x y", "y common"}
    # bigrams ranked after unigrams: 'x y' df=2 beats 'y common' df=2 on
    # the lexicographic tiebreak -> ids 3, 4
    assert rows["x y"][0] == 3
    assert rows["y common"][0] == 4


def test_linker_brute_force_on_testdata(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    d = ngram_dictionary(docs, n_unigrams=5, n_bigrams=10)
    got = {(r["doc_id"], r["pos"], r["n_tokens"])
           for r in link_entities(docs, d).collect()}
    dic = {r["surface"]: r["entity_id"] for r in d.collect()}
    exp = set()
    for row in docs.collect():
        toks = " ".join(row["text"].lower().split()).split(" ")
        if toks == [""]:
            continue
        spans = []
        for n in (1, 2, 3):
            for s in range(len(toks) - n + 1):
                if " ".join(toks[s:s + n]) in dic:
                    spans.append((s + 1, n))
        for s, n in spans:
            if not any(s2 <= s and s2 + n2 >= s + n and n2 > n
                       for s2, n2 in spans):
                exp.add((row["doc_id"], s, n))
    assert got == exp and len(exp) > 0
