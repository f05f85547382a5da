"""Duplicate-passage statistics (substring-granularity exact dedup).

The driver gate compares against a DuckDB twin over raw shingle strings;
these tests pin the span arithmetic against a pure-Python reference,
including overlap/adjacency merging, sub-k documents, and clean docs.
"""

from wikiprep_spark.operators.dedup import dup_passages


def _py_dup(texts, k, min_docs=2):
    toks = {i: " ".join(t.lower().split()).split(" ") for i, t in texts}
    seen = {}
    for i, w in toks.items():
        for p in range(1, max(len(w) - k + 1, 1) + 1):
            seen.setdefault(" ".join(w[p - 1:p - 1 + k]), set()).add(i)
    dup = {g for g, s in seen.items() if len(s) >= min_docs}
    out = {}
    for i, w in toks.items():
        n = len(w)
        spans = []
        for p in range(1, max(n - k + 1, 1) + 1):
            if " ".join(w[p - 1:p - 1 + k]) in dup:
                e = min(p + k - 1, n)
                if spans and p <= spans[-1][1] + 1:
                    spans[-1][1] = max(spans[-1][1], e)
                else:
                    spans.append([p, e])
        dt = sum(e - s + 1 for s, e in spans)
        out[i] = (n, dt, len(spans), round(dt / n, 6))
    return out


CORPUS = [
    # 1/2 share the 8-token run "one two ... eight" inside different text;
    # consecutive positions must merge into ONE maximal span
    (1, "alpha beta one two three four five six seven eight gamma delta"),
    (2, "x one two three four five six seven eight y z w q r s t u v"),
    # 3 is clean
    (3, "completely unrelated text with no shared runs at all here okay"),
    # 4/5: identical sub-k docs (whole-doc shingle convention)
    (4, "tiny shared doc"),
    (5, "tiny shared doc"),
    # 6: shares the run with 1/2 AND has a second, separate shared run
    # with 7 -> two distinct islands
    (6, "one two three four five six seven eight gap gap gap gap "
        "p q r s t u v w END"),
    (7, "zz p q r s t u v w more stuff to pad this document out fine"),
]


def test_dup_passages_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"],
                         r["dup_spans"], r["dup_ratio"])
           for r in dup_passages(df, k=8).collect()}
    want = _py_dup(CORPUS, k=8)
    assert got == want
    # sanity on the shape the reference computed: 1,2,6 share a merged
    # island; 4,5 fully duplicated; 3 clean
    assert want[3][1] == 0 and want[4][3] == 1.0 and want[5][3] == 1.0
    assert want[6][2] == 2  # two separate islands
    assert want[1][1] >= 8 and want[1][2] == 1


def test_dup_passages_min_docs_threshold(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["doc_id"]: r["dup_tokens"]
           for r in dup_passages(df, k=8, min_docs=3).collect()}
    want = {i: v[1] for i, v in _py_dup(CORPUS, k=8, min_docs=3).items()}
    assert got == want
    # the 1/2/6 run survives (3 docs); the 4/5 and 6/7 runs do not
    assert got[1] > 0 and got[4] == 0 and got[7] == 0
