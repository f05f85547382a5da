"""Sliding-window document chunking.

The driver gate compares chunk TEXT byte-exact against the DuckDB twin;
these tests pin the window algebra (stride, covering count, short last
chunk, totality) against a pure-Python reference.
"""

import pytest

from wikiprep_spark.operators.textops import chunk_documents


def _py_chunks(texts, c, o):
    s = c - o
    out = []
    for i, t in texts:
        w = " ".join(t.lower().split()).split(" ")
        n = len(w)
        k_max = max(-(-(n - c) // s), 0)
        for k in range(k_max + 1):
            out.append((i, k, k * s, min(c, n - k * s),
                        " ".join(w[k * s:k * s + c])))
    return sorted(out)


def test_chunking_matches_reference(spark):
    texts = [
        (1, " ".join(f"t{j}" for j in range(23))),   # 23 toks @ (10,2)
        (2, "short doc"),                            # single chunk
        (3, ""),                                     # empty -> one chunk
        (4, " ".join(f"u{j}" for j in range(16))),   # exact 2-window fit
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(map(tuple,
                     chunk_documents(df, chunk_tokens=10,
                                     overlap=2).collect()))
    want = _py_chunks(texts, 10, 2)
    assert got == want
    # spot-check the algebra: 23 tokens, stride 8 -> chunks at 0/8/16,
    # last one 7 tokens long
    d1 = [g for g in got if g[0] == 1]
    assert [g[2] for g in d1] == [0, 8, 16] and d1[-1][3] == 7
    # every token of every doc is covered by some chunk
    for i, t in texts:
        n = len(" ".join(t.lower().split()).split(" "))
        covered = set()
        for g in (x for x in got if x[0] == i):
            covered.update(range(g[2], g[2] + g[3]))
        assert covered == set(range(n))


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
