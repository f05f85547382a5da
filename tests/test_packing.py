"""Sequence-packing placement (distributed prefix sum).

The driver gate compares against a DuckDB twin that uses the NAIVE
single-window global cumsum; these tests pin the arithmetic against a
pure-Python reference and prove the result is invariant to the partition
count (a prefix sum must not care where the range boundaries fall).
"""

from wikiprep_spark.operators.packing import pack_sequences


def _py_pack(texts, L):
    rows, cum = {}, 0
    for i, t in sorted(texts):
        n = len(" ".join(t.lower().split()).split(" "))
        rows[i] = (n, cum, cum // L, (cum + n - 1) // L)
        cum += n
    return rows


def test_pack_sequences_matches_reference(spark):
    texts = [
        (1, "a b c d e"),            # 5 tokens: [0, 5)  -> seqs 0..1
        (2, "f g h"),                # 3 tokens: [5, 8)  -> seqs 1..1
        (3, "i"),                    # 1 token:  [8, 9)  -> seqs 2..2
        (4, "j k l m n o p q r s"),  # 10 tokens: [9,19) -> seqs 2..4
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["tok_start"],
                         r["seq_first"], r["seq_last"])
           for r in pack_sequences(df, seq_len=4).collect()}
    assert got == _py_pack(texts, 4)


def test_pack_sequences_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(map(tuple,
                   pack_sequences(docs, num_partitions=2).collect()))
    b = sorted(map(tuple,
                   pack_sequences(docs, num_partitions=16).collect()))
    assert a == b and len(a) > 0
    # the stream is gapless: offsets sorted by doc_id chain exactly
    by_id = sorted((r[0], r[2], r[1]) for r in a)  # (doc_id, start, n)
    cum = 0
    for _, start, n in by_id:
        assert start == cum
        cum += n
