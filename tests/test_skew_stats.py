"""Key-skew heavy-hitter profile: deterministic ranking incl. ties."""

from wikiprep_spark.operators.stats import key_skew_stats


def test_skew_stats_ranking_and_ties(spark):
    rows = ([("hub", i) for i in range(10)]
            + [("a", 0), ("a", 1), ("a", 2)]
            + [("b", 0), ("b", 1), ("b", 2)]       # ties with 'a'
            + [("z", 0)])
    df = spark.createDataFrame(rows, "k string, v long")
    got = [tuple(r) for r in key_skew_stats(df, ["k"], top_k=3).collect()]
    total, nkeys = 17, 4
    assert got == [
        (1, "hub", 10, round(10 / total, 6), total, nkeys),
        (2, "a", 3, round(3 / total, 6), total, nkeys),   # tie: key asc
        (3, "b", 3, round(3 / total, 6), total, nkeys),
    ]


def test_skew_stats_composite_key(spark):
    rows = [(1, "x", i) for i in range(4)] + [(2, "y", 0)]
    df = spark.createDataFrame(rows, "a long, b string, v long")
    got = {r["key"]: r["cnt"]
           for r in key_skew_stats(df, ["a", "b"], top_k=5).collect()}
    assert got == {"1|x": 4, "2|y": 1}
