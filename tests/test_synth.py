"""synth_embeddings: determinism, shape, planted near-dups, topic labels."""

import math

from wikiprep_spark.sources.synth import synth_embeddings


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_synth_embeddings_shape_and_determinism(spark):
    a = {r["vec_id"]: (list(r["embedding"]), r["label"])
         for r in synth_embeddings(spark, 300, dim=16).collect()}
    b = {r["vec_id"]: (list(r["embedding"]), r["label"])
         for r in synth_embeddings(
             spark, 300, dim=16).repartition(7).collect()}
    assert a == b and len(a) == 300
    assert all(len(v[0]) == 16 for v in a.values())
    assert all(0 <= v[1] < 16 for v in a.values())


def test_synth_embeddings_planted_near_dups(spark):
    rows = {r["vec_id"]: list(r["embedding"])
            for r in synth_embeddings(spark, 500, dim=32,
                                      dup_every=100).collect()}
    # every 100th vector (id 99, 199, ...) is its predecessor nudged in
    # one dimension -> cosine ~ 1; unrelated consecutive pairs are not
    for i in (99, 199, 299, 399, 499):
        if i in rows:
            assert _cos(rows[i], rows[i - 1]) > 0.999
    unrelated = [_cos(rows[i], rows[i - 1])
                 for i in (50, 150, 250) if i in rows]
    assert all(c < 0.99 for c in unrelated)
