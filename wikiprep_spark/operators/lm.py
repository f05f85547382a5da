"""N-gram language-model perplexity scoring — the quality signal the
CCNet / Gopher / FineWeb-style curation pipelines use to keep fluent text
and drop boilerplate/gibberish (CCNet buckets documents by LM perplexity;
this operator produces that score as a first-class batch step).

Model: bigram LM with add-k smoothing, trained on a model corpus (defaults
to the scored corpus itself — self-perplexity, which flags outliers
against the corpus's own register):

    p(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k * V)
    avg_nll(d) = mean over d's bigrams of -ln p(w2|w1);  ppl = exp(avg_nll)

Scale shape: training is two hash aggregations over the exploded bigram
stream (bigram counts, context counts) plus one scalar distinct-count for
V — all map-side-combining group-bys.  Scoring re-explodes the corpus and
hash-joins the two count tables on their UNIQUE keys (bigram, w1): no row
explosion is possible, probe-side frequency skew is exactly what AQE's
skew-join split handles, and when the model is trained on a bounded
sample (the production pattern at 100 TB: fit on ~1 GB, score everything)
both count tables broadcast and scoring becomes a map-only pass plus the
final per-doc aggregation.  Everything is JVM-side codegen — no Python.

Determinism: the per-bigram term mirrors the SQL twin operation-for-
operation; summation-order float drift is absorbed by the final round(6),
the same contract as the BM25 and curation oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wikiprep_spark.operators.dedup import normalized_text

LM_ADD_K = 1.0


def _bigram_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, n, bigram): each document's adjacent-token pairs joined by
    a single space, with the document's bigram count riding the explode
    (no separate corpus-wide length join — the BM25 dl pattern).  Tokens
    never contain spaces (they are split on single spaces), so the joined
    form is unambiguous.  Documents with fewer than two tokens vanish here
    and are excluded from scoring by construction."""
    toks = F.split(normalized_text(text_col), " ")
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("w"))
        .where(F.size("w") >= 2)
        .select(
            "doc_id",
            (F.size("w") - 1).cast("double").alias("n"),
            F.explode(F.expr(
                "transform(slice(w, 1, size(w) - 1), "
                "(x, i) -> concat(x, ' ', element_at(w, i + 2)))"
            )).alias("bigram"),
        )
    )


def lm_perplexity(
    docs: DataFrame, model_docs: DataFrame | None = None,
    id_col: str = "doc_id", text_col: str = "text",
    k: float = LM_ADD_K, round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll, ppl) for every document of ``docs``
    with at least two tokens, scored under the bigram LM fitted on
    ``model_docs`` (default: ``docs`` itself).  Bigrams unseen in the
    model corpus are handled by the add-k mass; contexts unseen in the
    model corpus would yield p = k/(kV) = 1/V (the left joins below
    coalesce to zero counts)."""
    model = _bigram_stream(
        model_docs if model_docs is not None else docs, id_col, text_col)
    big = model.groupBy("bigram").agg(
        F.count("*").cast("double").alias("c2"))
    ctx = (
        model.select(F.substring_index("bigram", " ", 1).alias("w1"))
        .groupBy("w1").agg(F.count("*").cast("double").alias("c1"))
    )
    mdocs = model_docs if model_docs is not None else docs
    vocab = (
        mdocs.select(F.explode(
            F.split(normalized_text(text_col), " ")).alias("t"))
        .agg(F.countDistinct("t").cast("double").alias("v"))
    )
    scored = (
        _bigram_stream(docs, id_col, text_col)
        .join(big, "bigram", "left")
        .join(ctx,
              F.substring_index("bigram", " ", 1) == F.col("w1"), "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n"),
            F.sum(
                -F.log(
                    (F.coalesce("c2", F.lit(0.0)) + k)
                    / (F.coalesce("c1", F.lit(0.0)) + k * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n").cast("long").alias("n_bigrams"),
        F.round(F.col("nll") / F.col("n"), round_to).alias("avg_nll"),
        F.round(F.exp(F.col("nll") / F.col("n")), round_to).alias("ppl"),
    )
