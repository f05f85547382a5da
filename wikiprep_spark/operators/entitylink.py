"""Dictionary-based entity linking (wikification) over document text.

The north-rule pipeline stage between triple extraction and
canonicalization: given a surface-form dictionary — classically the
anchor-text dictionary the KG pipeline emits (operators/edges.py
anchor_text_edges; reference sink `Output/Legacy.pm` anchor_text, the
standard entity-linking prior since Mihalcea & Csomai 2007 / Milne &
Witten 2008) — find dictionary mentions in free text and link each to its
most probable entity (the "commonness" argmax).

Relational formulation (deterministic, DuckDB-twinnable):

- tokens = whitespace split of the normalized text (lower + whitespace
  collapse — the same norm as operators/textops).
- candidate mentions = every token n-gram for n = 1..max_len, generated
  by higher-order functions on the token array (zero shuffle, no python).
- match = hash join against the dictionary on the surface string.  The
  dictionary at web scale is itself huge (every anchor text), so this is
  a key-distributed join, not a mandatory broadcast; AQE broadcasts it
  when small.
- overlap resolution = longest-match: a matched mention is dropped iff
  another matched mention in the same document STRICTLY CONTAINS its
  token span.  (Partial, non-nested overlaps both survive — the
  deterministic relational core of the greedy scanner; documented.)
- entity choice = per-surface argmax prior with entity-id ascending
  tiebreak, resolved once on the dictionary side (``resolve_dictionary``)
  so the text-side join fans out to exactly one row per mention.

Scale shape: one surface-keyed join (mentions x dictionary) + one
doc-keyed self-join for containment.  Mentions per doc are O(tokens x
max_len); the containment join is per-doc quadratic in MATCHED mentions
only — bounded by dictionary hits, not text length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NORM = "trim(regexp_replace(lower(%s), '\\\\s+', ' '))"


def resolve_dictionary(dictionary: DataFrame,
                       surface_col: str = "surface",
                       entity_col: str = "entity_id",
                       weight_col: str = "weight") -> DataFrame:
    """Collapse a (surface, entity, weight) anchor dictionary to one row
    per surface: the argmax-weight entity (ties to the smaller entity id)
    plus the commonness prior weight/sum(weight) — the P(entity|surface)
    maximum a posteriori link."""
    from pyspark.sql import Window

    w = Window.partitionBy(surface_col)
    ranked = (
        dictionary.groupBy(surface_col, entity_col)
        .agg(F.sum(weight_col).cast("double").alias("w"))
        .withColumn("total", F.sum("w").over(w))
        .withColumn(
            "rn",
            F.row_number().over(
                w.orderBy(F.desc("w"), F.asc(entity_col))),
        )
    )
    return ranked.where(F.col("rn") == 1).select(
        F.col(surface_col).alias("surface"),
        F.col(entity_col).alias("entity_id"),
        (F.col("w") / F.col("total")).alias("prior"),
    )


def link_entities(docs: DataFrame, dictionary: DataFrame,
                  max_len: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Link dictionary surface forms in ``docs`` text.

    ``dictionary``: one row per surface — (surface, entity_id, prior)
    (see resolve_dictionary).  Returns (doc_id, pos, n_tokens, surface,
    entity_id, prior rounded 6): pos is the 1-based token offset of the
    mention, longest-match filtered as described in the module docstring.
    """
    toks = F.expr(
        "split(" + _NORM % text_col + ", ' ')")
    # NB sequence(1, 0) DESCENDS in Spark (it is never empty), so short
    # docs are handled by filtering start positions, not by the bound
    grams = F.expr(
        "flatten(transform(sequence(1, %d), n -> "
        "transform(filter(sequence(1, size(toks)), "
        "s -> s + n - 1 <= size(toks)), "
        "s -> struct(s AS pos, n AS n_tokens, "
        "array_join(slice(toks, s, n), ' ') AS surface))))" % max_len)
    mentions = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .where(F.col("toks") != F.array(F.lit("")))
        .select("doc_id", F.explode(grams).alias("m"))
        .select(
            "doc_id",
            F.col("m.pos").cast("long").alias("pos"),
            F.col("m.n_tokens").cast("long").alias("n_tokens"),
            F.col("m.surface").alias("surface"),
        )
    )
    # matched feeds three consumers (containment probe side, containment
    # left side, final output join): materialize it once — the dictionary
    # join and the n-gram explode would otherwise be planned and executed
    # three times (the triangle_counts / pagerank checkpoint pattern)
    matched = mentions.join(dictionary, "surface").localCheckpoint()
    inner = matched.select(
        "doc_id", F.col("pos").alias("p2"),
        F.col("n_tokens").alias("n2"),
    )
    contained = (
        matched.join(inner, "doc_id")
        .where(
            (F.col("p2") <= F.col("pos"))
            & (F.col("p2") + F.col("n2")
               >= F.col("pos") + F.col("n_tokens"))
            & (F.col("n2") > F.col("n_tokens"))
        )
        .select("doc_id", "pos", "n_tokens")
        .distinct()
        .withColumn("drop", F.lit(True))
    )
    return (
        matched.join(contained, ["doc_id", "pos", "n_tokens"], "left")
        .where(F.col("drop").isNull())
        .select(
            "doc_id", "pos", "n_tokens", "surface", "entity_id",
            F.round("prior", 6).alias("prior"),
        )
    )


def ngram_dictionary(docs: DataFrame, n_unigrams: int = 10,
                     n_bigrams: int = 30, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """A self-contained synthetic knowledge base for gating the linker
    end-to-end without external data: entities are the corpus's
    ``n_unigrams`` most document-frequent unigrams and ``n_bigrams`` most
    document-frequent bigrams (ties to the lexicographically smaller
    surface), entity_id = the surface's dense rank by (df DESC, surface
    ASC) — unigrams then bigrams — and prior = df / n_docs.  The linker's
    mechanics (n-gram scan, surface join, longest-match containment,
    prior plumbing) are what the oracle twin gates; a production caller
    passes the real anchor dictionary instead."""
    from pyspark.sql import Window

    toks = F.expr("split(" + _NORM % text_col + ", ' ')")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    n_docs = base.count()

    def top(n_tok: int, k: int, id_offset: int) -> DataFrame:
        grams = F.expr(
            "transform(filter(sequence(1, size(toks)), "
            "s -> s + %d - 1 <= size(toks)), "
            "s -> array_join(slice(toks, s, %d), ' '))"
            % (n_tok, n_tok))
        df_counts = (
            base.select("doc_id",
                        F.explode(F.array_distinct(grams)).alias("surface"))
            .groupBy("surface")
            .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        )
        w = Window.orderBy(F.desc("df"), F.asc("surface"))
        return (
            df_counts.orderBy(F.desc("df"), F.asc("surface")).limit(k)
            .withColumn("entity_id",
                        (F.row_number().over(w) + id_offset).cast("long"))
        )
    uni = top(1, n_unigrams, 0)
    bi = top(2, n_bigrams, n_unigrams)
    return uni.unionByName(bi).select(
        "surface", "entity_id",
        (F.col("df").cast("double") / F.lit(float(n_docs))).alias("prior"),
    )
