"""Corpus-curation operators for LLM training-data pipelines: repetition
filters (Gopher), PII scrubbing (C4-style), benchmark decontamination
(GPT-3 appendix C) and deterministic stratified sampling.

All four are pure JVM-side column expressions or broadcast-joinable plans
(whole-stage codegen, no Python UDFs, no driver collects); each has an
exact ANSI-SQL counterpart in plans/oracles.py.  The reference pipeline
has no analogue for these — they are the operations a 100 TB training-data
run needs AROUND the knowledge-graph extraction (drop repetitive pages,
scrub contact strings, hold out eval overlap, downsample per language),
mandated as first-class by the build brief.

Scale notes per operator are on the docstrings; the common theme is that
everything per-document is a higher-order-function expression (zero
shuffle) and the only join (decontamination) broadcasts the eval side,
which is small by construction in every real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wikiprep_spark.operators.dedup import normalized_text
from wikiprep_spark.operators.textops import _hash60_sql


def _max_run_sql(sorted_arr: str) -> str:
    """Spark-SQL expression: length of the longest run of equal adjacent
    elements in a SORTED string array == the max multiplicity of any
    element.  Linear single pass (aggregate with (prev, run, best) state),
    so a 10k-line document costs O(n log n) for the sort + O(n) here —
    no per-row quadratic blowup at corpus scale."""
    step = (
        "named_struct('p', x, "
        "'r', IF(a.p IS NOT NULL AND x = a.p, a.r + 1L, 1L), "
        "'b', greatest(a.b, IF(a.p IS NOT NULL AND x = a.p, a.r + 1L, 1L)))"
    )
    return (
        f"aggregate({sorted_arr}, "
        "named_struct('p', CAST(NULL AS STRING), 'r', 0L, 'b', 0L), "
        f"(a, x) -> {step}, a -> a.b)"
    )


def _dup_line_sql(sorted_arr: str) -> str:
    """Spark-SQL expression over a SORTED string array returning
    named_struct(dl, dc): dl = number of elements whose value occurs more
    than once, dc = total characters those elements carry.  Same linear
    run-length pass as _max_run_sql (state: prev, run, dup_lines,
    dup_chars; a run longer than 1 contributes its whole length)."""
    dl_flush = "IF(a.r > 1L, a.dl + a.r, a.dl)"
    dc_flush = "IF(a.r > 1L, a.dc + a.r * length(a.p), a.dc)"
    step = (
        "IF(a.p IS NOT NULL AND x = a.p, "
        "named_struct('p', x, 'r', a.r + 1L, 'dl', a.dl, 'dc', a.dc), "
        f"named_struct('p', x, 'r', 1L, 'dl', {dl_flush}, "
        f"'dc', {dc_flush}))"
    )
    finish = f"named_struct('dl', {dl_flush}, 'dc', {dc_flush})"
    return (
        f"aggregate({sorted_arr}, "
        "named_struct('p', CAST(NULL AS STRING), 'r', 0L, "
        "'dl', 0L, 'dc', 0L), "
        f"(a, x) -> {step}, a -> {finish})"
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1):
    per document, the fraction of duplicate lines, the fraction of
    characters inside duplicate lines, and the fraction of tokens covered
    by the single most frequent word bigram / trigram.  Training-data
    pipelines drop documents above thresholds on these (boilerplate,
    scraper loops, keyword stuffing).

    Everything is a per-row higher-order-function expression — zero
    shuffle, survives any scale-up untouched; the only per-row cost is
    the O(n log n) array_sort of lines and n-grams."""
    lines = f"array_sort(split({text_col}, '\\n'))"
    dup = _dup_line_sql(lines)
    toks = "split(_rnorm, ' ')"

    def gram(n: int) -> str:
        joined = " || ' ' || ".join(f"_rtoks[i + {j}]" for j in range(n))
        grams = (f"transform(sequence(0, size(_rtoks) - {n}), "
                 f"i -> {joined})")
        run = _max_run_sql(f"array_sort({grams})")
        return (f"IF(size(_rtoks) >= {n}, "
                f"round(CAST({n} * {run} AS DOUBLE) / size(_rtoks), 6), "
                "CAST(0.0 AS DOUBLE))")

    return (
        docs.select(
            F.col(id_col),
            F.col(text_col),
            normalized_text(text_col).alias("_rnorm"),
        )
        .withColumn("_rtoks", F.expr(toks))
        .select(
            F.col(id_col),
            F.expr(f"size(split({text_col}, '\\n'))").cast("long")
            .alias("n_lines"),
            F.expr(
                f"round(CAST(({dup}).dl AS DOUBLE) / "
                f"size(split({text_col}, '\\n')), 6)"
            ).alias("dup_line_frac"),
            F.expr(
                f"round(CAST(({dup}).dc AS DOUBLE) / "
                f"greatest(aggregate(split({text_col}, '\\n'), 0L, "
                "(a, x) -> a + length(x)), 1L), 6)"
            ).alias("dup_line_char_frac"),
            F.expr(gram(2)).alias("top_bigram_frac"),
            F.expr(gram(3)).alias("top_trigram_frac"),
        )
    )


# RE2-safe (no lookaround, no backreferences) so Java regex (Spark) and
# RE2 (DuckDB) match identical spans.  Scrub order is fixed: emails, then
# IPv4, then phones — counts are taken on the text as it stands at that
# stage, so the three counts are well-defined regardless of overlap.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,3}-\d{3}-\d{3}-\d{4}"


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """C4-style contact-string scrubbing: redact emails, IPv4 addresses
    and international phone numbers with typed placeholders and report
    per-document match counts (the audit trail a compliance pass needs).

    Pure codegen (regexp_count + chained regexp_replace), zero shuffle;
    the patterns are RE2-safe so the DuckDB oracle reproduces the exact
    scrubbed text."""
    after_email = F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL)).cast("long")
        .alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_IPV4)).cast("long")
        .alias("n_ipv4"),
        F.regexp_count(after_ip, F.lit(PII_PHONE)).cast("long")
        .alias("n_phones"),
        scrubbed.alias("scrubbed_text"),
    )


def _gram_hashes(docs: DataFrame, id_col: str, text_col: str,
                 n: int) -> DataFrame:
    """(id, gram) rows: md5-60bit hashes of the distinct word n-grams of
    the normalized text (documents shorter than n tokens emit none)."""
    joined = " || ' ' || ".join(f"_dtoks[i + {j}]" for j in range(n))
    grams = (
        f"transform(sequence(0, size(_dtoks) - {n}), "
        f"i -> {_hash60_sql(joined)})"
    )
    return (
        docs.select(F.col(id_col),
                    F.split(normalized_text(text_col), " ").alias("_dtoks"))
        .where(F.expr(f"size(_dtoks) >= {n}"))
        .select(F.col(id_col),
                F.explode(F.array_distinct(F.expr(grams))).alias("gram"))
    )


def ngram_decontaminate(train: DataFrame, eval_docs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 5) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / PaLM style): flag
    every training document that shares at least one word ``n``-gram with
    the held-out evaluation set.  Output: one row per training document
    with the count of distinct shared n-grams and the contamination flag.

    Scale shape: the eval side is small by construction (benchmarks are
    thousands of documents against a 100 TB corpus), so its distinct gram
    hashes BROADCAST; the training side streams map-side through one
    broadcast semi-join + one groupBy(doc).  The n-gram hash is the
    cross-engine md5-60bit, so the DuckDB oracle reproduces the exact
    match set."""
    eval_grams = (
        _gram_hashes(eval_docs, id_col, text_col, n)
        .select("gram").distinct()
    )
    train_grams = _gram_hashes(train, id_col, text_col, n)
    hits = (
        train_grams.join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shared_ngrams", F.lit(0)).cast("long")
            .alias("n_shared_ngrams"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )


# deterministic per-language keep rates for the stratified-sampling query
# (English is over-represented in web corpora; the usual move is to
# downsample it while keeping low-resource languages whole)
SAMPLE_RATES = {"en": 0.5, "de": 0.8, "fr": 0.8, "es": 0.8}
SAMPLE_DEFAULT_RATE = 1.0
_BUCKETS = 10000


def sample_bucket_sql(id_expr: str, salt: str = "sample") -> str:
    """Spark-SQL expression for the deterministic sampling bucket in
    [0, 10000): fold the first 4 hex digits of md5(salt:id) — the same
    cross-engine construction as the 60-bit hash, shortened."""
    return (
        f"CAST(conv(substring(md5('{salt}:' || CAST({id_expr} AS STRING)),"
        f" 1, 4), 16, 10) AS BIGINT) % {_BUCKETS}"
    )


def stratified_sample(docs: DataFrame, rates: dict | None = None,
                      default_rate: float = SAMPLE_DEFAULT_RATE,
                      id_col: str = "doc_id",
                      strat_col: str = "lang") -> DataFrame:
    """Deterministic stratified downsampling: keep a document iff its
    md5-derived bucket falls under its stratum's keep rate.  Unlike
    ``df.sample`` this is reproducible across runs, engines and
    partitionings (the decision is a pure function of the id), which is
    what a 100 TB pipeline needs for resumable, auditable sampling.

    Zero shuffle, pure codegen; emits (id, stratum, bucket) for the kept
    rows so the decision is auditable."""
    rates = SAMPLE_RATES if rates is None else rates
    bucket = F.expr(sample_bucket_sql(id_col))
    thresh = F.lit(int(default_rate * _BUCKETS))
    for lang, rate in sorted(rates.items()):
        thresh = F.when(F.col(strat_col) == lang,
                        F.lit(int(rate * _BUCKETS))).otherwise(thresh)
    return (
        docs.select(F.col(id_col), F.col(strat_col),
                    bucket.alias("bucket"))
        .where(F.col("bucket") < thresh)
    )


# DSIR importance weighting (Xie et al., NeurIPS'23 "Data Selection for
# Language Models via Importance Resampling"): hashed-ngram bag features
DSIR_BUCKETS = 4096
DSIR_ADD_K = 1.0


def _dsir_feature_stream(docs: DataFrame, id_col: str, text_col: str,
                         buckets: int) -> DataFrame:
    """(id, b): one row per unigram AND bigram OCCURRENCE of the
    normalized text, md5-60bit-hashed into [0, buckets) — DSIR's
    bag-of-hashed-ngrams featurization.  Pure HOF expressions; the only
    thing that ever shuffles downstream is the 8-byte bucket id."""
    uni = f"transform(_dtoks, t -> {_hash60_sql('t')})"
    bi_join = "_dtoks[i] || ' ' || _dtoks[i + 1]"
    bi = (
        f"CASE WHEN size(_dtoks) >= 2 THEN "
        f"transform(sequence(0, size(_dtoks) - 2), i -> {_hash60_sql(bi_join)}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    feats = f"transform(concat({uni}, {bi}), h -> pmod(h, {buckets}))"
    return (
        docs.select(F.col(id_col),
                    F.split(normalized_text(text_col), " ").alias("_dtoks"))
        .select(F.col(id_col), F.explode(F.expr(feats)).alias("b"))
    )


def dsir_logweights(docs: DataFrame, target_docs: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    buckets: int = DSIR_BUCKETS,
                    k: float = DSIR_ADD_K) -> DataFrame:
    """DSIR data selection: score every document of ``docs`` by how much
    more likely its hashed-ngram features are under the TARGET corpus
    distribution than under the raw corpus's own —

        log w(d) = sum over d's features f of
                   ln p_target(bucket(f)) - ln p_source(bucket(f))

    with add-k smoothed bucket multinomials.  ``resample_score`` adds a
    deterministic Gumbel perturbation (from the md5 sampling bucket, the
    stratified_sample construction), so Gumbel-top-k on it IS importance
    resampling without replacement — reproducible across runs, engines
    and partitionings, unlike rand()-based sampling.

    Scale shape: both models are ``buckets``-row tables (two map-side-
    combining aggs over the feature streams); scoring is one broadcast
    join of that tiny table onto the exploded stream plus a per-doc agg —
    the fit-small / score-everything pattern, same as lm_perplexity.  The
    per-bucket log-ratio is materialized once on a complete bucket spine,
    so the scoring join never misses.  Output:
    (doc_id, n_feats, log_weight, resample_score), round(6) absorbing
    summation-order float drift exactly like the BM25/LM oracles."""
    spark = docs.sparkSession
    src = _dsir_feature_stream(docs, id_col, text_col, buckets)
    tgt = _dsir_feature_stream(target_docs, id_col, text_col, buckets)
    cs = src.groupBy("b").agg(F.count("*").cast("double").alias("cs"))
    ct = tgt.groupBy("b").agg(F.count("*").cast("double").alias("ct"))
    ns = src.agg(F.count("*").cast("double").alias("ns"))
    nt = tgt.agg(F.count("*").cast("double").alias("nt"))
    spine = spark.range(buckets).select(F.col("id").alias("b"))
    lam = (
        spine.join(ct, "b", "left").join(cs, "b", "left")
        .crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(ns))
        .select(
            "b",
            (
                F.log((F.coalesce("ct", F.lit(0.0)) + k)
                      / (F.col("nt") + k * buckets))
                - F.log((F.coalesce("cs", F.lit(0.0)) + k)
                        / (F.col("ns") + k * buckets))
            ).alias("lam"),
        )
    )
    gumbel_u = (
        (F.expr(sample_bucket_sql(id_col, salt="dsir")) + F.lit(0.5))
        / F.lit(float(_BUCKETS))
    )
    return (
        src.join(F.broadcast(lam), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("lam").alias("_lw"),
        )
        .select(
            F.col(id_col),
            "n_feats",
            F.round("_lw", 6).alias("log_weight"),
            F.round(F.col("_lw") - F.log(-F.log(gumbel_u)), 6)
              .alias("resample_score"),
        )
    )


def weighted_sample(docs: DataFrame, k: int = 100, id_col: str = "doc_id",
                    weight_col: str = "n_chars") -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis 2006:
    each item gets key u^(1/w) with u uniform in (0, 1]; the k largest
    keys ARE a weighted sample without replacement.  u derives from the
    md5 sampling bucket (deterministic across runs/engines/partitionings
    — same reproducibility contract as stratified_sample), so the sample
    is a pure function of the ids.

    Scale shape: a projection + orderBy().limit(k), which compiles to
    TakeOrderedAndProject — every task keeps a local top-k, the driver
    merges k rows; no global sort, no single-partition exchange.

    Output: (id, weight, es_key rounded 6, rank 1..k), deterministic
    tiebreak (key DESC, id ASC)."""
    from pyspark.sql import Window

    u = (
        (F.expr(sample_bucket_sql(id_col, salt="wsample")) + F.lit(0.5))
        / F.lit(float(_BUCKETS))
    )
    w = F.col(weight_col).cast("double")
    keyed = (
        docs.where(w > 0)
        .select(
            F.col(id_col),
            w.alias("weight"),
            F.pow(u, F.lit(1.0) / w).alias("_key"),
        )
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
    )
    win = Window.orderBy(F.desc("_key"), F.asc(id_col))
    return keyed.select(
        id_col, "weight",
        F.round("_key", 6).alias("es_key"),
        F.row_number().over(win).cast("long").alias("rank"),
    )
