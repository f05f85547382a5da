"""Deterministic synthetic wiki corpus over the ``documents`` table.

Builds the ``src_pages(repo, path, commit, lang, content)`` input table
(the BASELINE input-hint shape) from the driver-provided ``documents``
parquet: one article per document plus deterministic redirect, category,
template and disambiguation pages.  Every page's wiki markup follows closed-
form rules over ``doc_id``, so the knowledge-graph edges the pipeline must
emit are analytically derivable — the DuckDB oracle SQL in
wikiprep_spark/plans/oracles.py computes the exact expected edge sets from
``documents`` alone, giving the full markup pipeline an end-to-end
correctness gate.

Page-id layout (N = number of documents, i = doc_id):
  articles     1000 + i                    title "Doc {i}"
  redirects    1000 + N + i   (i%5==0)     "Redirect {i}" -> "Doc {i}"
  double       1000 + 2N                   "Double 0" -> "Redirect 0"
  disambig     1000 + 3N + i  (i%50==0)    "Doc {i} (disambiguation)"
  categories   100+k (topics), 110 (Even4), 120 (Topics root)
  templates    11 Infobox, 12 Stub, 13 Asof, 14 Ibox(redirect)

Article links (j* formulas shared with the oracle):
  j1 = (7i+1)%N, j2 = (13i+3)%N (aliased), j3 = (3i+7)%N (See also, i%3==0)
  jr = 5*((11i+2) % max(N//5,1)) via [[Redirect jr]]
Skew: every article transcludes the Infobox template (hub key, the
"cite web" analogue) — even ids directly, odd ids through the Template:Ibox
redirect.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from wikiprep_spark.sources.mediawiki_xml import make_page_xml

REPO = "wiki/synthetic"

TEMPLATE_PAGES = [
    (11, "Template:Infobox",
     "<includeonly>Info: {{{name|anon}}} ({{ucfirst:{{{cat|}}}}}) number "
     "{{#if:{{{num|}}}|N{{{num}}}|unknown}}.</includeonly>"
     "<noinclude>Template documentation.</noinclude>"),
    (12, "Template:Stub", "This article is a stub{{asof}}."),
    (13, "Template:Asof", " (as of 2008)"),
    (14, "Template:Ibox", "#REDIRECT [[Template:Infobox]]"),
]

CATEGORY_PAGES = (
    [(100 + k, "Category:Topic %d" % k,
      "Articles about topic %d.\n[[Category:Topics]]" % k)
     for k in range(10)]
    + [(110, "Category:Even4", "Multiples of four.\n[[Category:Topics]]"),
       (120, "Category:Topics", "Root category.")]
)


def article_text(i: int, n: int, lang: str, body: str) -> str:
    """The wiki markup of article i — keep in sync with plans/oracles.py."""
    mm = max(n // 5, 1)
    j1 = (7 * i + 1) % n
    j2 = (13 * i + 3) % n
    j3 = (3 * i + 7) % n
    jr = 5 * ((11 * i + 2) % mm)
    tmpl = "infobox" if i % 2 == 0 else "ibox"
    lines = [
        "'''Doc %d''' is a synthetic article about %s." % (i, lang),
        "{{%s|name=Doc %d|num=%d|cat=topic %d}}" % (tmpl, i, i, i % 10),
        "",
        body,
        "",
        "It links to [[Doc %d]] and [[Doc %d|alias %d]]." % (j1, j2, i),
        "Via redirect: [[Redirect %d]]." % jr,
    ]
    if i % 25 == 0:
        lines.append("A dead link: [[Double 0]].")
    if i % 6 == 0:
        lines.append(
            "Website: [http://example.org/doc/%d homepage %d] plus bare "
            "http://data.example.com/%d now." % (i, i, i)
        )
    if i % 8 == 0:
        lines.append("See [[Memoryalpha:Doc %d]] too." % i)
    if i % 9 == 0:
        lines.append("Born on [[%d-%d]]." % (i % 12 + 1, i % 28 + 1))
    if i % 3 == 0:
        lines.append("== See also ==")
        lines.append("* [[Doc %d]]" % j3)
    lines.append("")
    cat = "[[Category:Topic %d]]" % (i % 10)
    if i % 4 == 0:
        cat += " [[Category:Even4]]"
    if i % 7 == 0:
        cat += " {{stub}}"
    lines.append(cat)
    return "\n".join(lines)


def disambig_text(i: int, n: int) -> str:
    return (
        "{{dab}}\n* [[Doc %d]] is an article\n* [[Doc %d]] is another"
        % (i, (i + 3) % n)
    )


def _row(page_id: int, title: str, text: str, lang: str = "wikitext"):
    path = "%010d.xml" % page_id
    commit = hashlib.sha1(("%s/%s" % (REPO, path)).encode()).hexdigest()
    content = make_page_xml(page_id, title, text)
    return (REPO, path, commit, lang, content)


def static_rows():
    rows = [_row(pid, title, text) for pid, title, text in TEMPLATE_PAGES]
    rows += [_row(pid, title, text) for pid, title, text in CATEGORY_PAGES]
    return rows


def build_src_pages(
    spark: SparkSession, sf_dir: str, replicate: int = 1,
    limit: int | None = None,
) -> DataFrame:
    """documents.parquet -> src_pages DataFrame.

    ``replicate`` scales the corpus for benchmarking: document i of replica r
    becomes doc index i + r*N (the link formulas then span the full range).
    ``limit`` keeps only doc_id < limit (fast unit tests).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    if limit is not None:
        docs = docs.where(docs.doc_id < limit)
    n_docs = docs.count()
    # documents.parquet is a single small file -> one scan partition; spread
    # the python-heavy downstream (XML synthesis, parse, transform) across
    # the cluster.  Partition count is sized by DATA (~4k pages / a few
    # seconds of python work per task), not by cluster size, so the task
    # graph is identical at every parallelism level and scaling runs
    # compare like with like.
    total_pages = n_docs * max(1, replicate)
    n_parts = max(2, min(512, total_pages // 4096 or 1))
    docs = docs.repartition(n_parts)
    n = n_docs * replicate

    schema = "repo string, path string, commit string, lang string, content string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, lang, body, rep in zip(
                batch["doc_id"], batch["lang"], batch["text"], batch["rep"]
            ):
                i = int(doc_id) + int(rep) * n_docs
                rows.append(_row(1000 + i, "Doc %d" % i,
                                 article_text(i, n, lang, body), lang))
                if i % 5 == 0:
                    rows.append(_row(1000 + n + i, "Redirect %d" % i,
                                     "#REDIRECT [[Doc %d]]" % i))
                if i == 0:
                    rows.append(_row(1000 + 2 * n, "Double 0",
                                     "#REDIRECT [[Redirect 0]]"))
                if i % 50 == 0:
                    rows.append(_row(1000 + 3 * n + i,
                                     "Doc %d (disambiguation)" % i,
                                     disambig_text(i, n)))
            yield pd.DataFrame(rows, columns=["repo", "path", "commit",
                                              "lang", "content"])

    from pyspark.sql import functions as F

    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    replicated = docs.crossJoin(reps)
    pages = replicated.mapInPandas(gen, schema=schema)

    static = spark.createDataFrame(static_rows(), schema=schema)
    return pages.unionByName(static)


# the driver testdata's documents vocabulary (TESTDATA.md; 31 words) — the
# synthesizer below reproduces its distribution so operators tuned on the
# sf ladder behave identically on synthesized scale-up corpora
_DOC_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()


def synth_documents(spark: SparkSession, n_docs: int,
                    dup_every: int = 200, seed: int = 7) -> DataFrame:
    """Deterministic DISTINCT-document synthesizer at arbitrary scale in
    the driver testdata's ``documents`` distribution (31-word vocabulary,
    10-100 words/doc, 5 langs at ~40% en, 20 sources).  Every
    ``dup_every``-th doc is a planted near-duplicate of its predecessor
    (one word substituted), so near-dup operators see a real, sparse
    signal at every scale — REPLICATING the corpus instead manufactures
    degenerate all-identical clusters and quadratic pair output, a
    different workload entirely.

    Pure JVM codegen (spark.range + hash-seeded higher-order functions):
    no python rows, no shuffle, no driver loop — synthesizing 10^9 docs
    is embarrassingly parallel, which is what makes the >10x data-scale
    measurements in tools_scale10.py possible.
    """
    from pyspark.sql import functions as F

    vocab = "array(" + ",".join("'%s'" % w for w in _DOC_VOCAB) + ")"
    langs = ("array(" + ",".join(
        "'%s'" % l for l in ["en"] * 8 + ["zh"] * 3 + ["es"] * 3
        + ["fr"] * 3 + ["de"] * 3) + ")")
    df = (
        spark.range(n_docs).select(F.col("id").alias("doc_id"))
        .withColumn(
            "is_dup",
            (F.col("doc_id") % dup_every == dup_every - 1)
            & (F.col("doc_id") > 0))
        .withColumn(
            "base",
            F.when(F.col("is_dup"), F.col("doc_id") - 1)
            .otherwise(F.col("doc_id")))
        .withColumn(
            "n_words",
            F.expr(f"cast(pmod(xxhash64('n', base, {seed}), 91) as int)"
                   " + 10"))
        .withColumn(
            "words",
            F.expr(
                f"transform(sequence(1, n_words), i -> element_at({vocab},"
                f" cast(pmod(xxhash64('w', base, i, {seed}), 31) as int)"
                " + 1))"))
        # the planted near-dup substitutes ONE position of its base's word
        # stream (may coincide with the original word ~1/31 of the time,
        # which plants an exact duplicate — also a case dedup must handle)
        .withColumn(
            "words",
            F.expr(
                "transform(words, (w, i) -> if(is_dup AND i + 1 = "
                f"cast(pmod(xxhash64('m', doc_id, {seed}), n_words) as int)"
                f" + 1, element_at({vocab},"
                f" cast(pmod(xxhash64('x', doc_id, {seed}), 31) as int)"
                " + 1), w))"))
    )
    return df.select(
        "doc_id",
        F.array_join("words", " ").alias("text"),
        F.expr(f"element_at({langs},"
               f" cast(pmod(xxhash64('l', doc_id, {seed}), 20) as int)"
               " + 1)").alias("lang"),
        F.concat(
            F.lit("src"),
            F.expr(f"cast(pmod(xxhash64('s', doc_id, {seed}), 20) as int)")
        ).alias("source"),
        F.length(F.array_join("words", " ")).cast("long").alias("n_chars"),
    )
