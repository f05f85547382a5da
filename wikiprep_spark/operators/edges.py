"""Edge/triple materialization from the wide transformed-pages table.

Declarative explodes + column expressions only — Catalyst prunes the wide
table down to the columns each edge table needs, so producing one edge kind
never pays for the others.  Writer-level text transforms follow the
reference output writers (see functions/edges.py for the cited lines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def _ok():
    return F.col("status") == "ok"


def anchors_edges(transformed: DataFrame) -> DataFrame:
    """(target_id, source_id, loc, anchor_text): resolved, non-self anchors;
    newlines -> spaces, trimmed (Output/Legacy.pm:151-174)."""
    a = transformed.where(_ok()).select(
        F.col("page_id").alias("source_id"),
        F.explode("anchors").alias("a"),
    )
    return a.select(
        F.col("a.target_id").alias("target_id"),
        "source_id",
        F.col("a.loc").alias("loc"),
        F.trim(F.regexp_replace(F.col("a.anchor"), "\n", " ")).alias(
            "anchor_text"
        ),
    ).where(F.col("target_id") != F.col("source_id"))


def links_edges(transformed: DataFrame) -> DataFrame:
    """(source_id, target_id) distinct, self-free."""
    a = transformed.where(_ok()).select(
        F.col("page_id").alias("source_id"),
        F.explode("anchors").alias("a"),
    )
    return (
        a.select("source_id", F.col("a.target_id").alias("target_id"))
        .where(F.col("target_id") != F.col("source_id"))
        .distinct()
    )


def categories_edges(transformed: DataFrame) -> DataFrame:
    """(page_id, pos, category_id), order-preserving."""
    return transformed.where(_ok()).select(
        "page_id", F.posexplode("categories").alias("pos", "category_id")
    )


def related_edges(transformed: DataFrame) -> DataFrame:
    return transformed.where(_ok()).select(
        "page_id", F.posexplode("related").alias("pos", "related_id")
    )


def interwiki_edges(transformed: DataFrame) -> DataFrame:
    return transformed.where(_ok()).select(
        "page_id", F.explode("interwiki").alias("iw")
    ).select(
        "page_id",
        F.col("iw.iw_ns").alias("namespace"),
        F.col("iw.iw_title").alias("title"),
    )


def external_edges(transformed: DataFrame) -> DataFrame:
    """(source_id, url, anchor): one row per external link struct (anchor
    nullable — the legacy external_anchors file keeps only anchored rows)."""
    return transformed.where(_ok()).select(
        F.col("page_id").alias("source_id"), F.explode("external").alias("e")
    ).select(
        "source_id",
        F.col("e.url").alias("url"),
        F.col("e.anchor").alias("anchor"),
    )


def bare_urls_edges(transformed: DataFrame) -> DataFrame:
    return transformed.where(_ok()).select(
        "page_id", F.posexplode("bare_urls").alias("pos", "url")
    )


def disambig_edges(transformed: DataFrame) -> DataFrame:
    """(disambig_id, line_no, pos, target_id, anchor_text), tabs -> spaces;
    one (line_no, null, null, null) row marks a link-free list line."""
    d = transformed.where(_ok() & (F.col("is_disambig") == 1)).select(
        F.col("page_id").alias("disambig_id"),
        F.explode("disambig").alias("d"),
    )
    return d.select(
        "disambig_id",
        F.col("d.line_no").alias("line_no"),
        F.col("d.pos").alias("pos"),
        F.col("d.target_id").alias("target_id"),
        F.regexp_replace(F.col("d.anchor"), "\t", " ").alias("anchor_text"),
    )


def template_inclusion_edges(transformed: DataFrame) -> DataFrame:
    """(page_id, template_id, incl_idx, param, value); values had newlines
    replaced already; params starting with '=' were dropped in the kernel."""
    t = transformed.where(_ok()).select(
        "page_id", F.explode("template_incl").alias("t")
    )
    return t.select(
        "page_id",
        F.col("t.template_id").alias("template_id"),
        F.col("t.incl_idx").alias("incl_idx"),
        F.col("t.param").alias("param"),
        F.col("t.value").alias("value"),
    )


def write_template_inclusions_partitioned(
    inclusions: DataFrame, path: str, salt_buckets: int = 16,
    num_partitions: int | None = None,
) -> None:
    """Materialize the inclusion log partitioned by template_id — the
    reference's per-template-id files (Output/Legacy.pm:195-214) as a
    partition-pruned parquet layout.

    Hub templates (the {{cite web}} analogue) dominate the log, so rows are
    redistributed on (template_id, salt) before the write: a hub template's
    rows land on ``salt_buckets`` tasks instead of one straggler, and each
    writes its own file under the template's partition directory."""
    salted = inclusions.withColumn(
        "_salt", F.pmod(F.xxhash64("page_id", "incl_idx"),
                        F.lit(salt_buckets))
    )
    # explicit num_partitions pins the fan-out (AQE would otherwise
    # coalesce a small shuffle back into few tasks); default lets AQE size
    # partitions by bytes, which is what you want at production scale
    keys = [F.col("template_id"), F.col("_salt")]
    shuffled = (
        salted.repartition(num_partitions, *keys) if num_partitions
        else salted.repartition(*keys)
    )
    (
        shuffled
        .drop("_salt")
        .write.mode("overwrite")
        .partitionBy("template_id")
        .parquet(path)
    )


def pages_table(transformed: DataFrame) -> DataFrame:
    """The per-page record (Composite.pm:149-205 equivalent)."""
    return transformed.where(_ok()).select(
        "page_id", "title", "ns", "timestamp", "org_length", "new_length",
        "is_stub", "is_disambig", "is_category", "is_image",
        "categories", "related", "text", "content_sha256",
    )


PRED_TABLES = {
    "links_to": ("links", "source_id", "target_id"),
    "anchored_by": ("anchors", "target_id", "source_id"),
    "in_category": ("categories", "page_id", "category_id"),
    "related_to": ("related", "page_id", "related_id"),
}


def triples_from_transformed(transformed: DataFrame,
                             redirect_records: DataFrame) -> DataFrame:
    """The unified (subj, pred, obj, prop) stream derived in ONE scan of the
    wide table: per row, every edge kind is packed into a single
    array<struct> with higher-order functions and exploded once — versus
    eight separate scans for the per-kind edge tables.  Semantically
    identical to triples_view over the individual edge tables (tested);
    at scale this is the difference between one and eight passes over the
    transformed corpus."""
    pid = F.col("page_id").cast("string")

    def s(subj, pred, obj, prop):
        return F.struct(
            subj.cast("string").alias("subj"),
            F.lit(pred).alias("pred"),
            obj.cast("string").alias("obj"),
            prop.cast("string").alias("prop"),
        )

    nul = F.lit(None).cast("string")
    non_self = F.filter(
        "anchors", lambda a: a["target_id"] != F.col("page_id")
    )
    combined = F.concat(
        # links_to: distinct non-self anchor targets of the page
        F.transform(
            F.array_distinct(
                F.transform(non_self, lambda a: a["target_id"])
            ),
            lambda t: s(pid, "links_to", t, nul),
        ),
        # anchored_by: newline->space + trim on the anchor text
        F.transform(
            non_self,
            lambda a: s(
                a["target_id"], "anchored_by", pid,
                F.trim(F.regexp_replace(a["anchor"], "\n", " ")),
            ),
        ),
        F.transform("categories",
                    lambda c: s(pid, "in_category", c, nul)),
        F.transform("related", lambda r: s(pid, "related_to", r, nul)),
        F.transform(
            "disambig",
            lambda d: s(pid, "disambiguates", d["target_id"],
                        F.regexp_replace(d["anchor"], "\t", " ")),
        ),
        F.transform("external",
                    lambda e: s(pid, "links_external", e["url"],
                                e["anchor"])),
        F.transform(
            "template_incl",
            lambda t: s(pid, "includes_template", t["template_id"],
                        t["param"]),
        ),
    )
    page_triples = (
        transformed.where(_ok())
        .select(F.explode(combined).alias("t"))
        .select("t.subj", "t.pred", "t.obj", "t.prop")
    )
    redirect_triples = redirect_records.select(
        F.col("from_id").alias("subj"),
        F.lit("redirects_to").alias("pred"),
        F.col("to_id").alias("obj"),
        F.col("to_title").alias("prop"),
    )
    return page_triples.unionByName(redirect_triples)


def triples_view(
    links: DataFrame,
    anchors: DataFrame,
    categories: DataFrame,
    redirects: DataFrame,
    related: DataFrame,
    disambig: DataFrame,
    external: DataFrame,
    template_incl: DataFrame,
) -> DataFrame:
    """Unified (subj, pred, obj, prop) triple stream over all edge tables —
    the P/R comparison surface (FIXTURES.md §4)."""
    def t(df, subj, pred, obj, prop=None):
        return df.select(
            F.col(subj).cast("string").alias("subj"),
            F.lit(pred).alias("pred"),
            F.col(obj).cast("string").alias("obj"),
            (F.col(prop) if prop else F.lit(None)).cast("string").alias("prop"),
        )

    return (
        t(links, "source_id", "links_to", "target_id")
        .unionByName(t(anchors, "target_id", "anchored_by", "source_id",
                       "anchor_text"))
        .unionByName(t(categories, "page_id", "in_category", "category_id"))
        .unionByName(t(redirects, "from_id", "redirects_to", "to_id",
                       "to_title"))
        .unionByName(t(related, "page_id", "related_to", "related_id"))
        .unionByName(t(disambig, "disambig_id", "disambiguates", "target_id",
                       "anchor_text"))
        .unionByName(t(external, "source_id", "links_external", "url",
                       "anchor"))
        .unionByName(t(template_incl, "page_id", "includes_template",
                       "template_id", "param"))
    )
