"""Distributed prescan (pipeline pass 1).

Builds the cross-page dictionaries — title2id, redirects, template bodies,
template index — as DataFrames with the exact sequential semantics of the
reference prescan (first-page-wins per id, first-page-wins per title,
last-redirect-wins, redirect-vs-title ordering; see
wikiprep_spark/functions/prescan.py for the semantic oracle and the cited
reference lines).

Scale notes: every dedup here is expressed as a min/max aggregation over a
SKINNY projection (seq/id/title only — parquet column pruning keeps the page
text out of these shuffles) followed by a semi/equi join back.  No global
windows, no single-partition stages.  The dictionaries are then collected
and broadcast for the transform stage — the Spark equivalent of the
reference's read-only BerkeleyDB tables shared across workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wikiprep_spark.functions.templates import preprocess_template_body


def live_pages(parsed: DataFrame) -> DataFrame:
    """First page wins per id over ALL pages, in dump (seq) order
    (bin/wikiprep:466-470). Returns parsed rows minus losers."""
    winners = (
        parsed.where(F.col("page_id").isNotNull())
        .groupBy("page_id")
        .agg(F.min("seq").alias("seq"))
    )
    return parsed.join(winners, ["page_id", "seq"], "leftsemi")


def _prescan_candidates(live: DataFrame) -> DataFrame:
    """Pages that reach Link::prescan's interesting part: ok namespace and
    non-empty normalized title (Link.pm:35-48)."""
    return live.where(
        F.col("ns_ok_prescan") & (F.length("title_norm") > 0)
    )


def title_claims(live: DataFrame) -> DataFrame:
    """(title_norm, claim_seq) — the seq of the first NON-redirect ok page
    per normalized title; only these claim title2id (Link.pm:53-73).
    A redirect with an empty normalized target counts as non-redirect here
    but claims no title (Link.pm:66): excluded from claims too."""
    return (
        _prescan_candidates(live)
        .where(F.col("redirect_target").isNull())
        .groupBy("title_norm")
        .agg(F.min("seq").alias("claim_seq"))
    )


def title2id_df(live: DataFrame, claims: DataFrame | None = None) -> DataFrame:
    """(title_norm, page_id): the winning non-redirect page per title."""
    claims = claims if claims is not None else title_claims(live)
    return (
        _prescan_candidates(live)
        .where(F.col("redirect_target").isNull())
        .join(
            claims.withColumnRenamed("claim_seq", "seq"),
            ["title_norm", "seq"],
            "leftsemi",
        )
        .select("title_norm", "page_id")
    )


def redirects_df(live: DataFrame, claims: DataFrame | None = None) -> DataFrame:
    """(from_title, to_title, from_page_id): the redirect map.

    A redirect is dropped when an earlier non-redirect page already claimed
    its title (the exists-check at Link.pm:53 runs BEFORE redirect parsing);
    among surviving redirects for a title the LAST one wins (unconditional
    assignment at Link.pm:67)."""
    claims = claims if claims is not None else title_claims(live)
    cand = (
        _prescan_candidates(live)
        .where(
            F.col("redirect_target").isNotNull()
            & (F.length("redirect_target") > 0)
        )
        .join(claims, "title_norm", "left")
        .where(F.col("claim_seq").isNull() | (F.col("claim_seq") > F.col("seq")))
    )
    last = cand.groupBy("title_norm").agg(F.max("seq").alias("seq"))
    return (
        cand.join(last, ["title_norm", "seq"], "leftsemi")
        .select(
            F.col("title_norm").alias("from_title"),
            F.col("redirect_target").alias("to_title"),
            F.col("page_id").alias("from_page_id"),
        )
    )


def template_pages_df(live: DataFrame, claims: DataFrame | None = None) -> DataFrame:
    """Template-namespace pages that pass Templates::prescan's gate: the
    Link::prescan call returned true — non-redirect (or redirect with empty
    normalized target) and not shadowed by an earlier same-title page."""
    claims = claims if claims is not None else title_claims(live)
    return (
        _prescan_candidates(live)
        .where(F.col("is_template"))
        .where(
            F.col("redirect_target").isNull()
            | (F.length("redirect_target") == 0)
        )
        .join(claims, "title_norm", "left")
        .where(F.col("claim_seq").isNull() | (F.col("claim_seq") >= F.col("seq")))
        .drop("claim_seq")
    )


_preprocess_body_udf = F.udf(lambda t: preprocess_template_body(t or ""))


def template_bodies_df(template_pages: DataFrame) -> DataFrame:
    """(template_id, title_norm, body): preprocessed bodies
    (Templates.pm:41-86)."""
    return template_pages.select(
        F.col("page_id").alias("template_id"),
        "title_norm",
        _preprocess_body_udf(F.col("text")).alias("body"),
    )


def collect_env(title2id: DataFrame, redirects: DataFrame,
                template_bodies: DataFrame):
    """Collect the three dictionary DataFrames into plain dicts for
    broadcasting into the transform UDF (the reference's prescanSave /
    prescanLoad boundary, bin/wikiprep:482-512).

    Collected as ONE tagged union so the shared upstream (parsed pages,
    live-page winners, title claims) is computed in a single job."""
    tagged = (
        title2id.select(
            F.lit("t").alias("kind"),
            F.col("title_norm").alias("k"),
            F.col("page_id").cast("string").alias("v"),
        )
        .unionByName(
            redirects.select(
                F.lit("r").alias("kind"),
                F.col("from_title").alias("k"),
                F.col("to_title").alias("v"),
            )
        )
        .unionByName(
            template_bodies.select(
                F.lit("b").alias("kind"),
                F.col("template_id").cast("string").alias("k"),
                F.col("body").alias("v"),
            )
        )
    )
    t2i: dict = {}
    red: dict = {}
    bodies: dict = {}
    for row in tagged.collect():
        if row["kind"] == "t":
            t2i[row["k"]] = int(row["v"])
        elif row["kind"] == "r":
            red[row["k"]] = row["v"]
        else:
            bodies[int(row["k"])] = row["v"]
    return t2i, red, bodies


def redirect_records_df(redirects: DataFrame, title2id: DataFrame,
                        template_bodies: DataFrame):
    """The redirect output join (Output/Composite.pm:83-125): resolve both
    endpoints ('unknown' when missing), drop redirects FROM templates, split
    off redirects TO templates as template-index entries.

    Returns (redirect_records, template_redirect_records).  Both joins are
    broadcast-able: title2id and the template list are the dimension side.
    """
    tmpl_ids = template_bodies.select(
        F.col("template_id").alias("_tmpl_id")
    ).distinct()

    t2i_from = title2id.select(
        F.col("title_norm").alias("from_title"),
        F.col("page_id").alias("_from_id"),
    )
    t2i_to = title2id.select(
        F.col("title_norm").alias("to_title"),
        F.col("page_id").alias("_to_id"),
    )
    resolved = (
        redirects.join(F.broadcast(t2i_from), "from_title", "left")
        .join(F.broadcast(t2i_to), "to_title", "left")
        .join(
            F.broadcast(tmpl_ids),
            F.col("_from_id") == F.col("_tmpl_id"),
            "left_anti",
        )
        .join(
            F.broadcast(tmpl_ids.withColumnRenamed("_tmpl_id", "_tmpl_to")),
            F.col("_to_id") == F.col("_tmpl_to"),
            "left",
        )
    )
    redirect_records = resolved.where(F.col("_tmpl_to").isNull()).select(
        F.coalesce(F.col("_from_id").cast("string"), F.lit("unknown")).alias("from_id"),
        "from_title",
        F.coalesce(F.col("_to_id").cast("string"), F.lit("unknown")).alias("to_id"),
        "to_title",
    )
    template_redirects = resolved.where(F.col("_tmpl_to").isNotNull()).select(
        F.col("_to_id").alias("template_id"),
        F.col("from_title").alias("alias_title"),
    )
    return redirect_records, template_redirects
