"""Distributed per-page transform (pipeline pass 2).

One Arrow-batched mapInPandas over the parsed pages: each row runs the full
transformOne chain (functions/page.py) against the broadcast dictionaries
and emits a wide row carrying the rewritten text plus every extracted
collection as nested arrays.  Edge tables are exploded from this table in
operators/edges.py — the expensive markup work happens exactly once per
page.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from wikiprep_spark.functions.edges import (
    disambig_rows,
    template_inclusion_rows,
)
from wikiprep_spark.functions.page import TransformEnv, transform_one

TRANSFORMED_SCHEMA = (
    "page_id long, title string, ns string, timestamp string, status string, "
    "org_length long, new_length long, "
    "is_stub int, is_disambig int, is_category int, is_image int, "
    "text string, "
    "anchors array<struct<target_id:bigint, loc:bigint, anchor:string>>, "
    "categories array<bigint>, "
    "interwiki array<struct<iw_ns:string, iw_title:string>>, "
    "external array<struct<url:string, anchor:string>>, "
    "bare_urls array<string>, "
    "related array<bigint>, "
    "disambig array<struct<line_no:int, pos:int, target_id:bigint, anchor:string>>, "
    "template_incl array<struct<template_id:bigint, incl_idx:int, param:string, value:string>>, "
    "content_sha256 string"
)

_COLUMNS = [
    "page_id", "title", "ns", "timestamp", "status", "org_length",
    "new_length", "is_stub", "is_disambig", "is_category", "is_image",
    "text", "anchors", "categories", "interwiki", "external", "bare_urls",
    "related", "disambig", "template_incl", "content_sha256",
]


def _row_from_page(src, page) -> tuple:
    if "text" not in page:
        status = "redirect" if src["redirect_target"] is not None else "skipped"
        return (
            src["page_id"], src["title_norm"], src["ns"], src["timestamp"],
            status, page["orgLength"], None, None, None, None, None,
            None, None, None, None, None, None, None, None, None,
            src["content_sha256"],
        )
    anchors = [
        (a.get("targetId"), a["linkLocation"], a["anchorText"])
        for a in page["wikiLinks"]
        if "targetId" in a
    ]
    interwiki = list(page["interwiki"])
    external = [(l["url"], l.get("anchor")) for l in page["externalLinks"]]
    disambig = [
        (line_no, pos, target_id, anchor)
        for (_pid, line_no, pos, target_id, anchor) in disambig_rows(page)
    ]
    template_incl = [
        (tid, idx, param, value)
        for (_pid, tid, idx, param, value) in template_inclusion_rows(page)
    ]
    return (
        page["id"], page["title"], src["ns"], page.get("timestamp"),
        "ok", page["orgLength"], page["newLength"],
        page["isStub"], page["isDisambig"], page["isCategory"],
        page["isImage"], page["text"],
        anchors, list(page["categories"]), interwiki, external,
        list(page["bareUrls"]), list(page["relatedArticles"]), disambig,
        template_incl, src["content_sha256"],
    )


def transform_pages(parsed: DataFrame, env_broadcast) -> DataFrame:
    """parsed pages + broadcast (title2id, redir, templates) -> wide rows.

    ``env_broadcast`` is a SparkContext broadcast of the
    (title2id, redir, templates) dict triple.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t2i, red, bodies = env_broadcast.value
        env = TransformEnv(title2id=t2i, redir=red, templates=bodies)
        for batch in batches:
            if not len(batch):
                continue
            rows = []
            for src in batch.to_dict("records"):
                if src["parse_error"] is not None or src["page_id"] is None:
                    continue
                mwpage = {
                    "id": src["page_id"],
                    "title": src["title"],
                    "text": src["text"],
                    "timestamp": src["timestamp"],
                }
                page = transform_one(mwpage, env)
                rows.append(_row_from_page(src, page))
            yield pd.DataFrame(rows, columns=_COLUMNS)

    return parsed.mapInPandas(gen, schema=TRANSFORMED_SCHEMA)
