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


_INPUT_COLUMNS = [
    "page_id", "title", "title_norm", "ns", "timestamp", "text",
    "content_sha256", "redirect_target", "parse_error",
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


def transform_pages(parsed: DataFrame, env_source) -> DataFrame:
    """parsed pages + the prescan dictionaries -> wide rows.

    ``env_source`` is either a SparkContext broadcast of the
    (title2id, redir, templates) triple, or a string path to the tagged
    dictionary parquet (workers side-load it once per process via
    functions/dictload.py — the prescanLoad equivalent).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if isinstance(env_source, str):
            import os as _os

            from wikiprep_spark.functions import dictload

            if _os.path.isdir(_os.path.join(env_source, "title2id")):
                # pruned layout (write_dicts_pruned): bounded-memory
                # row-group lookups instead of full materialization
                t2i, red, bodies = dictload.load_env_pruned(env_source)
            else:
                t2i, red, bodies = dictload.load_env_from_parquet(env_source)
        else:
            t2i, red, bodies = env_source.value
        env = TransformEnv(title2id=t2i, redir=red, templates=bodies)
        for batch in batches:
            if not len(batch):
                continue
            rows = []
            # column-wise zip (to_dict('records') costs more than the
            # transform itself at this batch size)
            cols = [batch[c] for c in _INPUT_COLUMNS]
            for (page_id, title, title_norm, ns, timestamp, text, sha,
                 redirect_target, parse_error) in zip(*cols):
                if parse_error is not None or page_id is None:
                    continue
                mwpage = {
                    "id": page_id,
                    "title": title,
                    "text": text,
                    "timestamp": timestamp,
                }
                page = transform_one(mwpage, env)
                src = {
                    "page_id": page_id, "title_norm": title_norm, "ns": ns,
                    "timestamp": timestamp, "content_sha256": sha,
                    "redirect_target": redirect_target,
                }
                rows.append(_row_from_page(src, page))
            yield pd.DataFrame(rows, columns=_COLUMNS)

    # mapInPandas feeds whole rows to python — prune to what the kernel
    # needs before crossing the Arrow boundary
    return parsed.select(*_INPUT_COLUMNS).mapInPandas(
        gen, schema=TRANSFORMED_SCHEMA
    )
