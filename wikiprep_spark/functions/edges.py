"""Edge/triple row materialization from a transformed page.

Pure kernels shared by the golden tests and the Spark edge operators.
Row shapes follow the reference's output writers
(``/root/reference/lib/Wikiprep/Output/Legacy.pm`` /
``Output/Composite.pm``), including their text transforms:
anchor rows replace newlines with spaces and trim; disambig rows replace
tabs; self-links are dropped from anchors and the links list.
"""

from __future__ import annotations

import re

from wikiprep_spark.functions.related import (
    get_link_ids,
    remove_duplicates_and_self,
)

_NL_RE = re.compile(r"\n")


def anchor_rows(page):
    """(target_id, source_id, loc, anchor_text) — Legacy.pm:151-174.
    Only resolved, non-self links; newlines -> spaces; trimmed."""
    rows = []
    for a in page.get("wikiLinks", ()):
        target_id = a.get("targetId")
        if target_id is None or target_id == page["id"]:
            continue
        text = _NL_RE.sub(" ", a["anchorText"]).strip()
        rows.append((target_id, page["id"], a["linkLocation"], text))
    return rows


def link_rows(page):
    """(source_id, target_id) distinct, self-free — Legacy.pm:224-226."""
    ids = remove_duplicates_and_self(
        get_link_ids(page.get("wikiLinks", ())), page["id"]
    )
    return [(page["id"], t) for t in ids]


def category_rows(page):
    """(page_id, category_id), order-preserving (already deduped/self-free
    by transform_one)."""
    return [(page["id"], c) for c in page.get("categories", ())]


def related_rows(page):
    """(page_id, related_id) — Legacy.pm:269-278."""
    return [(page["id"], r) for r in page.get("relatedArticles", ())]


def external_rows(page):
    """(source_id, url, anchor_or_None) — one row per external link struct;
    the legacy external_anchors file keeps only rows with an anchor."""
    return [
        (page["id"], l["url"], l.get("anchor"))
        for l in page.get("externalLinks", ())
    ]


def bare_url_rows(page):
    """(page_id, url) — the deduped <urls> list of the page record."""
    return [(page["id"], u) for u in page.get("bareUrls", ())]


def interwiki_rows(page):
    """(page_id, namespace, title)."""
    return [(page["id"], ns, t) for ns, t in page.get("interwiki", ())]


def disambig_rows(page):
    """(disambig_id, line_no, pos, target_id_or_None, anchor_text) —
    Legacy.pm:280-305 with tabs replaced by spaces."""
    rows = []
    for line_no, group in enumerate(page.get("disambigLinks", ())):
        for pos, a in enumerate(group):
            rows.append(
                (
                    page["id"],
                    line_no,
                    pos,
                    a.get("targetId"),
                    a["anchorText"].replace("\t", " "),
                )
            )
        if not group:
            rows.append((page["id"], line_no, None, None, None))
    return rows


def template_inclusion_rows(page):
    """(page_id, template_id, incl_idx, param, value) — Legacy.pm:188-215:
    newlines in values -> spaces; params starting with '=' skipped."""
    rows = []
    for template_id, incl_list in page.get("templates", {}).items():
        for incl_idx, params in enumerate(incl_list):
            emitted = False
            for param, value in params.items():
                if param.startswith("="):
                    continue
                rows.append(
                    (page["id"], template_id, incl_idx, param,
                     _NL_RE.sub(" ", value))
                )
                emitted = True
            if not emitted:
                # a parameter-less inclusion still logs a Page/End block
                # (Legacy.pm:201-210) — keep one row so it stays visible
                rows.append((page["id"], template_id, incl_idx, None, None))
    return rows
