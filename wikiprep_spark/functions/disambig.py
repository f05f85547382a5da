"""Disambiguation-page detection and parsing (re-expression of
/root/reference/lib/Wikiprep/Disambig.pm).

Runs on the page text BEFORE template expansion (disambig indicators are
templates). Each qualifying list line contributes one group of anchor
structs.
"""

from __future__ import annotations

import re

from wikiprep_spark.config import (
    DISAMBIG_TEMPLATE_RE,
    DISAMBIG_TITLE_RE,
    ENWIKI,
)
from wikiprep_spark.functions.links import extract_wiki_links

_LIST_LINE_RE = re.compile(r"\s*(?:\*\*|##|:#|:\*|#|\*)", re.I)


def is_disambiguation(page) -> bool:
    """Disambig.pm:13-28: a disambig template in the text, or a
    '(disambiguation)' title."""
    if DISAMBIG_TEMPLATE_RE.search(page["text"]):
        return True
    return bool(DISAMBIG_TITLE_RE.search(page.get("title", "")))


def parse_disambig(page, env, site=ENWIKI):
    """Disambig.pm:30-53: per list line, the anchor structs on that line
    (an empty group is recorded for link-free list lines)."""
    groups = []
    for line in page["text"].split("\n"):
        if _LIST_LINE_RE.match(line):
            anchors = []
            extract_wiki_links(line, env, anchors, site=site)
            groups.append(anchors)
    page["disambigLinks"] = groups
