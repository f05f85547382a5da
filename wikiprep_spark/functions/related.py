"""Related-article identification (re-expression of
/root/reference/lib/Wikiprep/Related.pm).

Three matchers over the expanded (pre-link-extraction) text: standalone
line prefixes, inline parenthesized wordings, and whole "See also"-style
sections.  Link extraction runs on line copies, so the page text is not
modified here.
"""

from __future__ import annotations

import re

from wikiprep_spark.config import (
    ENWIKI,
    RELATED_INLINE_RE,
    RELATED_SECTION_RE,
    RELATED_STANDALONE_LINE_RE,
)
from wikiprep_spark.functions.links import extract_wiki_links

_SECTION_HEADER_RE = re.compile(r"==(.*?)==")


def get_link_ids(anchors):
    """utils.pm:75-83: the resolved target ids of a list of anchor structs."""
    return [a["targetId"] for a in anchors if "targetId" in a]


def remove_duplicates_and_self(items, element_to_remove=None):
    """utils.pm:90-108: order-preserving dedup, optionally dropping the page's
    own id (numeric comparison)."""
    seen = set()
    out = []
    for it in items:
        if element_to_remove is not None and it == element_to_remove:
            continue
        if it not in seen:
            seen.add(it)
            out.append(it)
    return out


def remove_elements(items, to_remove):
    """utils.pm:112-132: list difference, second list hashed."""
    removal = set(to_remove)
    return [it for it in items if it not in removal]


def identify_related_articles(page, env, site=ENWIKI):
    """Fill page['relatedArticles'] (Related.pm:25-97)."""
    lines = page["text"].split("\n")
    anchors = []

    # 1) standalone designators at (almost) the start of a line
    for line in lines:
        m = RELATED_STANDALONE_LINE_RE.match(line)
        if m:
            extract_wiki_links(m.group(1), env, anchors, site=site)

    # 2) inline, in parentheses
    for line in lines:
        for m in RELATED_INLINE_RE.finditer(line):
            extract_wiki_links(m.group(1), env, anchors, site=site)

    # 3) a dedicated section, until the next section header
    in_section = False
    for line in lines:
        if in_section:
            if _SECTION_HEADER_RE.search(line):
                break
            extract_wiki_links(line, env, anchors, site=site)
        else:
            m = _SECTION_HEADER_RE.search(line)
            if m and RELATED_SECTION_RE.search(m.group(1)):
                in_section = True

    related = get_link_ids(anchors)
    page["relatedArticles"] = remove_duplicates_and_self(related, page["id"])
