"""Internal wiki-link extraction.

Re-expression of ``extractWikiLinks`` and ``normalizeDates``
(``/root/reference/lib/Wikiprep/Link.pm:188-427``): the iterative
innermost-first ``[[...]]`` matcher with prefix/suffix word glue, pipe
fields, pipeline masking, date normalization, category/image/interwiki
special cases and anchor-discard heuristics.  Mutated text carries
``.pAriD=~id~. ... .pArenD.`` markers that postprocess_text converts to
tags; anchor offsets (``linkLocation``) are match offsets within the pass
string, exactly like Perl's ``$-[0]`` under the iterative substitution.
"""

from __future__ import annotations

import re

from wikiprep_spark.config import ENWIKI, MONTH_TO_NUM_DAYS, NUMBER_TO_MONTH
from wikiprep_spark.functions.images import parse_image_parameters
from wikiprep_spark.functions.postprocess import postprocess_text
from wikiprep_spark.functions.templates import resolve_page_link
from wikiprep_spark.functions.titles import normalize_namespace_title, ucfirst

# Link.pm:188-200 — words may be glued to either side of the brackets; the
# link text cannot contain '[' which makes the matcher innermost-first.
_INTERNAL_LINK_RE = re.compile(r"(\w*)\[\[([^\[]*?)\]\](\w*)", re.S)

_DATE_START_RE = re.compile(r"\s*\d")
_DATE_DAY_MONTH_RE = re.compile(r"^\s*([0-9]{1,2})\s+([A-Za-z]+)\s*$")
_DATE_MM_DD_RE = re.compile(r"^\s*([0-9]{1,2})-([0-9]{1,2})\s*$")
_DATE_ISO_RE = re.compile(r"^\s*([0-9]{3,4})-([0-9]{1,2})-([0-9]{1,2})\s*$")

_SECTION_SPLIT_RE = re.compile(r"\s*#")
_LEADING_COLON_RE = re.compile(r"^\s*:")
_PIPELINE_NS_RE = re.compile(r"^\s*[^:]*:\s*", re.S)
_PIPELINE_PARENS_RE = re.compile(r"\s*\([^()]*\)\s*$", re.S)


def _perl_false(s) -> bool:
    """Perl string falsiness: undef, '' and '0'."""
    return s is None or s == "" or s == "0"


def normalize_dates(link: str):
    """Link.pm:392-427 — rewrite day-first / numeric date links into the
    canonical "[[Month D]]" (and "[[Month D]], [[YYYY]]") forms; returns
    None when the link is not a recognized date."""
    m = _DATE_DAY_MONTH_RE.match(link)
    if m:
        day = int(m.group(1))
        month = ucfirst(m.group(2).lower())
        if month in MONTH_TO_NUM_DAYS and 1 <= day <= MONTH_TO_NUM_DAYS[month]:
            return "[[%s %d]]" % (month, int(m.group(1)))
        return None
    m = _DATE_MM_DD_RE.match(link)
    if m:
        month = NUMBER_TO_MONTH.get(int(m.group(1)))
        if month is not None:
            day = int(m.group(2))
            if 1 <= day <= MONTH_TO_NUM_DAYS[month]:
                return "[[%s %s]]" % (month, m.group(2))
        return None
    m = _DATE_ISO_RE.match(link)
    if m:
        month = NUMBER_TO_MONTH.get(int(m.group(2)))
        if month is not None:
            day = int(m.group(3))
            if 1 <= day <= MONTH_TO_NUM_DAYS[month]:
                return "[[%s %s]], [[%s]]" % (month, m.group(3), m.group(1))
        return None
    return None


def extract_wiki_links(
    text, env, anchors, interwiki=None, categories=None, site=ENWIKI
):
    """Extract all internal links from ``text``.

    Appends anchor structs (dicts with anchorText/linkLocation and optional
    targetId or targetNamespace/targetTitle) to ``anchors``; appends
    ``(namespace, title)`` pairs to ``interwiki`` and resolved category page
    ids to ``categories`` when those lists are given.  Returns the rewritten
    text with resolved links as marker sequences.
    """

    def collect(m):
        prefix, link, suffix = m.group(1), m.group(2), m.group(3)
        if link == "" or link == "0":  # Perl: unless $link
            return prefix + suffix

        link_location = m.start()

        # Date links are normalized first and re-extracted on the next pass.
        if _DATE_START_RE.match(link):
            dates = normalize_dates(link)
            if dates:
                return prefix + dates + suffix

        fields = link.split("|")  # split /\|/, -1: keep trailing empties
        first_field = fields[0]
        pipe_fields = fields[1:]

        # A nested (already replaced) link before the first '|' is illegal.
        if ".pAriD=~" in first_field:
            return prefix + link + suffix

        link_namespace, link_title_section = normalize_namespace_title(
            first_field, None, site
        )
        if _perl_false(link_title_section):
            return prefix + suffix

        parts = _SECTION_SPLIT_RE.split(link_title_section, maxsplit=1)
        link_title = parts[0]
        link_section = parts[1] if len(parts) == 2 else None

        link_namespace_title = (
            "%s:%s" % (link_namespace, link_title)
            if link_namespace
            else link_title
        )
        target_id = resolve_page_link(link_namespace_title, env)

        # --- category links (Link.pm:246-262)
        if link_namespace and link_namespace == site.category_namespace:
            if _LEADING_COLON_RE.match(first_field):
                # [[:Category:X]] is a normal link to the category page
                anchor = pipe_fields.pop() if pipe_fields else None
                if anchor is None:
                    anchor = _LEADING_COLON_RE.sub("", link, count=1)
                return prefix + anchor + suffix
            if target_id:
                if categories is not None:
                    categories.append(target_id)
            return prefix + suffix

        # --- anchor text (Link.pm:264-292)
        no_alt_text = False
        no_glue = False
        if link_namespace and link_namespace == site.image_namespace:
            anchor = parse_image_parameters(pipe_fields)
            no_glue = True
        else:
            anchor = pipe_fields.pop() if pipe_fields else None
            if anchor is None:
                anchor = link
                no_alt_text = True
            elif anchor == "" and _perl_false(link_section):
                # pipeline masking: strip namespace prefix and trailing parens
                anchor = first_field
                anchor = _PIPELINE_NS_RE.sub("", anchor, count=1)
                anchor = _PIPELINE_PARENS_RE.sub("", anchor, count=1)
            anchor = prefix + anchor + suffix

        struct = {
            "anchorText": postprocess_text(anchor, None),
            "linkLocation": link_location,
        }

        marker_target = None
        if target_id is None:
            if link_namespace and link_namespace in site.ok_interwiki:
                if interwiki is not None:
                    interwiki.append((link_namespace, link_title))
                    struct["targetNamespace"] = link_namespace
                    struct["targetTitle"] = link_title
                    marker_target = "!%d" % (len(interwiki) - 1)
                else:
                    anchor = ""
            elif no_alt_text and ":" in link:
                anchor = ""  # discard text of cross-wiki-looking dead links
        else:
            struct["targetId"] = target_id
            marker_target = str(target_id)

        anchors.append(struct)

        if marker_target is not None:
            retval = ".pAriD=~%s~.%s.pArenD." % (marker_target, anchor)
        else:
            retval = anchor

        if no_glue:
            return prefix + retval + suffix
        return retval

    while True:
        text, n = _INTERNAL_LINK_RE.subn(collect, text)
        if n == 0:
            return text
