"""Final text cleanup.

Re-expression of ``postprocessText`` and the table/math eliminators in
``/root/reference/bin/wikiprep:762-1016``.  The step ORDER is
semantics-critical (it changes emitted anchors and text) and is preserved
exactly.  The same function also runs recursively on each anchor text
(without an interwiki array — Link.pm:307), in which case the XML-encoding
and link-tag conversion steps are skipped.
"""

from __future__ import annotations

import re

from wikiprep_spark.config import MAX_TABLE_RECURSION_LEVELS

_INCLUDEONLY_RE = re.compile(r"<includeonly>(?:.*?)</includeonly>", re.S)
_ONLYINCLUDE_RE = re.compile(r"<onlyinclude>(?:.*?)</onlyinclude>", re.S)
_TIMELINE_RE = re.compile(r"<timeline>(?:.*?)</timeline>", re.S)
_BR_RE = re.compile(r"<br(?:\s*)(?:[/]?)>")
_LEFTOVER_TEMPLATE_RE = re.compile(r"\{\{(?:(?:(?!\{\{).)*?)\}\}", re.S)
_TAG_RE = re.compile(r"</?[a-z][^<>]*?>", re.S | re.I)
_BOLD_ITALIC_RE = re.compile(r"'''''(.*?)'''''")
_BOLD_RE = re.compile(r"'''(.*?)'''")
_ITALIC_RE = re.compile(r"''(.*?)''")
_BLANKLINE_RE = re.compile(r"\s*\n\s*\n\s*")
_ENTITY_RE = re.compile(r"&(?:#?\w+);")
_MARKER_PAIR_RE = re.compile(
    r"\.pAriD=~(!?[0-9]+)~\.((?:(?!\.pAr)(?!==).)*?)\.pArenD\.", re.S
)
_MARKER_OPEN_RE = re.compile(r"\.pAriD=~!?[0-9]+~\.")
_MARKER_CLOSE_RE = re.compile(r"\.pArenD\.")
_H4_RE = re.compile(r"^=====(.*?)=====(\s*)$", re.M)
_H3_RE = re.compile(r"^====(.*?)====(\s*)$", re.M)
_H2_RE = re.compile(r"^===(.*?)===(\s*)$", re.M)
_H1_RE = re.compile(r"^==(.*?)==(\s*)$", re.M)

_MATH_RE = re.compile(r"<math>(?:.*?)</math>", re.I | re.S)
_TABLE_HTML_RE = re.compile(r"<table(?:\s+[^<>]*)?>(?:.*?)</table\s*>",
                            re.I | re.S)
_TABLE_WIKI_RE = re.compile(r"\{\|(?:(?:(?!\{\|).)*?)\|\}(?!\})", re.S)

_XML_ENTITIES = {"&": "&amp;", '"': "&quot;", "'": "&apos;",
                 "<": "&lt;", ">": "&gt;"}
_XML_CHAR_RE = re.compile(r"[&\"'<>]")


def encode_xml_chars(text: str) -> str:
    """utils.pm:69-73."""
    return _XML_CHAR_RE.sub(lambda m: _XML_ENTITIES[m.group(0)], text)


def eliminate_tables(text: str) -> str:
    """bin/wikiprep:989-1009: one pass for <table> blocks, then up to
    MAX_TABLE_RECURSION_LEVELS innermost-first passes for {| ... |} blocks
    (the closer must not be the tail of a '|}}' template-parameter)."""
    text = _TABLE_HTML_RE.sub("\n", text)
    for _ in range(MAX_TABLE_RECURSION_LEVELS):
        text, n = _TABLE_WIKI_RE.subn("\n", text)
        if n == 0:
            break
    return text


def eliminate_math(text: str) -> str:
    """bin/wikiprep:1011-1015."""
    return _MATH_RE.sub(" ", text)


def _link_tag(target: str, content: str, interwiki) -> str:
    """bin/wikiprep:893-904: convert one marker pair to <a>/<w>."""
    if target.startswith("!"):
        ns, title = interwiki[int(target[1:])]
        return '<w namespace="%s" title="%s">%s</w>' % (
            encode_xml_chars(ns), encode_xml_chars(title), content)
    return '<a id="%s">%s</a>' % (target, content)


_ANCHOR_FASTPATH_CHARS = frozenset("<{'&=.\n")


def postprocess_text(text: str, interwiki=None) -> str:
    """bin/wikiprep:762-891. ``interwiki`` is the page's interwiki-link list;
    None means "anchor-text mode" (no XML encoding / link tags)."""
    if interwiki is None and not (_ANCHOR_FASTPATH_CHARS & set(text)):
        # anchor-mode fast path: every substitution below requires at least
        # one of these characters; plain anchors (the common case) skip the
        # whole regex chain untouched
        return text
    text = _INCLUDEONLY_RE.sub(" ", text)
    text = _ONLYINCLUDE_RE.sub(" ", text)
    text = _TIMELINE_RE.sub(" ", text)
    text = _BR_RE.sub("\n\n", text)

    text = eliminate_tables(text)
    text = eliminate_math(text)

    # un-instantiated templates, innermost-first
    while True:
        text, n = _LEFTOVER_TEMPLATE_RE.subn(" ", text)
        if n == 0:
            break

    # remaining tags (repeat: <div class="<nowiki> </nowiki>">)
    while True:
        text, n = _TAG_RE.subn(" ", text)
        if n == 0:
            break

    text = _BOLD_ITALIC_RE.sub(lambda m: m.group(1), text)
    text = _BOLD_RE.sub(lambda m: m.group(1), text)
    text = _ITALIC_RE.sub(lambda m: m.group(1), text)

    text = _BLANKLINE_RE.sub("\n\n", text)
    text = _ENTITY_RE.sub(" ", text)

    if interwiki is not None:
        text = encode_xml_chars(text)
        while True:
            text, n = _MARKER_PAIR_RE.subn(
                lambda m: _link_tag(m.group(1), m.group(2), interwiki), text)
            if n == 0:
                break

    text = _MARKER_OPEN_RE.sub("", text)
    text = _MARKER_CLOSE_RE.sub("", text)

    text = _H4_RE.sub(lambda m: "<h4>%s</h4>%s" % m.group(1, 2), text)
    text = _H3_RE.sub(lambda m: "<h3>%s</h3>%s" % m.group(1, 2), text)
    text = _H2_RE.sub(lambda m: "<h2>%s</h2>%s" % m.group(1, 2), text)
    text = _H1_RE.sub(lambda m: "<h1>%s</h1>%s" % m.group(1, 2), text)
    return text
