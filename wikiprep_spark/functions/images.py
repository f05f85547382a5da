"""Gallery/imagemap conversion and image-link parameter parsing.

Re-expression of ``/root/reference/lib/Wikiprep/images.pm``.
"""

from __future__ import annotations

import re

from wikiprep_spark.config import ENWIKI, SiteConfig

_GALLERY_RE = re.compile(r"<gallery>(.*?)</gallery>", re.S)
_IMAGEMAP_RE = re.compile(r"<imagemap>([^<]*)</imagemap>", re.S)
_IMAGEMAP_COMMENT_RE = re.compile(r"^\s*#.*$", re.M | re.I)
_IMAGEMAP_LOCSPEC_RE = re.compile(r"^.*(\[\[.*\]\])\s*$", re.M | re.I)

_SIZE_PARAM_RE = re.compile(r"^\s*[0-9x]+px(?:px)?\s*$", re.I)
_POSITION_PARAM_RE = re.compile(
    r"^\s*(?:left|right|center|none|thumb(?:nail)?|frame(?:less|d)?|border|"
    r"baseline|middle|sub|super|text-top|text-bottom|top|bottom)\s*$",
    re.I | re.S,
)
_KEYWORD_PARAM_RE = re.compile(r"^\s*(?:alt|link|upright|thumb(?:nail)?)=",
                               re.I)


def _alias_image_lines(text: str, site: SiteConfig) -> str:
    """Apply namespace aliases at line starts (images.pm:36-38,86-89)."""
    for alias, canonical in site.namespace_aliases.items():
        text = re.sub(r"^\s*%s:" % re.escape(alias), canonical + ":",
                      text, flags=re.M | re.I)
    return text


def convert_gallery_to_link(text: str, site: SiteConfig = ENWIKI) -> str:
    """Wrap each File: line of a <gallery> in [[ ... ]] so the normal link
    extractor picks it up (images.pm:11-48)."""
    image_line_re = re.compile(
        r"^\s*(%s:.*)\s*$" % re.escape(site.image_namespace), re.M | re.I)

    def one(m):
        inner = _alias_image_lines(m.group(1), site)
        return image_line_re.sub(lambda mm: "[[%s]]" % mm.group(1), inner)

    while True:
        text, n = _GALLERY_RE.subn(one, text)
        if n == 0:
            return text


def convert_imagemap_to_link(text: str, site: SiteConfig = ENWIKI) -> str:
    """Like galleries, plus comment/coordinate stripping (images.pm:50-103)."""
    image_line_re = re.compile(
        r"^\s*(%s:.*)\s*$" % re.escape(site.image_namespace), re.M | re.I)

    def one(m):
        inner = _alias_image_lines(m.group(1), site)
        inner = image_line_re.sub(lambda mm: "[[%s]]" % mm.group(1), inner)
        inner = _IMAGEMAP_COMMENT_RE.sub("", inner)
        inner = _IMAGEMAP_LOCSPEC_RE.sub(lambda mm: mm.group(1), inner)
        return inner

    while True:
        text, n = _IMAGEMAP_RE.subn(one, text)
        if n == 0:
            return text


def parse_image_parameters(pipe_fields) -> str:
    """Pick the caption among an image link's pipe fields: drop size,
    position/type and alt/link keyword parameters, then take the longest
    remaining candidate (images.pm:114-148)."""
    candidates = [
        p for p in pipe_fields
        if not (_SIZE_PARAM_RE.match(p) or _POSITION_PARAM_RE.match(p)
                or _KEYWORD_PARAM_RE.match(p))
    ]
    if not candidates:
        return ""
    return sorted(candidates, key=len, reverse=True)[0]
