"""External-URL extraction (re-expression of /root/reference/bin/wikiprep:670-760).

Two kinds of external links: explicit ``[proto://url anchor]`` (anchor text
stays in the page text) and bare URLs (removed from the text).  Protocols
are matched case-sensitively against the MediaWiki whitelist.
"""

from __future__ import annotations

import re

URL_PROTOCOLS = frozenset(
    {"http", "https", "ftp", "irc", "gopher", "telnet", "nntp",
     "worldwind", "mailto", "news"}
)

_URL = r"[a-z]+:(?:[\w!$&'()*+,\-./:;=?@_`~#]|%[a-fA-F0-9]{2})+"
_URL_BRACKETED_RE = re.compile(r"\[(" + _URL + r")(.*?)\]")
_URL_BARE_RE = re.compile("(" + _URL + ")")


def _dedup_keep_order(items):
    """utils.pm:90-108 without an element to remove."""
    seen = set()
    out = []
    for it in items:
        if it not in seen:
            seen.add(it)
            out.append(it)
    return out


def extract_urls(text: str):
    """Returns (new_text, external_links, bare_urls) where external_links is
    a list of {'url':..., 'anchor':...?} dicts in extraction order and
    bare_urls the order-preserving deduped URL list."""
    external_links = []
    bare_urls = []

    def collect_bracketed(m):
        url, anchor = m.group(1), m.group(2)
        proto = url.split(":", 1)[0]
        if proto in URL_PROTOCOLS:
            bare_urls.append(url)
            trimmed = re.sub(r"^\s+", "", anchor)
            trimmed = re.sub(r"\s+$", "", trimmed)
            if len(trimmed) > 0:
                external_links.append({"anchor": trimmed, "url": url})
            else:
                external_links.append({"url": url})
            return trimmed
        return "[%s%s]" % (url, anchor)

    def collect_standalone(m):
        url = m.group(1)
        proto = url.split(":", 1)[0]
        if proto in URL_PROTOCOLS:
            bare_urls.append(url)
            external_links.append({"url": url})
            return ""
        return url

    text = _URL_BRACKETED_RE.sub(collect_bracketed, text)
    text = _URL_BARE_RE.sub(collect_standalone, text)
    return text, external_links, _dedup_keep_order(bare_urls)
