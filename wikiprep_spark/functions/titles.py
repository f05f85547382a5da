"""Title and namespace normalization.

Python re-expression of ``/root/reference/lib/Wikiprep/Namespace.pm`` —
the functions that define page identity for the whole knowledge graph.
Semantics pinned by the 17 asserts in ``/root/reference/t/namespace.t``
(mirrored in tests/test_titles.py).
"""

from __future__ import annotations

import re

from wikiprep_spark.config import ENWIKI, SiteConfig

# remove leading/trailing runs of whitespace+underscore; squeeze inner runs
# (Namespace.pm:50-54). Perl's class is [ \f\n\r\t_] — no \v, no unicode.
_WS_LEAD_RE = re.compile(r"^[ \f\n\r\t_]+")
_WS_TRAIL_RE = re.compile(r"[ \f\n\r\t_]+$")
_WS_SQUEEZE_RE = re.compile(r"[ \f\n\r\t_]+")
_LRM_RLM_RE = re.compile("[‎‏]")
_LEADING_COLON_RE = re.compile(r"^: *")
_NS_SPLIT_RE = re.compile(r"^([^:]*): *(\S.*)", re.S)


def ucfirst(s: str) -> str:
    """Perl ucfirst: upper-case only the first character."""
    return s[:1].upper() + s[1:] if s else s


def normalize_namespace(s: str, site: SiteConfig = ENWIKI) -> str:
    """Namespaces are lowercase with capitalized first letter, then aliased
    (Image -> File). Namespace.pm:21-30."""
    s = ucfirst(s.lower())
    return site.namespace_aliases.get(s, s)


def is_known_namespace(ns: str, site: SiteConfig = ENWIKI) -> bool:
    """Namespace.pm:146-150; assumes ns already normalized."""
    return ns in site.namespaces


def normalize_namespace_title(
    s: str, default_namespace: str | None = None, site: SiteConfig = ENWIKI
):
    """Split + canonicalize a title into (namespace, title).

    Returns ``(namespace_or_default, title)`` where namespace may be None/''
    (main namespace). Mirrors Namespace.pm:43-98, including:
    - whitespace/underscore squeezing, LRM/RLM stripping
    - leading-colon strip only when no default namespace (Perl falsy check:
      '' counts as "no default")
    - known-namespace prefixes absorb the space after the colon; unknown
      prefixes keep it ("3001: The Final Odyssey")
    - ucfirst on the title part only.
    """
    s = _WS_LEAD_RE.sub("", s)
    s = _WS_TRAIL_RE.sub("", s)
    s = _WS_SQUEEZE_RE.sub(" ", s)
    s = _LRM_RLM_RE.sub("", s)

    if not default_namespace:  # Perl: unless $defaultNamespace ('' is falsy)
        s = _LEADING_COLON_RE.sub("", s, count=1)

    m = _NS_SPLIT_RE.match(s)
    if m:
        candidate = normalize_namespace(m.group(1), site)
        if is_known_namespace(candidate, site):
            return candidate, ucfirst(m.group(2))
        return default_namespace, ucfirst(s)
    return default_namespace, ucfirst(s)


def normalize_title(
    s: str, default_namespace: str | None = None, site: SiteConfig = ENWIKI
) -> str:
    """Namespace.pm:36-41 — join the normalized (ns, title) pair.

    Note the Perl truthiness: a '' namespace joins as bare title."""
    ns, title = normalize_namespace_title(s, default_namespace, site)
    return f"{ns}:{title}" if ns else title


def is_namespace_ok(
    namespace: str, ok_set, site: SiteConfig = ENWIKI
) -> bool:
    """Namespace.pm:152-171: main namespace ('') always OK; a known
    namespace must be in ok_set; an unknown prefix means main namespace."""
    if namespace == "":
        return True
    ns = normalize_namespace(namespace, site)
    if is_known_namespace(ns, site):
        return ns in ok_set
    return True


def page_namespace(title: str, raw_names=None) -> str:
    """Namespace of a raw dump page title, as Parse::MediaWikiDump exposes it:
    the prefix before the first ':' if it exactly matches a namespace name
    declared in the dump header, else '' (main)."""
    from wikiprep_spark.config import RAW_DUMP_NAMESPACE_NAMES

    names = raw_names if raw_names is not None else RAW_DUMP_NAMESPACE_NAMES
    if ":" in title:
        prefix = title.split(":", 1)[0]
        if prefix in names:
            return prefix
    return ""


def percent_encode(s: str) -> str:
    """MediaWiki-style URL encoding used by urlencode / PAGENAMEE
    (ParserFunction.pm:59,192): every non-[A-Za-z0-9] char -> %XX of its
    codepoint (same %02X formatting as the reference)."""
    return "".join(
        c if ("A" <= c <= "Z" or "a" <= c <= "z" or "0" <= c <= "9")
        else "%%%02X" % ord(c)
        for c in s
    )
