"""Site configuration for the English-Wikipedia pipeline.

Re-expresses the behavior of the reference configuration
(``/root/reference/lib/Wikiprep/Config.pm`` and
``/root/reference/lib/Wikiprep/Config/Enwiki.pm``) as plain Python data.
Every regex below is a Python translation of the cited Perl pattern; note
that several of the reference patterns are compiled with ``/x``, which makes
literal whitespace inside the pattern insignificant (e.g. ``given name``
really matches ``givenname`` — we preserve that faithfully).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --- recursion / size caps (Config.pm:21-22, Templates.pm:21,252-257,
# ParserFunction.pm:264). These affect output and must match exactly.
MAX_TEMPLATE_RECURSION_LEVELS = 10
MAX_TABLE_RECURSION_LEVELS = 5
MAX_PARAMETER_RECURSION_LEVELS = 10
MAX_TEMPLATE_INVOCATION_CHARS = 32767
MAX_PADDING = 500

# {{int:Lang}} expansion (Config.pm:38)
INT_LANG = "en"

# Month tables (Enwiki.pm:7-20, Config.pm:40-45)
NUMBER_TO_MONTH = {
    1: "January", 2: "February", 3: "March", 4: "April", 5: "May",
    6: "June", 7: "July", 8: "August", 9: "September", 10: "October",
    11: "November", 12: "December",
}
_NUM_MONTH_TO_NUM_DAYS = {
    1: 31, 2: 29, 3: 31, 4: 30, 5: 31, 6: 30,
    7: 31, 8: 31, 9: 30, 10: 31, 11: 30, 12: 31,
}
MONTH_TO_NUM_DAYS = {
    NUMBER_TO_MONTH[n]: d for n, d in _NUM_MONTH_TO_NUM_DAYS.items()
}

# Namespace aliases (Enwiki.pm:25-27)
NAMESPACE_ALIASES = {"Image": "File"}

# Namespace roles (Enwiki.pm:108-118)
CATEGORY_NAMESPACE = "Category"
TEMPLATE_NAMESPACE = "Template"
IMAGE_NAMESPACE = "File"

# Namespace gates (Enwiki.pm:71-82)
OK_NAMESPACES_FOR_PRESCANNING = {"Template", "Category", "File"}
OK_NAMESPACES_FOR_TRANSFORMING = {"Category", "File"}
# Interwiki pseudo-namespaces (Enwiki.pm:98-106)
OK_NAMESPACES_FOR_INTERWIKI_LINKS = {
    "File", "Wookieepedia", "Memoryalpha", "Wowwiki",
    "Marveldatabase", "Dcdatabase",
}

# Template-name overrides (Enwiki.pm:50-52)
OVERRIDE_TEMPLATES = {"Template:Int:Lang": "en"}

# The 20 namespaces declared in the <siteinfo> header of the enwiki dumps the
# reference was tested against (t/cases/anchors.xml:8-30), keyed by their
# normalized names; value is the numeric key.  loadNamespaces
# (Namespace.pm:104-138) also registers the interwiki pseudo-namespaces.
DEFAULT_DUMP_NAMESPACES = {
    "Media": -2, "Special": -1, "": 0, "Talk": 1, "User": 2,
    "User talk": 3, "Wikipedia": 4, "Wikipedia talk": 5, "File": 6,
    "Image talk": 7, "Mediawiki": 8, "Mediawiki talk": 9, "Template": 10,
    "Template talk": 11, "Help": 12, "Help talk": 13, "Category": 14,
    "Category talk": 15, "Portal": 100, "Portal talk": 101,
}

# Raw namespace names exactly as declared in the dump <siteinfo> header —
# used for Parse::MediaWikiDump-style page-namespace detection (exact match
# on the title prefix, before any normalization).
RAW_DUMP_NAMESPACE_NAMES = frozenset(
    {
        "Media", "Special", "Talk", "User", "User talk", "Wikipedia",
        "Wikipedia talk", "File", "Image talk", "MediaWiki",
        "MediaWiki talk", "Template", "Template talk", "Help", "Help talk",
        "Category", "Category talk", "Portal", "Portal talk",
    }
)

# Related-article wordings (Enwiki.pm:38-67).  The reference qr// patterns are
# /ix, so inner whitespace is insignificant — hence the explicit (?:\s+).
_RELATED_STANDALONE = (
    r"Main\s+articles?|Further\s+information|Related\s+articles?|"
    r"Related\s+topics?|See\s+main\s+articles?|See\s+articles?|See\s+also|"
    r"For\s+(?:more|further)"
)
_RELATED_INLINE = r"See[\s:]|See\s+also|For\s+(?:more|further)"
_RELATED_SECTION = (
    r"Further\s+information|See\s+also|Related\s+articles?|Related\s+topics?"
)

RELATED_STANDALONE_LINE_RE = re.compile(
    r"^(?:.{0,5})((?:" + _RELATED_STANDALONE + r").*)$", re.I
)
RELATED_INLINE_RE = re.compile(
    r"\((?:\s*)((?:" + _RELATED_INLINE + r").*?)\)", re.I
)
RELATED_SECTION_RE = re.compile(_RELATED_SECTION, re.I)

# Disambiguation detection (Enwiki.pm:122-139).  The template alternation is
# compiled with /ix in the reference, so "given name" matches literally
# "givenname" — preserved on purpose.
_DISAMBIG_TEMPLATES = (
    r"disambiguation|disambig|disambig-cleanup|disamb|dab|shipindex|hndis|"
    r"surname|geodis|schooldis|hospitaldis|mathdab|numberdis|givenname"
)
DISAMBIG_TEMPLATE_RE = re.compile(
    r"\{\{\s*(?:" + _DISAMBIG_TEMPLATES + r")\s*(?:\|.*)?\s*\}\}", re.I
)
DISAMBIG_TITLE_RE = re.compile(r"\(disambiguation\)", re.I)

# Redirect recognition (Enwiki.pm:143-157); both anchored at string start.
IS_REDIRECT_RE = re.compile(r"\s*#REDIRECT", re.I)
PARSE_REDIRECT_RE = re.compile(
    r"\s*#REDIRECT"          # must start with #REDIRECT
    r"(?:S|ED|ION)?"          # REDIRECT|REDIRECTS|REDIRECTED|REDIRECTION
    r"\s*"
    r"(?::|\sTO|=)?"          # optional colon, " TO" or "="
    r"\s*"
    r"\[\[([^\]]*)\]\]",      # the link itself
    re.I,
)


@dataclass(frozen=True)
class SiteConfig:
    """Bundle of site-specific settings passed through the pure functions.

    ``namespaces`` maps normalized namespace name -> numeric id (or None for
    interwiki pseudo-namespaces), mirroring the reference's %namespaces hash
    after loadNamespaces (Namespace.pm:104-138).
    """

    namespaces: dict = field(default_factory=dict)
    namespace_aliases: dict = field(
        default_factory=lambda: dict(NAMESPACE_ALIASES)
    )
    category_namespace: str = CATEGORY_NAMESPACE
    template_namespace: str = TEMPLATE_NAMESPACE
    image_namespace: str = IMAGE_NAMESPACE
    ok_prescan: frozenset = frozenset(OK_NAMESPACES_FOR_PRESCANNING)
    ok_transform: frozenset = frozenset(OK_NAMESPACES_FOR_TRANSFORMING)
    ok_interwiki: frozenset = frozenset(OK_NAMESPACES_FOR_INTERWIKI_LINKS)
    override_templates: dict = field(
        default_factory=lambda: dict(OVERRIDE_TEMPLATES)
    )


def default_site_config() -> SiteConfig:
    """SiteConfig with the standard enwiki dump namespaces plus interwiki
    pseudo-namespaces registered (Namespace.pm:122-126 maps them to "null")."""
    ns = dict(DEFAULT_DUMP_NAMESPACES)
    for name in OK_NAMESPACES_FOR_INTERWIKI_LINKS:
        ns.setdefault(name, None)
    return SiteConfig(namespaces=ns)


ENWIKI = default_site_config()
