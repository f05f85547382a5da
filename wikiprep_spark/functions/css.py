"""CSS metadata removal (re-expression of /root/reference/lib/Wikiprep/css.pm).

Removes <div>/<span> blocks whose class is one of the metadata-ish CSS
classes; they carry no usable text. The reference pattern contains the
`(:?div|span)` quirk (optional leading colon inside the group) — preserved.
"""

from __future__ import annotations

import re

_CSS_CLASSES = (
    "metadata|dablink|sisterproject|longitude|latitude|"
    "geo-multi-punct|geo-dec|geo"
)
_CSS_RE = re.compile(
    r'<(?::?div|span)\s[^<>]*class="(?:[^"]*\s)?(?:%s)(?:\s[^"]*)?"[^<>]*>'
    r"[^<>]*"
    r"</(?:div|span)>" % _CSS_CLASSES,
    re.I,
)


def remove_metadata(text: str) -> str:
    return _CSS_RE.sub(" ", text)
