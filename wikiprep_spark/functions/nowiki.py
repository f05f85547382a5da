"""<nowiki>/<pre> masking.

Re-expression of ``/root/reference/lib/Wikiprep/nowiki.pm``: fragments
matching a regex are swapped out for ``\\x7fUNIQ...`` tokens (the MediaWiki
parser trick) and later swapped back.  The reference uses random token
suffixes; tokens never escape a single page row, so we use a deterministic
per-call counter — same shape (16 hex digits), fully reproducible.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile("\x7fUNIQ[0-9a-f]{16}")

# Templates.pm:320-321 — do not match <nowiki />
NOWIKI_RE = re.compile(r"<nowiki(?:[^<>]*[^<>/])?>.*?</nowiki[^<>]*>", re.S)
PRE_RE = re.compile(r"<pre(?:[^<>]*[^<>/])?>.*?</pre[^<>]*>", re.S)


def extract_tags(regex, text: str, chunks: dict) -> str:
    """Replace every regex match with a unique token; record token->content
    in ``chunks``. (nowiki.pm:36-40)"""
    counter = len(chunks)

    def repl(m):
        nonlocal counter
        token = "\x7fUNIQ%08x%08x" % (counter, counter ^ 0x5A5A5A5A)
        counter += 1
        chunks[token] = m.group(0)
        return token

    return regex.sub(repl, text)


def replace_tags(text: str, chunks: dict) -> str:
    """Swap tokens back for their original content; unknown tokens are left
    untouched. (nowiki.pm:46-80)"""
    if not chunks:
        return text
    return TOKEN_RE.sub(lambda m: chunks.get(m.group(0), m.group(0)), text)
