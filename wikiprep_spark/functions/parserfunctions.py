"""MediaWiki parser functions and magic words.

Re-expression of ``/root/reference/lib/Wikiprep/ParserFunction.pm``.
Each parser function receives ``(ctx, level, first, *params)`` where ``ctx``
is the per-page expansion context (see templates.py), ``level`` the template
recursion level, ``first`` the (already expanded, trimmed) text after the
first ':' and ``params`` the raw pipe-split fields after the first '|'.

Semantics pinned by the 22 asserts in ``t/parserfunction.t`` (mirrored in
tests/test_parserfunctions.py).
"""

from __future__ import annotations

import json
import os
import re

from wikiprep_spark.config import INT_LANG, MAX_PADDING
from wikiprep_spark.functions.titles import (
    normalize_namespace_title,
    percent_encode,
    ucfirst,
)

_LANG_NAMES = None


def language_name(code: str) -> str:
    """RFC-3066 code -> native language name; unknown codes pass through
    (languages.pm:349-360). Table data from MediaWiki languages/Names.php."""
    global _LANG_NAMES
    if _LANG_NAMES is None:
        try:
            # zip-safe: on a cluster the package arrives via
            # spark-submit --py-files and loads through zipimport
            from importlib import resources

            _LANG_NAMES = json.loads(
                resources.files("wikiprep_spark.functions")
                .joinpath("language_names.json").read_text("utf-8"))
        except Exception:
            path = os.path.join(os.path.dirname(__file__),
                                "language_names.json")
            with open(path, encoding="utf-8") as fh:
                _LANG_NAMES = json.load(fh)
    name = _LANG_NAMES.get(code)
    return name if name is not None else code


def _expand_if_braced(ctx, value, level):
    from wikiprep_spark.functions.templates import include_templates

    if "{" in value:
        return include_templates(ctx, value, level + 1)
    return value


def _pf_if(ctx, level, test, *params):
    """#if: non-empty test (ParserFunction.pm:78-97)."""
    if len(test) > 0:
        return params[0] if len(params) > 0 and len(params[0]) > 0 else ""
    return params[1] if len(params) > 1 and len(params[1]) > 0 else ""


def _pf_ifeq(ctx, level, lvalue, *params):
    """#ifeq: string equality; rvalue is template-expanded first
    (ParserFunction.pm:98-127)."""
    if len(params) == 0:
        return ""
    rvalue = _expand_if_braced(ctx, params[0], level)
    if lvalue == rvalue:
        return params[1] if len(params) > 1 and len(params[1]) > 0 else ""
    return params[2] if len(params) > 2 and len(params[2]) > 0 else ""


_SPLIT_EQ_RE = re.compile(r"\s*=\s*")
_DEFAULT_RE = re.compile(r"#default")


def _pf_switch(ctx, level, primary, *params):
    """#switch with fall-through, #default, and bare-last-value default
    (ParserFunction.pm:129-174, ported from ParserFunctions.php).

    Returns None when called with no branch parameters at all (the Perl code
    returns undef there, which makes the caller fall back to template
    inclusion)."""
    lvalue = None
    rvalue = None
    found = False
    default = None
    for param in params:
        if param == "":
            # Perl split on an empty string yields an empty list, so
            # ($lvalue, $rvalue) both become undef and the parameter never
            # matches — even against an empty primary.  (This is why the
            # reference routes {{#switch:|…||none =|#default = X}} with an
            # empty primary to #default, not to the ||none fall-through;
            # Citation/core's id="" attribute depends on it.)
            lvalue = None
            rvalue = None
            continue
        parts = _SPLIT_EQ_RE.split(param, maxsplit=1)
        if len(parts) == 2:
            lvalue, rvalue = parts
            lvalue = _expand_if_braced(ctx, lvalue, level)
            if found or lvalue == primary:
                return rvalue
            if _DEFAULT_RE.match(lvalue):
                default = rvalue
        else:
            lvalue = _expand_if_braced(ctx, parts[0], level)
            rvalue = None
            if lvalue == primary:
                found = True
    if rvalue is None:
        return lvalue  # may be None when params is empty (Perl undef)
    if default:
        return default
    return ""


def _pf_language(ctx, level, code, *params):
    return language_name(code) or ""


def _pf_urlencode(ctx, level, s, *params):
    return percent_encode(s)


def _pf_lc(ctx, level, s, *params):
    return s.lower()


def _pf_ucfirst(ctx, level, s, *params):
    return ucfirst(s)


def _pf_int(ctx, level, s, *params):
    return INT_LANG if s == "Lang" else s


def generate_padding(string: str, length, padding: str) -> str:
    """ParserFunction.pm:253-277 — build the pad string; numeric prefix of
    ``length`` (else 0), capped at MAX_PADDING, chunk-truncating exactly as
    the reference loop does."""
    m = re.match(r"\s*([0-9]+)", str(length))
    length = int(m.group(1)) if m else 0
    length = (MAX_PADDING if length > MAX_PADDING else length) - len(string)
    pad_len = len(padding)
    final = []
    while length > 0:
        final.append(padding[:length])
        length -= pad_len
    return "".join(final)


def _pad_args(ctx, level, params):
    length = params[0] if len(params) > 0 else None
    padding = params[1] if len(params) > 1 else None
    if length is not None:
        length = _expand_if_braced(ctx, length, level)
    if not length:  # Perl falsy: undef, '', '0'
        length = 0
    if length == "0":
        length = 0
    if padding is not None:
        padding = _expand_if_braced(ctx, padding, level)
    if not padding:
        padding = "0"
    return length, padding


def _pf_padleft(ctx, level, string, *params):
    length, padding = _pad_args(ctx, level, params)
    return generate_padding(string, length, padding) + string


def _pf_padright(ctx, level, string, *params):
    length, padding = _pad_args(ctx, level, params)
    return string + generate_padding(string, length, padding)


PARSER_FUNCTIONS = {
    "#if": _pf_if,
    "#ifeq": _pf_ifeq,
    "#switch": _pf_switch,
    "#language": _pf_language,
    "urlencode": _pf_urlencode,
    "lc": _pf_lc,
    "ucfirst": _pf_ucfirst,
    "int": _pf_int,
    "padleft": _pf_padleft,
    "padright": _pf_padright,
}


# --- Magic words (ParserFunction.pm:23-74): zero-argument built-ins keyed by
# the *raw* invocation title. Only these exact capitalizations of pagename.

def _magic_pagename(ctx):
    _ns, title = normalize_namespace_title(ctx.page["title"])
    return title


def _magic_namespace(ctx):
    ns, _title = normalize_namespace_title(ctx.page["title"], "")
    return ns or ""


def _magic_fullpagename(ctx):
    return ctx.page["title"]


def _magic_pagenamee(ctx):
    _ns, title = normalize_namespace_title(ctx.page["title"])
    return percent_encode(title)


def _magic_fullpagenamee(ctx):
    return percent_encode(ctx.page["title"])


MAGIC_WORDS = {
    "pagename": _magic_pagename,
    "Pagename": _magic_pagename,
    "PAGENAME": _magic_pagename,
    "NAMESPACE": _magic_namespace,
    "FULLPAGENAME": _magic_fullpagename,
    "PAGENAMEE": _magic_pagenamee,
    "FULLPAGENAMEE": _magic_fullpagenamee,
    "SERVER": lambda ctx: "http://wikiprep.example.com",
}


_PF_TITLE_RE = re.compile(r"(#?[a-z]+):\s*(.*?)\s*$", re.S)


def include_parser_function(ctx, template_title: str, raw_params, level):
    """Dispatch (ParserFunction.pm:279-323). Returns None when the title is
    neither a parser function nor a magic word (caller then tries template
    inclusion). Unknown function names fall back to the first raw parameter.
    """
    from wikiprep_spark.functions.templates import include_templates

    m = _PF_TITLE_RE.match(template_title)
    if m:
        fn_name = m.group(1)
        if fn_name in PARSER_FUNCTIONS:
            first = m.group(2)
            if "{" in first:
                first = include_templates(ctx, first, level + 1)
            return PARSER_FUNCTIONS[fn_name](ctx, level, first, *raw_params)
        return raw_params[0] if raw_params else ""
    if template_title in MAGIC_WORDS:
        return MAGIC_WORDS[template_title](ctx)
    return None
