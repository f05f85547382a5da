"""Recursive template transclusion.

Re-expression of ``/root/reference/lib/Wikiprep/Templates.pm``: body
preprocessing at prescan time, and the recursive include/instantiate engine
used during transform. Runs as plain Python inside Arrow-batched pandas UDFs;
the template-body dictionary is a Spark broadcast shared by all rows of a
partition.
"""

from __future__ import annotations

import re

from wikiprep_spark.config import (
    ENWIKI,
    MAX_TEMPLATE_INVOCATION_CHARS,
    MAX_TEMPLATE_RECURSION_LEVELS,
)
from wikiprep_spark.functions import nowiki
from wikiprep_spark.functions.parserfunctions import include_parser_function
from wikiprep_spark.functions.titles import normalize_title
from wikiprep_spark.functions.tmplscan import (
    parse_template_invocation,
    split_on_templates,
    split_template_invocation,
    strip_parameter_refs,
    template_parameter_recursion,
)

COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_ONLYINCLUDE_RE = re.compile(r"<onlyinclude>(.*?)</onlyinclude>", re.S)
_NOINCLUDE_RE = re.compile(r"<noinclude\s*>.*?</noinclude\s*>", re.S)
_NOINCLUDE_OPEN_RE = re.compile(r"<noinclude\s*>.*$", re.S)
_INCLUDEONLY_RE = re.compile(r"<includeonly\s*>(.*?)</includeonly\s*>", re.S)


class ExpansionContext:
    """Per-page state threaded through the expansion recursion.

    ``page`` is the mutable page dict (title, id, templates inclusion log);
    ``env`` carries the cross-page dictionaries (title2id, redir, templates)
    — the Spark-broadcast equivalents of the reference's BerkeleyDB tables.
    """

    __slots__ = ("page", "env", "site")

    def __init__(self, page, env, site=ENWIKI):
        self.page = page
        self.env = env
        self.site = site


def preprocess_template_body(text: str) -> str:
    """Prescan-time body preparation (Templates.pm:51-86): strip comments;
    if <onlyinclude> fragments exist keep only those (each followed by a
    newline); otherwise drop <noinclude> sections (including an unterminated
    one) and unwrap <includeonly>."""
    text = COMMENT_RE.sub("", text)
    fragments = _ONLYINCLUDE_RE.findall(text)
    if fragments:
        return "".join(f + "\n" for f in fragments)
    text = _NOINCLUDE_RE.sub("", text)
    text = _NOINCLUDE_OPEN_RE.sub("", text)
    text = _INCLUDEONLY_RE.sub(lambda m: m.group(1), text)
    return text


def resolve_link(title: str, env):
    """Title -> page id with exactly one redirect hop; a double redirect
    drops the link (Link.pm:130-161)."""
    if len(title) == 0:
        return None
    target = env.redir.get(title)
    if target is not None:
        if target in env.redir:
            return None  # double redirects are ignored
    else:
        target = title
    return env.title2id.get(target)


def resolve_page_link(title: str, env):
    """resolve_link, additionally dropping links to templates
    (Link.pm:165-186)."""
    target_id = resolve_link(title, env)
    if target_id is not None and target_id in env.templates:
        return None
    return target_id


def _include_template_text(ctx, template_title: str, params: dict) -> str:
    """Look up and parameter-substitute a template body, logging the
    inclusion on the page (Templates.pm:217-247)."""
    included_id = resolve_link(template_title, ctx.env)
    if included_id is not None and included_id in ctx.env.templates:
        log = ctx.page["templates"].setdefault(included_id, [])
        log.append(params)
        result = ctx.env.templates[included_id]
        if "{" in result:
            result = template_parameter_recursion(result, params)
        return result
    return " "


def instantiate_template(ctx, invocation: str, level: int) -> str:
    """Expand one {{...}} invocation (Templates.pm:249-317)."""
    if len(invocation) > MAX_TEMPLATE_INVOCATION_CHARS:
        return ""
    fields = split_template_invocation(invocation)
    if not fields:
        return ""
    template_title, *raw_params = fields

    if "{" in template_title:
        template_title = include_templates(ctx, template_title, level + 1)

    result = include_parser_function(ctx, template_title, raw_params, level)

    if result is None:
        template_title = normalize_title(
            template_title, ctx.site.template_namespace, ctx.site
        )
        raw_params = [
            include_templates(ctx, p, level + 1) if "{" in p else p
            for p in raw_params
        ]
        if template_title in ctx.site.override_templates:
            return ctx.site.override_templates[template_title]
        params = parse_template_invocation(raw_params)
        result = _include_template_text(ctx, template_title, params)

    if "{" in result:
        result = include_templates(ctx, result, level + 1)
    return result


def include_templates(ctx, text: str, level: int) -> str:
    """Transclude all templates in ``text`` (Templates.pm:329-393):
    recursion-capped, with <nowiki>/<pre> contents masked so example
    invocations don't expand, and bare {{{...}}} parameter references in the
    page body (level 0) removed before instantiation.

    At the recursion cap the text is returned UNCHANGED (the reference's
    early return never touches the by-reference argument); leftover
    un-instantiated {{...}} blocks are swept up later by postprocess_text."""
    if level > MAX_TEMPLATE_RECURSION_LEVELS:
        return text

    pre_chunks: dict = {}
    nowiki_chunks: dict = {}
    text = nowiki.extract_tags(nowiki.PRE_RE, text, pre_chunks)
    text = nowiki.extract_tags(nowiki.NOWIKI_RE, text, nowiki_chunks)

    parts = []
    invocation = False
    for token in split_on_templates(text):
        if invocation:
            if level == 0:
                token = strip_parameter_refs(token)
            parts.append(instantiate_template(ctx, token, level))
            invocation = False
        else:
            parts.append(token)
            invocation = True
    text = "".join(parts)

    text = nowiki.replace_tags(text, nowiki_chunks)
    text = nowiki.replace_tags(text, pre_chunks)
    return text
