"""Stage 0: src_pages(repo, path, commit, lang, content) -> parsed pages.

The input table shape is fixed by the BASELINE input hint: one MediaWiki
page XML record per row in ``content``.  Parsing happens once, in an
Arrow-batched mapInPandas, and the result is checkpointed; all later stages
read the parsed table with column pruning (prescan reads only the skinny
identity columns, transform reads the text).

``seq`` is the total-order key replacing the reference's dump document
order: the lexicographic (repo, path, commit) key.  Using the key itself
(instead of a global row_number) keeps ordering shuffle-free at any scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from wikiprep_spark.config import ENWIKI
from wikiprep_spark.functions.page import parse_redirect
from wikiprep_spark.functions.titles import (
    is_namespace_ok,
    normalize_title,
    page_namespace,
)
from wikiprep_spark.sources.mediawiki_xml import parse_page_record, sha256_hex

PARSED_SCHEMA = (
    "seq string, page_id long, title string, title_norm string, ns string, "
    "timestamp string, text string, content_sha256 string, "
    "redirect_target string, ns_ok_prescan boolean, is_template boolean, "
    "parse_error string, text_chars long, record_chars long"
)


def _parse_batch(batch: pd.DataFrame) -> pd.DataFrame:
    site = ENWIKI
    tmpl_prefix = site.template_namespace + ":"
    rows = []
    for repo, path, commit, content in zip(
        batch["repo"], batch["path"], batch["commit"], batch["content"]
    ):
        seq = "%s\x00%s\x00%s" % (repo, path, commit)
        try:
            rec = parse_page_record(content)
        except ValueError as exc:
            # content_sha256 is still the sha of the raw record so the
            # lineage checksum stays comparable with the JVM-side
            # sha2(content) even on dirty dumps
            rows.append(
                (seq, None, None, None, None, None, None,
                 sha256_hex(content), None, False, False, str(exc), 0,
                 len(content))
            )
            continue
        title_norm = normalize_title(rec["title"], None, site)
        ns = page_namespace(rec["title"])
        redirect = parse_redirect(rec["text"])
        if redirect is not None:
            redirect = normalize_title(redirect, None, site)
        rows.append(
            (
                seq,
                rec["id"],
                rec["title"],
                title_norm,
                ns,
                rec["timestamp"],
                rec["text"],
                rec["sha256"],
                redirect,
                is_namespace_ok(ns, site.ok_prescan, site),
                title_norm.startswith(tmpl_prefix),
                None,
                len(rec["text"] or ""),
                len(content),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "seq", "page_id", "title", "title_norm", "ns", "timestamp",
            "text", "content_sha256", "redirect_target", "ns_ok_prescan",
            "is_template", "parse_error", "text_chars", "record_chars",
        ],
    )


def sample_pages(src_pages: DataFrame, fraction: float,
                 seed: int = 42) -> DataFrame:
    """Bernoulli page sampling for building test sets — the reference's
    samplewiki tool (tools/samplewiki/samplewiki.c:26-40), seeded for
    reproducibility."""
    return src_pages.sample(fraction=fraction, seed=seed)


def parse_pages(src_pages: DataFrame) -> DataFrame:
    """src_pages -> parsed page table (one XML parse per row, Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield _parse_batch(batch)

    return src_pages.mapInPandas(gen, schema=PARSED_SCHEMA)


def parse_pages_prescan(src_pages: DataFrame) -> DataFrame:
    """Prescan-projection parse: identical rows, but page text is kept ONLY
    for Template-namespace pages (the only text the dictionary aggregation
    reads).  Arrow-returning the full text column for every page is pure
    transfer cost in the prescan pass of the fused two-pass pipeline."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                out = _parse_batch(batch)
                out.loc[~out["is_template"], "text"] = None
                yield out

    return src_pages.mapInPandas(gen, schema=PARSED_SCHEMA)
