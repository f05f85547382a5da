"""Distributed pipeline == sequential oracle, on the synthetic corpus.

Runs the full Spark pipeline over a small deterministic corpus and checks
(1) the distributed prescan/transform produce exactly the sequential
reference semantics, and (2) spot analytic expectations from the corpus
construction rules.
"""

import hashlib

import pytest

from wikiprep_spark.functions.edges import (
    anchor_rows,
    category_rows,
    link_rows,
    related_rows,
)
from wikiprep_spark.functions.page import TransformEnv, transform_one
from wikiprep_spark.functions.prescan import prescan_pages
from wikiprep_spark.plans.pipeline import run_pipeline
from wikiprep_spark.sources.corpus import build_src_pages
from wikiprep_spark.sources.mediawiki_xml import parse_page_record

LIMIT = 60
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return build_src_pages(spark, SF_DIR, limit=LIMIT).cache()


@pytest.fixture(scope="module")
def result(spark, corpus):
    return run_pipeline(spark, corpus)


@pytest.fixture(scope="module")
def sequential(corpus):
    rows = corpus.select("repo", "path", "commit", "content").collect()
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    pages = [parse_page_record(r["content"]) for r in rows]
    pre = prescan_pages(pages)
    env = TransformEnv(pre["title2id"], pre["redir"], pre["templates"])
    results = [transform_one(p, env) for p in pages]
    return pre, results


def test_sha256_invariant(corpus, result):
    expected = {
        hashlib.sha256(r["content"].encode()).hexdigest()
        for r in corpus.select("content").collect()
    }
    got = {r["content_sha256"] for r in result["parsed"].collect()}
    assert got == expected


def test_prescan_matches_sequential(result, sequential):
    pre, _ = sequential
    t2i = {r["title_norm"]: r["page_id"]
           for r in result["title2id"].collect()}
    assert t2i == pre["title2id"]
    red = {r["from_title"]: r["to_title"]
           for r in result["redirects_raw"].collect()}
    assert red == pre["redir"]
    bodies = {r["template_id"]: r["body"]
              for r in result["template_bodies"].collect()}
    assert bodies == pre["templates"]


def test_edges_match_sequential(result, sequential):
    _, seq_results = sequential
    ok = [r for r in seq_results if "text" in r]

    def flat(fn):
        out = []
        for r in ok:
            out.extend(fn(r))
        return set(out)

    got_anchors = {
        (r["target_id"], r["source_id"], r["loc"], r["anchor_text"])
        for r in result["anchors"].collect()
    }
    assert got_anchors == flat(anchor_rows)

    got_links = {(r["source_id"], r["target_id"])
                 for r in result["links"].collect()}
    assert got_links == flat(link_rows)

    got_cats = {(r["page_id"], r["category_id"])
                for r in result["categories"].collect()}
    assert got_cats == flat(category_rows)

    got_related = {(r["page_id"], r["related_id"])
                   for r in result["related"].collect()}
    assert got_related == flat(related_rows)


def test_analytic_expectations(result):
    n = LIMIT
    links = {(r["source_id"], r["target_id"])
             for r in result["links"].collect()}
    # article 2: j1=(7*2+1)%60=15, j2=(13*2+3)%60=29
    assert (1002, 1015) in links and (1002, 1029) in links
    # article 0 dead-links through the double redirect: no (1000, 1000+x)
    # from the [[Double 0]] link (Redirect 0 -> Doc 0 would be a self link
    # anyway); check the redirect-mediated link of article 1:
    # jr(1) = 5*((11*1+2) % 12) = 5*1 = 5 -> Doc 5
    assert (1001, 1005) in links

    cats = {(r["page_id"], r["category_id"])
            for r in result["categories"].collect()}
    assert (1003, 103) in cats  # article 3 -> Topic 3
    assert (1004, 110) in cats  # article 4 -> Even4
    assert (103, 120) in cats   # category hierarchy

    pages = {r["page_id"]: r for r in result["pages"].collect()}
    assert pages[1007]["is_stub"] == 1  # 7 % 7 == 0
    assert pages[1001]["is_stub"] == 0
    # templates were expanded: infobox text present
    assert "Info: Doc 2 (Topic 2) number N2." in pages[1002]["text"]
    # odd articles went through the Template:Ibox redirect
    assert "Info: Doc 3 (Topic 3) number N3." in pages[1003]["text"]

    iw = {(r["page_id"], r["namespace"], r["title"])
          for r in result["interwiki"].collect()}
    assert (1008, "Memoryalpha", "Doc 8") in iw

    ext = {(r["source_id"], r["url"], r["anchor"])
           for r in result["external"].collect()}
    assert (1006, "http://example.org/doc/6", "homepage 6") in ext
    assert (1006, "http://data.example.com/6", None) in ext

    rr = {(r["from_id"], r["from_title"], r["to_id"], r["to_title"])
          for r in result["redirect_records"].collect()}
    assert ("unknown", "Redirect 5", "1005", "Doc 5") in rr
    assert ("unknown", "Double 0", "unknown", "Redirect 0") in rr
    # template redirect routed to the index, not the redirect records
    assert not any(r[1] == "Template:Ibox" for r in rr)
    tr = {(r["template_id"], r["alias_title"])
          for r in result["template_redirects"].collect()}
    assert (11, "Template:Ibox") in tr

    dis = {(r["disambig_id"], r["line_no"], r["target_id"])
           for r in result["disambig"].collect()}
    assert (1000 + 3 * n + 0, 0, 1000) in dis
    assert (1000 + 3 * n + 0, 1, 1003) in dis

    ti = {(r["page_id"], r["template_id"], r["param"])
          for r in result["template_inclusions"].collect()}
    assert (1002, 11, "name") in ti and (1003, 11, "num") in ti
    assert (1007, 12, None) in ti and (1007, 13, None) in ti  # stub + asof

    triples = result["triples"].groupBy("pred").count().collect()
    assert {r["pred"] for r in triples} >= {
        "links_to", "anchored_by", "in_category", "redirects_to",
        "related_to", "disambiguates", "links_external", "includes_template",
    }


def test_triples_single_scan_equivalence(result):
    """triples_from_transformed (one scan) must equal triples_view (8-pass
    per-edge derivation) as a multiset."""
    from wikiprep_spark.operators import edges as edge_ops

    eight_pass = edge_ops.triples_view(
        result["links"],
        result["anchors"],
        result["categories"].select("page_id", "category_id"),
        result["redirect_records"],
        result["related"].select("page_id", "related_id"),
        result["disambig"],
        result["external"],
        result["template_inclusions"],
    )
    a = sorted(map(tuple, result["triples"].collect()))
    b = sorted(map(tuple, eight_pass.collect()))
    assert a == b
