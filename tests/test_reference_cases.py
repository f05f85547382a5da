"""Byte-exact golden tests against the reference's own vetted outputs.

Mirrors /root/reference/t/cases.t: run every default-format case dump
through the transform kernel and diff against <case>.hgw.xml.vetted /
<case>.anchor_text.vetted.  Unlike the hand-transcribed corpora in
tests/corpora.py, these read the reference's actual test data, so they
cover the heavyweight realistic pages (intel, microsoft, tibet, olympics,
riemann...) where composed template expansion diverges first.
"""

import pytest

from tests import reference_cases as rc

pytestmark = pytest.mark.skipif(
    not rc.cases_available(), reason="reference cases dir not present"
)


@pytest.mark.parametrize("name", rc.HGW_CASES)
def test_hgw_case(name):
    _, results = rc.run_case(name)
    emitted = [r for r in results if "text" in r]
    vetted = rc.load_vetted_hgw(name)
    assert len(emitted) == len(vetted), (
        f"{name}: emitted {len(emitted)} pages, vetted has {len(vetted)}"
    )
    for result, expect in zip(emitted, vetted):
        probs = rc.hgw_mismatches(result, expect)
        assert not probs, f"{name} page {expect['id']}: {probs}"


@pytest.mark.parametrize("name", rc.GUM_CASES)
def test_gum_case(name):
    _, results = rc.run_case(name)
    emitted = [r for r in results if "text" in r]
    vetted = rc.load_vetted_gum(name)
    assert len(emitted) == len(vetted), (
        f"{name}: emitted {len(emitted)} pages, vetted has {len(vetted)}"
    )
    for result, expect in zip(emitted, vetted):
        probs = rc.gum_mismatches(result, expect)
        assert not probs, f"{name} page {expect['id']}: {probs}"


@pytest.mark.parametrize("name", rc.ANCHOR_CASES)
def test_anchor_case(name):
    _, results = rc.run_case(name)
    got = []
    for r in results:
        if "text" in r:
            got.extend(rc.page_anchor_rows(r))
    assert got == rc.load_vetted_anchor_text(name), f"{name}: anchor rows"


def test_window_disambig():
    # window.disambig.vetted — Legacy._logDisambig: one output line per
    # disambig list line, "pid \t target-or-undef \t anchor" per anchor
    _, results = rc.run_case("window")
    got = []
    for r in results:
        if not r.get("isDisambig"):
            continue
        for group in r.get("disambigLinks", ()):
            parts = [str(r["id"])]
            for a in group:
                tid = a.get("targetId")
                parts.append("undef" if tid is None else str(tid))
                parts.append(a["anchorText"].replace("\t", " "))
            got.append("\t".join(parts))
    with open(f"{rc.CASES_DIR}/window.disambig.vetted",
              encoding="utf-8") as fh:
        lines = [ln.rstrip("\n") for ln in fh
                 if ln.strip() and not ln.startswith("#")]
    assert got == lines
