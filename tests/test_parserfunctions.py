"""Parser functions — mirrors t/parserfunction.t (22 asserts)."""

from wikiprep_spark.functions.parserfunctions import PARSER_FUNCTIONS


def test_padleft():
    pf = PARSER_FUNCTIONS["padleft"]
    assert pf(None, 0, "") == ""
    assert pf(None, 0, "xyz") == "xyz"
    assert pf(None, 0, "xyz", "5") == "00xyz"
    assert pf(None, 0, "xyz", "5", "_") == "__xyz"
    assert pf(None, 0, "xyz", "5", "abc") == "abxyz"
    assert pf(None, 0, "xyz", "2") == "xyz"
    assert pf(None, 0, "", "1", "xyz") == "x"
    assert pf(None, 0, "xyz", "a") == "xyz"
    assert pf(None, 0, "xyz", " 05 ") == "00xyz"
    assert pf(None, 0, "xyz", " 05a ") == "00xyz"
    assert pf(None, 0, "xyz", " a05 ") == "xyz"


def test_padright():
    pf = PARSER_FUNCTIONS["padright"]
    assert pf(None, 0, "") == ""
    assert pf(None, 0, "xyz") == "xyz"
    assert pf(None, 0, "xyz", "5") == "xyz00"
    assert pf(None, 0, "xyz", "5", "_") == "xyz__"
    assert pf(None, 0, "xyz", "5", "abc") == "xyzab"
    assert pf(None, 0, "xyz", "2") == "xyz"
    assert pf(None, 0, "", "1", "xyz") == "x"
    assert pf(None, 0, "xyz", "a") == "xyz"
    assert pf(None, 0, "xyz", " 05 ") == "xyz00"
    assert pf(None, 0, "xyz", " 05a ") == "xyz00"
    assert pf(None, 0, "xyz", " a05 ") == "xyz"


def test_padding_cap():
    pf = PARSER_FUNCTIONS["padleft"]
    assert len(pf(None, 0, "", "9999")) == 500  # ParserFunction.pm:264
