"""Title normalization — mirrors the 17 asserts of the reference's
t/namespace.t plus extras."""

from wikiprep_spark.functions.titles import (
    normalize_namespace_title,
    normalize_title,
    page_namespace,
    percent_encode,
    ucfirst,
)


def test_namespace_t_asserts():
    # t/namespace.t:8-57, 1:1
    assert normalize_title("Sandbox") == "Sandbox"
    assert normalize_title(" Sandbox ") == "Sandbox"
    assert normalize_title("sandBox") == "SandBox"
    assert normalize_title(":Sandbox") == "Sandbox"
    assert normalize_title(": Sandbox") == "Sandbox"
    assert normalize_title("Sandbox", "Template") == "Template:Sandbox"
    assert normalize_title("sandbox", "Template") == "Template:Sandbox"
    assert normalize_title(":sandbox", "Template") == "Sandbox"
    assert normalize_title("Template:Sandbox", "Template") == "Template:Sandbox"
    assert normalize_title("A: Sandbox") == "A: Sandbox"
    assert normalize_title("a: sandbox") == "A: sandbox"
    assert normalize_title("A: Sandbox", "Template") == "Template:A: Sandbox"
    assert normalize_title("Template: A", "Template") == "Template:A"
    assert normalize_title(":Template: A", "Template") == "Template: A"
    assert normalize_title("Template: A") == "Template:A"
    assert normalize_title(":Template: A") == "Template:A"
    assert normalize_title("Kitedge.jpg‎") == "Kitedge.jpg"


def test_whitespace_and_underscores():
    assert normalize_title("Foo_bar") == "Foo bar"
    assert normalize_title("Foo  \t bar") == "Foo bar"
    assert normalize_title("Category:  Births") == "Category:Births"
    assert normalize_title("3001:   The_Final_Odyssey") == "3001: The Final Odyssey"
    assert normalize_title("image:X.png") == "File:X.png"


def test_normalize_namespace_title_parts():
    assert normalize_namespace_title("Category:Foo") == ("Category", "Foo")
    assert normalize_namespace_title("foo") == (None, "Foo")
    assert normalize_namespace_title("Wookieepedia:Bar") == ("Wookieepedia", "Bar")
    # '' default namespace is falsy — colon stripped, ns returned as ''
    ns, title = normalize_namespace_title("Foo", "")
    assert ns == "" and title == "Foo"


def test_page_namespace():
    assert page_namespace("Template:X") == "Template"
    assert page_namespace("Category:Bogus") == "Category"
    assert page_namespace("File:Img.png") == "File"
    assert page_namespace("3001: The Final Odyssey") == ""
    assert page_namespace("Plain") == ""
    assert page_namespace("MemoryAlpha:Test") == ""  # not a dump namespace


def test_ucfirst_and_percent_encode():
    assert ucfirst("") == ""
    assert ucfirst("abc") == "Abc"
    assert percent_encode("A b/c") == "A%20b%2Fc"
    assert percent_encode("xyz09") == "xyz09"
