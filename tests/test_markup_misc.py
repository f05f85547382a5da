"""nowiki masking, css removal, gallery/imagemap, urls, postprocess,
redirect parsing — mirrors t/nowiki.t, t/css.t, t/images.t, t/utils.t."""

from wikiprep_spark.functions import nowiki
from wikiprep_spark.functions.css import remove_metadata
from wikiprep_spark.functions.images import (
    convert_gallery_to_link,
    convert_imagemap_to_link,
    parse_image_parameters,
)
from wikiprep_spark.functions.page import parse_redirect
from wikiprep_spark.functions.postprocess import (
    eliminate_tables,
    encode_xml_chars,
    postprocess_text,
)
from wikiprep_spark.functions.related import (
    remove_duplicates_and_self,
    remove_elements,
)
from wikiprep_spark.functions.urls import extract_urls


def test_nowiki_roundtrip():
    chunks = {}
    text = "a <nowiki>{{x}}</nowiki> b <nowiki>[[y]]</nowiki> c"
    masked = nowiki.extract_tags(nowiki.NOWIKI_RE, text, chunks)
    assert "{{x}}" not in masked and "[[y]]" not in masked
    assert len(chunks) == 2
    assert nowiki.replace_tags(masked, chunks) == text


def test_nowiki_selfclosing_not_matched():
    chunks = {}
    text = "a <nowiki /> b"
    assert nowiki.extract_tags(nowiki.NOWIKI_RE, text, chunks) == text
    assert not chunks


def test_css_removal():
    t = 'x <div class="metadata">junk</div> y'
    assert remove_metadata(t) == "x   y"
    t2 = 'x <span style="a" class="foo dablink bar" id="b">junk</span> y'
    assert remove_metadata(t2) == "x   y"
    t3 = 'x <div class="content">keep</div> y'
    assert remove_metadata(t3) == t3


def test_gallery():
    t = "<gallery>\nImage:A.png|capt A\nFile:B.png|capt B\ntext\n</gallery>"
    out = convert_gallery_to_link(t)
    assert "[[File:A.png|capt A]]" in out
    assert "[[File:B.png|capt B]]" in out
    assert "<gallery>" not in out


def test_imagemap():
    t = ("<imagemap>\nImage:Map.png|300px\n# comment\n"
         "circle 320 315 165 [[w:1|1]]\ndefault [[w:Number|Number]]\n"
         "</imagemap>")
    out = convert_imagemap_to_link(t)
    assert "[[File:Map.png|300px]]" in out
    assert "# comment" not in out
    assert "circle" not in out
    assert "[[w:1|1]]" in out
    assert "[[w:Number|Number]]" in out


def test_image_parameters():
    assert parse_image_parameters(["250px", "thumb", "right", "a caption"]) \
        == "a caption"
    assert parse_image_parameters(["thumb"]) == ""
    assert parse_image_parameters(["alt=foo", "short", "a longer caption"]) \
        == "a longer caption"
    assert parse_image_parameters(["250x250pxpx"]) == ""


def test_parse_redirect_forms():
    # Enwiki.pm:143-157 tolerant forms
    assert parse_redirect("#REDIRECT [[Foo]]") == "Foo"
    assert parse_redirect("#REDIRECT[[Foo]]") == "Foo"
    assert parse_redirect("  #redirect : [[Foo]]") == "Foo"
    assert parse_redirect("#REDIRECTS [[Foo]]") == "Foo"
    assert parse_redirect("#REDIRECTED TO [[Foo]]") == "Foo"
    assert parse_redirect("#REDIRECTION= [[Foo]]") == "Foo"
    assert parse_redirect("\n#Redirect [[Foo]]") == "Foo"
    assert parse_redirect("#REDIRECT [[Foo#Section]]") == "Foo"
    assert parse_redirect("#REDIRECT [[Foo]] trailing") == "Foo"
    assert parse_redirect("text #REDIRECT [[Foo]]") is None
    assert parse_redirect("plain page") is None
    assert parse_redirect(None) is None


def test_extract_urls():
    text = ("See [http://www.cnn.com CNN Web site] and [http://x.org] and "
            "bare http://bare.example.com/a,b rest [Http://bad.example] "
            "[ftp://f.example f] end")
    new_text, links, bare = extract_urls(text)
    assert {"anchor": "CNN Web site", "url": "http://www.cnn.com"} in links
    assert {"url": "http://x.org"} in links
    assert {"url": "http://bare.example.com/a,b"} in links
    assert {"anchor": "f", "url": "ftp://f.example"} in links
    # case-sensitive protocol whitelist: Http:// not extracted
    assert not any("bad.example" in l["url"] for l in links)
    assert "CNN Web site" in new_text
    assert "http://bare.example.com" not in new_text
    assert "bad.example" in new_text
    assert bare == ["http://www.cnn.com", "http://x.org",
                    "ftp://f.example", "http://bare.example.com/a,b"]


def test_remove_duplicates_and_self():
    assert remove_duplicates_and_self([1, 2, 1, 3, 2], None) == [1, 2, 3]
    assert remove_duplicates_and_self([1, 2, 1, 3], 1) == [2, 3]
    assert remove_elements([1, 2, 3, 4], [2, 4]) == [1, 3]


def test_encode_xml_chars():
    assert encode_xml_chars("a&b\"c'd<e>f") == \
        "a&amp;b&quot;c&apos;d&lt;e&gt;f"


def test_eliminate_tables():
    assert eliminate_tables("a<table border=0>junk</table>b") == "a\nb"
    assert eliminate_tables("a{| tab {| nested |} outer |}b") == "a\n \nb" \
        or "nested" not in eliminate_tables("a{| tab {| nested |} outer |}b")
    # '|}}' must not close a table ({{{footnotes|}}} case)
    t = "{| x {{{footnotes|}}} y |}"
    assert eliminate_tables(t) == "\n"


def test_postprocess_basic():
    out = postprocess_text("a<br>b<br />c", [])
    assert out == "a\n\nb\n\nc"
    out = postprocess_text("x {{leftover|tmpl}} y", [])
    assert "{{" not in out
    out = postprocess_text("'''''be''''' '''b''' ''i''", [])
    assert out == "be b i"
    out = postprocess_text("&nbsp;&times;&#945;", [])
    assert out == "   "
    out = postprocess_text("a<math>x^2</math>b", [])
    assert out == "a b"
    out = postprocess_text("keep <ref name=x>this</ref>", [])
    assert out == "keep  this "


def test_postprocess_headings():
    assert postprocess_text("==H1==", []) == "<h1>H1</h1>"
    assert postprocess_text("===H2===", []) == "<h2>H2</h2>"
    assert postprocess_text("====H3====", []) == "<h3>H3</h3>"
    assert postprocess_text("=====H4=====", []) == "<h4>H4</h4>"
    # not at line start -> untouched
    assert postprocess_text(" ==X==", []) == " ==X=="


def test_postprocess_markers():
    out = postprocess_text(".pAriD=~7~.anchor.pArenD.", [])
    assert out == '<a id="7">anchor</a>'
    iw = [("Wookieepedia", "Luke")]
    out = postprocess_text(".pAriD=~!0~.luke.pArenD.", iw)
    assert out == '<w namespace="Wookieepedia" title="Luke">luke</w>'
    # anchor mode (interwiki=None): markers stripped, no xml encoding
    out = postprocess_text(".pAriD=~7~.an & chor.pArenD.", None)
    assert out == "an & chor"
