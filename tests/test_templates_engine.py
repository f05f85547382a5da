"""Template machinery — mirrors t/templates.t (41 asserts) and adds engine
end-to-end checks."""

from wikiprep_spark.functions.page import TransformEnv
from wikiprep_spark.functions.templates import (
    ExpansionContext,
    include_templates,
    preprocess_template_body,
)
from wikiprep_spark.functions.tmplscan import (
    parse_template_invocation,
    split_on_templates,
    split_template_invocation,
    template_parameter_recursion,
)


def _params(text):
    raw = split_template_invocation(text)
    name = raw[0]
    return name, raw[1:], parse_template_invocation(raw[1:])


def test_parameter_recursion_basic():
    # t/templates.t:6-12
    assert template_parameter_recursion(
        "{{{1}}}", {"1": "a", "2": "b", "3": "c"}) == "a"


def test_parameter_recursion_nested():
    # t/templates.t:15-19
    text = ("Hello, {{#if:blah|true|}}} {{{1|{{#if:{{{2}}}|{{{2}}}|"
            "{{#if:{{{3}}}|some more}}}} }}}! "
            "{{#if:{{{3|\n}}}|{{blah}}|{{blah2}}}}")
    out = template_parameter_recursion(text, {"1": "a", "2": "b", "3": "c"})
    assert out == "Hello, {{#if:blah|true|}}} a! {{#if:c|{{blah}}|{{blah2}}}}"


def test_parameter_recursion_nested_defaults():
    # t/templates.t:22-28
    text = ("Hello, {{#if:blah|true|}}} {{{1|{{#if:{{{2}}}|{{{2}}}|"
            "{{#if:{{{3}}}|some more}}}} }}}! "
            "{{#if:{{{3|\n}}}|{{blah}}|{{blah2}}}}")
    out = template_parameter_recursion(text, {"2": "b", "3": "c"})
    assert out == ("Hello, {{#if:blah|true|}}} "
                   "{{#if:b|b|{{#if:c|some more}}}} ! "
                   "{{#if:c|{{blah}}|{{blah2}}}}")


def test_parameter_recursion_link_default():
    # t/templates.t:31-37
    text = (":''Further information: [[{{{1|[[Example]]}}}]]"
            "{{#if: {{{3|}}}|,}}{{#if: {{{2{{{3|}}}|}}}|&amp;nbsp;and}}")
    out = template_parameter_recursion(text, {"1": "Foo"})
    assert out == (":''Further information: [[Foo]]"
                   "{{#if: |,}}{{#if: |&amp;nbsp;and}}")


def test_invocation_simple():
    # t/templates.t:41-54
    name, raw, params = _params("simple|a|b=c|d = e")
    assert name == "simple"
    assert raw == ["a", "b=c", "d = e"]
    assert params["1"] == "a"
    assert params["b"] == "c"
    assert params["d"] == "e"


def test_invocation_complex():
    # t/templates.t:56-69
    name, raw, params = _params(
        "complex|[[link|anchor]]|{{nested|{{template|p}}\n|blah}}|bare_param")
    assert name == "complex"
    assert raw == ["[[link|anchor]]", "{{nested|{{template|p}}\n|blah}}",
                   "bare_param"]
    assert params["1"] == "[[link|anchor]]"
    assert params["2"] == "{{nested|{{template|p}}\n|blah}}"
    assert params["3"] == "bare_param"


def test_invocation_infobox_unmatched_bracket():
    # t/templates.t:71-82 — an unmatched '[' in a URL swallows the rest
    text = ("Infobox_University\n|name          = Uppsala University\n"
            "|website       = http://www.uu.se/[\n|enrollment = 30,450\n")
    name, raw, params = _params(text)
    assert name == "Infobox_University"
    assert params.get("website") != "http://www.uu.se/"


def test_invocation_empty_positional():
    # t/templates.t:84-101
    name, raw, params = _params(
        "about||the Alicante wine region|Alicante (DO)|"
        "the Spanish [[provincia]]|Alicante (province)")
    assert name == "about"
    assert raw[0] == ""
    assert params["1"] == ""
    assert params["2"] == "the Alicante wine region"
    assert params["3"] == "Alicante (DO)"
    assert params["4"] == "the Spanish [[provincia]]"
    assert params["5"] == "Alicante (province)"


def test_invocation_selfref():
    # t/templates.t:118-150 — nested side box with image links inside
    text = ("selfref|{{side box\n| position = {{{position|}}}\n"
            "| image    = [[Image:Office-book.svg|30px|alt=Wikipedia Books"
            "|link=Wikipedia:Books]]\n| text     = x\n}}|inline\n")
    name, raw, params = _params(text)
    assert name == "selfref"
    assert raw[1] == "inline"
    assert params["2"] == "inline"


def test_split_on_templates():
    assert split_on_templates("a {{t|x}} b") == ["a ", "t|x", " b"]
    assert split_on_templates("") == [""]
    assert split_on_templates("{{a}}{{b}}") == ["", "a", "", "b", ""]
    assert split_on_templates("no templates") == ["no templates"]
    assert split_on_templates("{{unterminated") == ["{{unterminated"]
    # {{{3}}} parses as invocation "{3}" (handled as unknown template)
    assert split_on_templates("x{{{3}}}y") == ["x", "{3}", "y"]
    assert split_on_templates("{{a{{b}}c}}") == ["", "a{{b}}c", ""]


def test_preprocess_template_body():
    # Templates.pm:41-86
    assert preprocess_template_body("a<noinclude> hidden</noinclude>b") == "ab"
    assert preprocess_template_body("a<noinclude> unterminated") == "a"
    assert preprocess_template_body(
        "a<includeonly>kept</includeonly>b") == "akeptb"
    assert preprocess_template_body(
        "junk<onlyinclude>A</onlyinclude>mid<onlyinclude>B</onlyinclude>junk"
    ) == "A\nB\n"
    assert preprocess_template_body("x<!-- comment -->y") == "xy"


def _ctx(templates_by_title, title2id=None, redir=None, page_title="Test"):
    t2i = dict(title2id or {})
    bodies = {}
    for i, (t, body) in enumerate(templates_by_title.items(), start=1000):
        t2i[t] = i
        bodies[i] = preprocess_template_body(body)
    env = TransformEnv(title2id=t2i, redir=redir or {}, templates=bodies)
    page = {"id": 1, "title": page_title, "templates": {}}
    return ExpansionContext(page, env), page


def test_simple_transclusion_with_params():
    ctx, page = _ctx({"Template:Greet": "Hello {{{1|world}}}{{{punct|}}}"})
    assert include_templates(ctx, "{{greet|Bob|punct=!}}", 0) == "Hello Bob!"
    assert include_templates(ctx, "{{greet}}", 0) == "Hello world"
    assert 1000 in page["templates"]
    assert page["templates"][1000][0] == {"1": "Bob", "punct": "!"}


def test_unknown_template_becomes_space():
    ctx, _ = _ctx({})
    assert include_templates(ctx, "a{{nosuch|x}}b", 0) == "a b"


def test_template_redirect_resolution():
    ctx, _ = _ctx({"Template:Real": "R"},
                  redir={"Template:Alias": "Template:Real"})
    assert include_templates(ctx, "{{alias}}", 0) == "R"


def test_recursive_transclusion_capped():
    ctx, _ = _ctx({"Template:Loop": "x{{loop}}"})
    out = include_templates(ctx, "{{loop}}", 0)
    # levels 0..10 each expand once (cap at 10, Config.pm:21); the final
    # {{loop}} stays un-instantiated and is removed later by postprocess
    assert out.count("x") == 11
    assert out.endswith("{{loop}}")


def test_nowiki_masks_invocations():
    ctx, _ = _ctx({"Template:T": "EXPANDED"})
    out = include_templates(ctx, "<nowiki>{{T}}</nowiki> {{T}}", 0)
    assert out == "<nowiki>{{T}}</nowiki> EXPANDED"


def test_level0_param_refs_stripped():
    ctx, _ = _ctx({"Template:T": "[{{{1}}}]"})
    # {{{1}}} inside the invocation in the page body is removed first
    assert include_templates(ctx, "{{T|a{{{junk}}}b}}", 0) == "[ab]"


def test_magic_words_and_parser_functions():
    ctx, _ = _ctx({}, page_title="My Page")
    assert include_templates(ctx, "{{PAGENAME}}", 0) == "My Page"
    assert include_templates(ctx, "{{#if:x|yes|no}}", 0) == "yes"
    assert include_templates(ctx, "{{#if:|yes|no}}", 0) == "no"
    assert include_templates(ctx, "{{#ifeq:a|a|same|diff}}", 0) == "same"
    assert include_templates(ctx, "{{#ifeq:a|b|same|diff}}", 0) == "diff"
    assert include_templates(ctx, "{{#switch:b|a=1|b=2|c=3}}", 0) == "2"
    assert include_templates(ctx, "{{#switch:x|a=1|fallback}}", 0) == "fallback"
    assert include_templates(ctx, "{{#switch:x|a=1|#default=d|b=2}}", 0) == "d"
    assert include_templates(ctx, "{{#switch:a|a|b=both}}", 0) == "both"
    assert include_templates(ctx, "{{#language:sl}}", 0) == "Slovenščina"
    assert include_templates(ctx, "{{#language:xx-bogus}}", 0) == "xx-bogus"
    assert include_templates(ctx, "{{urlencode:a b}}", 0) == "a%20b"
    assert include_templates(ctx, "{{lc:ABC}}", 0) == "abc"
    assert include_templates(ctx, "{{ucfirst:abc}}", 0) == "Abc"
    assert include_templates(ctx, "{{int:Lang}}", 0) == "en"
    assert include_templates(ctx, "{{SERVER}}", 0) == "http://wikiprep.example.com"
    # unknown #function falls back to its first pipe parameter
    assert include_templates(ctx, "{{#time:fmt|arg}}", 0) == "arg"
    assert include_templates(ctx, "{{#expr:1+2}}", 0) == ""


def test_long_invocation_dropped():
    ctx, _ = _ctx({})
    assert include_templates(ctx, "{{x" + "y" * 40000 + "}}", 0) == ""


def test_override_template():
    ctx, _ = _ctx({})
    assert include_templates(ctx, "{{int:lang}}", 0) == "lang"  # not 'Lang'
    assert include_templates(ctx, "{{Int:Lang}}", 0) == "en"  # override table
