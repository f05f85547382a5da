"""Fixture corpora for end-to-end golden tests.

Each corpus mirrors one of the reference's end-to-end minidumps
(/root/reference/t/cases/*.xml); the expected outputs in
test_golden_pipeline.py are derived from the corresponding .vetted golden
files. Page dicts carry (id, title, text[, timestamp]).
"""

TS = "2007-06-06T23:05:07Z"


def _p(pid, title, text):
    return {"id": pid, "title": title, "text": text, "timestamp": TS}


# t/cases/anchors.xml — image captions, glued anchors, nesting, newlines,
# category links, external link inside an anchor.
ANCHORS = [
    _p(1, "Gu",
       "[[Image:Hello1.jpg|Lepa slika]] nekaj teksta in se ena "
       "[[Image:Hello1.jpg|druga slika]]. Pa se en link kar tako "
       "[[Image:Hello2.jpg|right|krneki]]. Pa se en link na [[Ga]] brez "
       "anchorja. [[Image:Hello1.jpg]]"),
    _p(2, "Ga",
       "[[Image:Hello1.jpg|grda slika]] nekaj teksta in se ena "
       "[[Image:Hello1.jpg|prva slika]]. Pa se en link kar tako "
       "[[Image:Hello2.jpg|right|krneki]]"),
    _p(3, "Sony",
       "\n      [[Image:Sony VAIO FJ76.JPG|thumb|right|A Sony Vaio FJ series"
       " without webcam]]Sony is expanding the... [[Ga|gulp]]gagluedanchor"
       "\n      "),
    _p(4, "Test2",
       "\n\t      [[Dummy]]\n\t      [[Dummy|Dummy2]]\n\t      "
       "[[Nested|Nested [[anchors]] and some [[more]]]]\n\t      "
       "[[Sony|With an [http://example.com external link] ]]\n\t      "
       "[[Sony|With\nnewline and\ttab]]\n\n\t      "
       "[[Category:Bogus|This should be invisible]]\n      "),
    _p(5, "Nested", "\n             Foo\n      "),
    _p(6, "Anchors", "\n             Foo\n      "),
    _p(7, "More", "\n             Foo\n      "),
    _p(8, "Category:Bogus", "\n      "),
]

# t/cases/dates.xml — all date-link forms.
DATES = [
    _p(1, "A",
       "\n[[October 15]], [[1982]]\n[[15 October]] [[1982]]\n"
       "[[1982]]-[[10-15]]\n[[1982-10-15]]\n[[October 15, 1982]]\n\n"
       "[[July 4]], [[2000]]\n[[4 July]], [[2000]]\n[[2000]]-[[7-4]]\n"
       "[[2000]]-[[07-04]]\n[[2000-7-4]]\n[[2000-07-04]]\n\n"
       "[[October 16]], [[1983]]\n[[16 October]] [[1983]]\n"
       "[[1983]]-[[10-16]]\n[[1983-10-16]]\n\n"
       "[[15October]] [[1982]]\n[[5 October]] [[1982]]\n"
       "[[October 5]] [[1982]]\n\t    "),
    _p(2, "October 15", "Foo"),
    _p(3, "1982", "Foo"),
    _p(4, "October 15, 1982", "Foo"),
    _p(5, "2000", "Foo"),
    _p(6, "October 5", "Foo"),
]

# t/cases/dblredir.xml shape — A -> B -> C chain plus a linking page:
# the link through a double redirect is dropped, single redirect resolves.
DBLREDIR = [
    _p(1, "Mac OS X", "The operating system."),
    _p(2, "Mac OS X 10", "#REDIRECT [[Mac OS X]]"),
    _p(3, "Linker", "Go to [[Mac OS X 10|Mac OS X]] now."),
    _p(4, "Mac OS X 10.4", "#REDIRECT [[Mac OS X 10]]"),
    _p(5, "Linker2", "Go to [[Mac OS X 10.4]] now."),
]

# t/cases/redir.xml — tolerant redirect forms.
REDIR = [
    _p(1, "Redir1", "#REDIRECT[[Dest]]"),
    _p(2, "Redir2", " #REDIRECT [[Dest]] "),
    _p(3, "Redir3", "#Redirect:[[Dest]]"),
    _p(4, "Redir with newlines", "\n#REDIRECT [[Dest]]"),
    _p(5, "Redir with trailing text",
       "#REDIRECT [[Dest]]\n      \nSome text here that should be ignored."),
    _p(100, "Dest", "Destination page."),
]

# t/cases/tempredir shape — a redirect pointing at a template is excluded
# from the redirects output and routed to the template index.
TEMPREDIR = [
    _p(1, "Template:Target", "body"),
    _p(2, "Template:Alias", "#REDIRECT [[Template:Target]]"),
    _p(3, "User", "{{alias}}"),
]

# t/cases/categories.xml
CATEGORIES = [
    _p(100, "Category:Guano", "[[Category:Gu]] [[Category:Blah]]"),
    _p(2, "Category:Gu", "{{urlencode:Something   dddd}}."),
    _p(3, "Category:Blah", "{{urlencode:Something   dddd}}."),
    _p(4, "Category:X", "[[Category:Blah]]."),
    _p(5, "Page",
       "\nThese are proper article categories: [[Category:Blah]] "
       "[[Category:Gu|Gu]]\nThese are just links to categories: "
       "[[:Category:X]] [[:Category:Guano|Guano]]\n      "),
]

# t/cases/related.xml
RELATED = [
    _p(1, "A", "\n\t    "),
    _p(2, "B", "\n\t    "),
    _p(3, "C", "\n\t    "),
    _p(4, "Standalone", "\n: Further information [[A]]\n\t    "),
    _p(5, "Standalone not",
       "\nThere is some further information at the [[A]] page\n\t    "),
    _p(6, "Inline", "\nLorem ipsum dolor sit amet, (See also [[B]]) "
       "consectetuer adipiscing elit.\n\t    "),
    _p(7, "Inline not", "\nSee [[B]]\n\t    "),
    _p(8, "Section",
       "\n===See also===\n\n* [[C]], official page\n* [[B]]\n\t    "),
    _p(9, "Section not",
       "\n===Something===\n* [[C]], official page\n* [[B]]\n\t    "),
]

# t/cases/disambig.xml
DISAMBIG = [
    _p(1, "A (disambiguation)",
       " \n * [[A1|T\ta\tb]]\n * [[A2]]\n * [[A3]]\n      "),
    _p(2, "B", " \n # [[B1]]\n # [[B2]]\n # [[B3]]\n\n {{dab}}\n      "),
    _p(3, "C",
       " \n ** [[C1]]\n ** [[C2]]\n ** [[C3]]\n\n {{hndis|John Titor}}\n   "),
    _p(4, "D", " \n ** [[D1]]\n ** [[D2]]\n ** [[D3]]\n\n {{hndisaa}}\n    "),
    _p(5, "E", " \n{{dab}}\n      "),
    _p(6, "F",
       " \n * Something without a link\n\nUnrelared [[link]]\n\n"
       "{{surname}}\n      "),
]

# t/cases/externalurls.xml
EXTERNALURLS = [
    _p(1, "A",
       "\n\t\t    1. [http://1.example.com]\n\n"
       "\t\t    2. [ http://2.example.com] (but implicit)\n"
       "\t\t    3. [Http://3.example.com]\n"
       "\t\t    4. [HTTP://4.example.com]\n\n"
       "\t\t    5. [http://6.example.com some text]\n"
       "\t\t    6. [http://7.example.com some text ]\n"
       "\t\t    7. [mailto:tomaz@example.com mail me]\n\n"
       "\t\t   7b. [http://www.youtube.com/user/BikerMice2006'BikerMice "
       "2006'']\n\n"
       "\t\t    8. [http://5.example.com|some text]\n"
       "\t\t    9. [http://8.example.com some [[text]] ]\n"
       "\t\t   12. [http://11.example.com some\n\t\t       text]\n\n"
       "\t\t   13. http://12.example.com\n\t    "),
]

# t/cases/interwiki.xml
INTERWIKI = [
    _p(1, "A",
       "\n\t\t    {{memoryalpha}}\n\t\t    [[  MemoryAlpha: Test ]]\n"
       "\t\t    [[MemoryAlpha:Test|Test]]\n"
       "\t\t    [[MemoryAlpha:  category:  education]]\n"
       "\t\t    [[MemoryAlpha:test|]]\n"
       "\t\t    [[wowwiki:Sword of a Thousand Truths|Sword]]\n\t    "),
    _p(1090150, "Template:Memoryalpha",
       "* [[MemoryAlpha:{{{1|{{PAGENAME}}}}}|{{{2|{{{1|{{PAGENAME}}}}}}}}]] "
       "article at [[Memory Alpha]], a [[Star Trek]] [[wiki]]<noinclude>\n\n"
       "{{pp-template|small=yes}}\n"
       "[[Category:External link templates|{{PAGENAME}}]]\n"
       "[[Category:Star Trek templates|{{PAGENAME}}]]\n\n"
       "[[de:Vorlage:Memory Alpha]]\n[[es:Plantilla:Memoryalpha]]\n"
       "</noinclude>"),
]

ALL = {
    "anchors": ANCHORS,
    "dates": DATES,
    "dblredir": DBLREDIR,
    "redir": REDIR,
    "tempredir": TEMPREDIR,
    "categories": CATEGORIES,
    "related": RELATED,
    "disambig": DISAMBIG,
    "externalurls": EXTERNALURLS,
    "interwiki": INTERWIKI,
}
