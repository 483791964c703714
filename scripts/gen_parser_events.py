#!/usr/bin/env python3
"""Generate the parser_events.json differential golden.

Runs this container's CPython 3.11 stdlib html.parser.HTMLParser
(convert_charrefs=True — the mode BeautifulSoup's HTMLParserTreeBuilder
uses, which is what the reference drives for every page:
/root/reference/processing/content_processor.py:22) over a corpus of
hand-picked edge cases plus seeded fuzz strings, and records the exact
event stream (starttag/startendtag/endtag/data/comment/decl/pi/
unknown_decl) or the fact that the parser REJECTED the markup
(AssertionError out of _markupbase — bs4 surfaces that as
ParserRejectedMarkup, and the reference's per-page try/except marks the
page failed).

The Scala side (graft.html.HtmlParser event-sink mode) must reproduce
every stream byte-for-byte: ParserEventsSpec.

Regenerate with:  python3 scripts/gen_parser_events.py
Writes:           src/test/resources/golden/parser_events.json
"""
import json
import os
import random
from html.parser import HTMLParser


class Recorder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.ev = []

    def handle_starttag(self, tag, attrs):
        self.ev.append(["starttag", tag, [[k, v] for k, v in attrs]])

    def handle_startendtag(self, tag, attrs):
        self.ev.append(["startendtag", tag, [[k, v] for k, v in attrs]])

    def handle_endtag(self, tag):
        self.ev.append(["endtag", tag])

    def handle_data(self, data):
        self.ev.append(["data", data])

    def handle_comment(self, data):
        self.ev.append(["comment", data])

    def handle_decl(self, data):
        self.ev.append(["decl", data])

    def handle_pi(self, data):
        self.ev.append(["pi", data])

    def unknown_decl(self, data):
        self.ev.append(["unknown_decl", data])


def run_case(s):
    p = Recorder()
    try:
        p.feed(s)
        p.close()
        return {"input": s, "events": p.ev}
    except AssertionError:
        return {"input": s, "rejected": True}


HAND = [
    # --- unterminated comments / EOF resync ---
    "<!-- x",
    "<!-- x >",
    "<!-- x > y <b>z</b>",
    "<!-->",
    "<!--->t",
    "<!---->t",
    "<!-- a -- >b",
    "<!-- a -- >b",
    "<!-- a --->b",
    "<!-- &amp; > x",
    "<!-- &amp; x",
    # --- PI / declarations ---
    "<?",
    "<?x",
    "<?php echo",
    "<?php echo 'a'; ?>tail",
    "<!",
    "<!x",
    "<!x y",
    "<!doctype html>x",
    "<!DOCTYPE html><p>y</p>",
    "<!doctype html",
    "<! doctype html>x",
    "<!DOCTYPEhtml>x",
    "<!foo bar>x",
    "<!>x",
    # --- marked sections ---
    "<![CDATA[x]]>t",
    "<![CDATA[a > b]]>t",
    "<![CDATA[a ] ] >t",
    "<![CDATA[a] ] >t",
    "<![cdata[x]]>t",
    "<![CDATA [x]]>t",
    "<![CDATA[x]]]>t",
    "<![if gte mso 9]>x<![endif]>y",
    "<![if !(IE 7)]>a<![endif]>b",
    "<![IGNORE[z]]>t",
    "<![INCLUDE[a]]>t",
    "<![RCDATA[q]]>t",
    "<![TEMP[t]]>u",
    "<![else]>t",
    "<![endif ]>t",
    "<![CDATA",
    "<![CDATA[x",
    "<![if x]>a",
    "<![foo]>x",       # unknown keyword: REJECTED
    "<![ ]>x",         # no name token: REJECTED
    "<![0]>x",         # no name token: REJECTED
    "<![]]>x",         # no name token: REJECTED
    "<![",
    # --- start tags: unterminated / bogus / unicode ws ---
    "<a href='x'",
    "<a href='x' id=2>t</a>",
    '<a href="x > y <b>bold</b>',
    "<a href='x > y' id=2>t</a>",
    "<a b=1 b=2>t</a>",
    "<a x='1'=y>z</a>",
    "<a x='1' ?>tail",
    "<a href=x>t",
    "<a href = x>y</a>",
    "<divclass=c>t</div>",
    "<a =x>t",
    "<a ==>t",
    "<a = = >t",
    "<a x=1/>t",
    "<a x=1/ >t",
    "<a /x>t",
    "<a//>t",
    "<a/ >t",
    "<a / >t",
    "<p x='a&amp;b'>t</p>",
    "<p x=a&amp;b>t</p>",
    "<a x = = 'v'>t</a>",
    "<a 'q'>t",
    '<a "q">t',
    "<a$>t",
    "<a$ b=c>t",
    "<a b c>t</a>",
    "<a b/c>t</a>",
    "<a b=>x",
    "<a b= >x",
    "<a b=c>x",
    "<a　b=c>x",
    "<a b='c'd='e'>x",
    '<a b="c"d=e>x',
    "<a b=c=d>x",
    "<a-b c=d>x",
    "<a0 b=d>x",
    "<abc",
    "<abc ",
    "<abc x",
    "<abc x=",
    "<abc x='",
    '<abc x="y',
    "<a x='y'",
    "<a x='y' ",
    "<a x='y'/",
    "<a><b x=`1`>t</b></a>",
    "<a x= y>t",
    # NUL drives the bogus-start-tag data path; VT/FS/NBSP are Python \\s
    # in attr scanning but NOT excluded from tag names
    "<a\x00 b>x",
    "<a\x00>x",
    "<p>a\x00b</p>",
    "<a b=c\x00d>x",
    "<a b='c'\x00d>x",
    "<a\x0bb=c>x",
    "<a \x0bb=c>x",
    "<a b\x0b=c>x",
    "<a b=\x0bc>x",
    "<a b='c'\x0bd=e>x",
    "<a \x1cb=c>x",
    "<a b=c\xa0d=e>x",
    "<a b\xa0=\xa0c>x",
    "<a b='c'\xa0d='e'>x",
    "<a b=c d=e>x",
    "</p\x0b>x",
    "<p>a</p\xa0>b",
    "<!DOCTYPE html [ <!ELEMENT foo (bar)> ]>x",
    "<!DOCTYPE html PUBLIC '-//W3C//DTD HTML 4.01//EN'>x",
    # --- end tags ---
    "</di",
    "</di <b>x</b>",
    "</ di>x",
    "</d >x",
    "</>x",
    "</ >x",
    "</-->x",
    "<p>a</p >b",
    "<p>a</p junk>b",
    "<p>a</p",
    "<p>a</",
    "<p>a</1a>b",
    "<p>a</.foo>b",
    "<p>a</ a b>c",
    "<p>x</a<b>y",
    # --- literal < and entity edges in data ---
    "a < b",
    "a <",
    "<",
    "x<",
    "a <3 <b>x</b>",
    "&amp;",
    "a&ampb",
    "a&amp",
    "&#65;x",
    "&#x41;x",
    "&#65 y",
    "&notareal;x",
    "&not y",
    "&",
    "&;",
    "&#",
    "&# x",
    "&#xZZ;w",
    "foo &am",
    "tail &amp",
    "t &gt",
    # --- cdata content elements ---
    "<script>a<b></script>c",
    "<script>a",
    "<script>if (a<b) x='<p>';</script>c",
    "<script>a</script　>b",
    "<script>a</script junk>b</script>c",
    "<style>p{color:red}</style>t",
    "<script>x</style>y</script>z",
    "<SCRIPT>a</SCRIPT>b",
    "<script >a</script>b",
    "<script/>x</script>y",
    "<script>&amp;</script>x",
    "<script>a</script x=\"</script>\">b",
    "<script>a</script<</script>b",
    "<script>a</script </script>b",
    "<script>a</scriptx</script>b",
    # --- realistic full pages (constructs interacting at document scale) ---
    ("<!DOCTYPE html><html><head><meta charset='utf-8'><title>Docs &amp; Guides</title>"
     "<link rel='stylesheet canonical' href='/s.css'><script>var a = 1 < 2 && 3 > 2;</script>"
     "<!--[if lt IE 9]><script src='shim.js'></script><![endif]--></head>"
     "<body><nav class='nav  top'><a href='/a?utm_source=x&b=1'>A</a></nav>"
     "<![if gte mso 9]><style>.mso{}</style><![endif]>"
     "<article><h1>Title &ndash; part</h1><p>Body &copy; 2024 <b>bold</p>"
     "<![CDATA[raw > cdata]]><pre><code>if (a&lt;b) {}</code></pre></article>"
     "<footer style='display: none'>hidden</footer></body></html>"),
    ("<html><body><table><tr><td>&nbsp;</td><td>x</td></tr></table>"
     "<script type='math/tex'>E=mc^2</script>"
     "<div style='display: none'><p>invisible</p></div>"
     "<p>$a+b$ and $$c\nd$$</p><img src=i.png><br><hr>"
     "<a name='top'></a><a href='#top'>up</a></body>"),
    ("<?xml-stylesheet type='text/css'?><html><body>"
     "<ul><li>one<li>two<li>three</ul>"
     "<select><option value=1 selected>a<option value=2>b</select>"
     "<p title='x&quot;y'>t</p><iframe src='f.svg'></iframe></body></html>"),
    # truncated mid-page (crawler cutoffs): resync must recover structure
    ("<html><body><p>start</p><div class='content'><p>real text "
     "<a href='/next'>next</a></p><!-- trailing comment with > inside "),
    ("<html><body><p>alpha</p><script>var s='unterminated"),
    # --- normal structure sanity ---
    "<html><head><title>T</title></head><body><p>a</p><p>b</p></body></html>",
    "<div class='a  b'><p>one</p></div>",
    "<DIV CLASS='X  y' Data-Foo='a&amp;b'>t</DIV>",
    "<input disabled type=checkbox value=>",
    "<p><br>after<img src=x>tail</p>",
    "<div/><span>in</span>",
    "<div><span>a</div>b",
    "<p>a<p>b</p></p>",
    "<ul><li>1<li>2</ul>",
]


def fuzz_cases(rng, n_tag, n_soup):
    cases = []
    # targeted tag fuzz: "<" + letters/specials
    tag_alpha = list("ab<>='\"/ \t\n=&;!?-.[]") + [" ", " ", ""]
    for _ in range(n_tag):
        ln = rng.randint(1, 24)
        s = "<" + ("" if rng.random() < 0.2 else rng.choice("aB")) + \
            "".join(rng.choice(tag_alpha) for _ in range(ln))
        if rng.random() < 0.5:
            s += ">tail"
        cases.append(s)
    # general soup fuzz
    soup_alpha = list("<>!-=?&;/'\"abc #[]$.:\t\n ") + [" ", "　", "&amp;", "<!--", "-->",
                                                       "<![CDATA[", "]]>", "<script>", "</script>",
                                                       "<a href='x'>", "</a>", "<?", "<!", "</"]
    for _ in range(n_soup):
        ln = rng.randint(2, 14)
        cases.append("".join(rng.choice(soup_alpha) for _ in range(ln)))
    return cases


def main():
    rng = random.Random(42)
    corpus = HAND + fuzz_cases(rng, 3000, 5000)
    # de-dup preserving order
    seen = set()
    uniq = []
    for s in corpus:
        if s not in seen:
            seen.add(s)
            uniq.append(s)
    out = [run_case(s) for s in uniq]
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden", "parser_events.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=True)
    n_rej = sum(1 for c in out if c.get("rejected"))
    print(f"wrote {len(out)} cases ({n_rej} rejected) -> {dest}")


if __name__ == "__main__":
    main()
