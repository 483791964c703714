#!/usr/bin/env python3
"""Sitemap differential: run the REFERENCE's per-payload sitemap logic
(core/scraper.py:690-714 — xmltodict.parse + the urlset/sitemapindex
loc-collection loops, network fetch removed) over a corpus of realistic
and mutated XML payloads using this container's real xmltodict/expat.

Golden rows (sitemap_fuzz.json):
  {"xml": s, "kind": "urlset"|"sitemapindex", "locs": [str...]}  clean parse
  {"xml": s, "kind": "none"}    ExpatError (reference returns []) or
                                root not urlset/sitemapindex (also [])
  {"xml": s, "kind": "crash"}   the loc-collection loop raises
                                (TypeError/KeyError — single-entry dict
                                iteration, missing 'url'/'loc', empty
                                elements; NOT caught by the reference)
  {"xml": s, "kind": "nonstr"}  parse succeeds but some collected loc is
                                not a plain string (None/dict/list from
                                empty loc, attrs, mixed content, repeated
                                loc) — unusable downstream

The Scala side (Sitemap.parseSitemap over StrictXml) maps: none→none,
crash/nonstr→parse_error, clean→(kind, locs). Gate: SitemapFuzzSpec.

Regenerate with:  python3 scripts/gen_sitemap_fuzz.py
"""
import json
import os
import random

import xmltodict


def reference_outcome(content: bytes):
    try:
        d = xmltodict.parse(content)
    except xmltodict.expat.ExpatError:
        return {"kind": "none"}      # the reference CATCHES this -> []
    except Exception:
        return {"kind": "crash"}     # ValueError etc. escape its except
    if 'urlset' in d:
        key, child = 'urlset', 'url'
    elif 'sitemapindex' in d:
        key, child = 'sitemapindex', 'sitemap'
    else:
        return {"kind": "none"}
    try:
        locs = [u['loc'] for u in d[key][child]]
    except Exception:
        return {"kind": "crash"}
    if all(isinstance(x, str) for x in locs):
        return {"kind": key, "locs": locs}
    return {"kind": "nonstr"}


URLS = ["https://e.com/", "https://e.com/a/b.html", "https://e.com/q?a=1&amp;b=2",
        "https://e.com/%C3%A4", "https://e.com/x#f", "/relative", "",
        "https://bücher.de/p", "  https://pad.ded/  ", "https://e.com/c?x=&#65;"]
EXTRAS = ["<lastmod>2024-01-01</lastmod>", "<changefreq>daily</changefreq>",
          "<priority>0.8</priority>", ""]
PROLOGS = ["", "<?xml version='1.0'?>", '<?xml version="1.0" encoding="UTF-8"?>',
           "<?xml version='1.0'?>\n<!-- generated -->\n", "﻿", "  \n"]
XMLNS = ["", " xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'", " x='1'"]


def make_sitemap(rng, kind="urlset", n=None):
    child = "url" if kind == "urlset" else "sitemap"
    n = rng.randint(0, 4) if n is None else n
    rows = []
    for _ in range(n):
        loc = rng.choice(URLS)
        extra = rng.choice(EXTRAS)
        pre = rng.choice(["", " ", "\n  "])
        rows.append(f"<{child}>{pre}<loc>{loc}</loc>{extra}</{child}>")
    body = rng.choice(["", "\n"]).join(rows)
    return (rng.choice(PROLOGS) +
            f"<{kind}{rng.choice(XMLNS)}>{body}</{kind}>" +
            rng.choice(["", "\n", "  "]))


def mutate(rng, s):
    mode = rng.randint(0, 11)
    if mode == 0 and len(s) > 10:
        return s[:rng.randint(5, len(s) - 1)]          # truncate
    if mode == 1:
        return s.replace("</url>", "</urlx>", 1)        # mismatch
    if mode == 2:
        return s.replace("<loc>", "<loc x=1>", 1)       # unquoted attr
    if mode == 3:
        return s.replace("<loc>", "<loc>&bad;", 1)      # undefined entity
    if mode == 4:
        return s.replace("<loc>", "<loc>a<", 1)         # bare <
    if mode == 5:
        return s.replace("</loc>", "]]></loc>", 1)      # stray ]]>
    if mode == 6:
        return "junk" + s                                # junk before root
    if mode == 7:
        return s + "<tail/>"                             # junk after root
    if mode == 8:
        return s.replace("<loc>", "<loc><![CDATA[", 1).replace("</loc>", "]]></loc>", 1)
    if mode == 9:
        return s.replace("<loc>", "<loc>\r\nx\r", 1)     # CRLF normalization
    if mode == 10:
        return s.replace("<loc>", "<loc>a<!-- c -->b", 1)  # comment splits text
    return s.replace("<url>", "<url>text", 1)            # mixed content


HAND = [
    # quirk family: 0 / 1 / 2 children, missing pieces
    "<urlset></urlset>",
    "<urlset/>",
    "<urlset><url><loc>https://e.com/</loc></url></urlset>",
    "<urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><foo/></urlset>",
    "<urlset><url><changefreq>d</changefreq></url><url><loc>b</loc></url></urlset>",
    "<urlset><url>bare</url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc x='1'>a</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc>a</loc><loc>c</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc/></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc>  </loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc></loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc> a\n b </loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc>a<!-- c -->b</loc></url><url><loc>x</loc></url></urlset>",
    "<urlset><url><loc>a<![CDATA[&]]>b</loc></url><url><loc>x</loc></url></urlset>",
    "<urlset><url><loc>a\r\nb\rc</loc></url><url><loc>x</loc></url></urlset>",
    "<urlset><url><nested><loc>deep</loc></nested></url><url><loc>b</loc></url></urlset>",
    "<URLSET><url><loc>a</loc></url><url><loc>b</loc></url></URLSET>",
    "<ns:urlset xmlns:ns='x'><ns:url><ns:loc>a</ns:loc></ns:url></ns:urlset>",
    "<sitemapindex><sitemap><loc>s1</loc></sitemap><sitemap><loc>s2</loc></sitemap></sitemapindex>",
    "<sitemapindex><sitemap><loc>s1</loc></sitemap></sitemapindex>",
    "<other><url><loc>a</loc></url></other>",
    "<urlset><url><loc>a&amp;b&#65;&#x41;&lt;&gt;&quot;&apos;</loc></url><url><loc>x</loc></url></urlset>",
    "<urlset><url><loc>bad &#0; char</loc></url><url><loc>x</loc></url></urlset>",
    "<urlset><url><loc>ctl \x01 char</loc></url><url><loc>x</loc></url></urlset>",
    "<!DOCTYPE urlset><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0' encoding='ISO-8859-1'?><urlset><url><loc>café</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url id='1'><loc>a</loc></url><url id='2'><loc>b</loc></url></urlset>",
    "<urlset><url id='1' id='2'><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset xmlns='s'><url><loc>only</loc></url></urlset>",
    "<urlset>stray text<url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><!-- only comments --></urlset>",
    "<urlset><?pi data?><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset><!-- tail -->",
    "<urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset> \n ",
    "<urlset><url><loc>x</loc></url><url><loc>y</loc></url>",
    "<urlset><url><loc>-</loc></url><url><loc>b</loc></URL></urlset>",
    "<3bad><url/></3bad>",
    "",
    "   ",
    "<?xml version='1.0'?>",
    # --- XML declaration grammar (expat-validated) ---
    "<?xml bogus?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml encoding='utf-8'?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0'encoding='utf-8'?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='2.0'?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version = '1.0' standalone='yes' ?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0' standalone='yes' encoding='utf-8'?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0'?'><urlset/>",
    # --- DOCTYPE / internal subset ---
    "<!DOCTYPE urlset [ <!FOO> ]><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<!DOCTYPE urlset [ <!ENTITY x 'y'> ]><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<!DOCTYPE urlset [ <!ELEMENT urlset ANY> <!ATTLIST urlset a CDATA #IMPLIED> ]><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<!DOCTYPE urlset [ <!NOTATION n SYSTEM 'f'> <!-- c --> <?pi ?> %pe; ]><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<!DOCTYPE urlset [ junk ]><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<!DOCTYPE urlset SYSTEM 'dtd'><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<!DOCTYPE urlset PUBLIC 'p' 's'><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<!DOCTYPE urlset junk junk2><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<!DOCTYPE urlset><!DOCTYPE urlset><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    # --- declared encodings (pyexpat: single-byte OK, multi-byte ValueError) ---
    "<?xml version='1.0' encoding='windows-1252'?><urlset><url><loc>caf\u00e9</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0' encoding='koi8-r'?><urlset><url><loc>\u0434\u0430</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0' encoding='shift_jis'?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0' encoding='euc-jp'?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0' encoding='no-such-enc'?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    "<?xml version='1.0' encoding='UTF-16'?><urlset><url><loc>a</loc></url><url><loc>b</loc></url></urlset>",
    # --- long numeric references / deep nesting ---
    "<urlset><url><loc>&#00000000000065;</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc>&#x00000041;</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset><url><loc>&#99999999;</loc></url><url><loc>b</loc></url></urlset>",
    "<urlset>" + "<a>" * 5000 + "</a>" * 5000 + "</urlset>",
    "<urlset>" + "<a>" * 5000 + "</a>" * 4999,
]


def main():
    rng = random.Random(42)
    payloads = list(HAND)
    for _ in range(700):
        s = make_sitemap(rng, rng.choice(["urlset", "urlset", "sitemapindex"]))
        payloads.append(s)
        if rng.random() < 0.6:
            payloads.append(mutate(rng, s))
    # de-dup preserving order
    seen = set()
    uniq = [p for p in payloads if not (p in seen or seen.add(p))]
    rows = []
    import re as _re
    for s in uniq:
        m = _re.search(r"encoding\s*=\s*[\"']([A-Za-z0-9._-]+)[\"']", s[:100])
        enc = m.group(1) if m else "utf-8"
        try:
            "x".encode(enc)
        except LookupError:
            enc = "utf-8"
        row = {"xml": s}
        try:
            payload = s.encode(enc)
        except Exception:
            payload = s.encode("utf-8", "replace")
        row.update(reference_outcome(payload))
        row["enc"] = enc
        rows.append(row)
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden", "sitemap_fuzz.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=True)
    from collections import Counter
    print(f"wrote {len(rows)} rows -> sitemap_fuzz.json",
          dict(Counter(r['kind'] for r in rows)))


if __name__ == "__main__":
    main()
