#!/usr/bin/env python3
"""Differential robots.txt golden: graft.url.RobotsTxt vs the container's
REAL urllib.robotparser (CPython 3.11.7).

Each document is parsed with RobotFileParser.parse() and probed with
can_fetch / crawl_delay / request_rate / site_maps across a fixed agent ×
url matrix, plus str(rfp) as a parse-structure fingerprint (it renders
every entry's normalized rule paths in order, default entry last).
Documents that make parse() raise (Crawl-delay / Request-rate values that
pass str.isdigit() but crash int(), e.g. superscript ²) are recorded as
crash rows — crash parity, like the Myers family.

Deterministic: hand-built docs + a seeded random grammar sweep. No wall
clock anywhere.

Output: robots_fuzz.json
  [{"doc", "crash": true} |
   {"doc", "render", "sitemaps": [...]|None,
    "agents": {agent: {"delay": int|None, "rate": [r,s]|None}},
    "fetch": {agent: {url: bool}}}]

Regenerate with:  python3 scripts/gen_robots_fuzz.py
"""
import json
import os
import random
import urllib.robotparser

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "src", "test", "resources", "golden",
                   "robots_fuzz.json")

AGENTS = ["TestBot", "testbot/1.0", "MegaBot/2.1 (+http://example.com/bot)",
          "*", "", "FooBot", "fanCYcRaWLer/9", "Bot"]

URLS = [
    "http://example.com/",
    "http://example.com",
    "http://example.com/private/data.html",
    "http://example.com/private",
    "http://example.com/pri",
    "http://example.com/public/index.html",
    "http://example.com/a%20b/c.html",
    "http://example.com/a b/c.html",
    "http://example.com/search?q=robots&lang=en",
    "http://example.com/path;params?q=1#frag",
    "http://example.com/%7Euser/",
    "http://example.com/~user/",
    "/bare/path.html",
    "//example.com/protocol/relative",
    "",
    "*",
    "http://example.com/unicode/straße",
    "http://example.com/caps/UPPER.HTML",
]

DOCS = [
    # 0: empty file
    "",
    # 1: classic: default group + specific group
    """User-agent: *
Disallow: /private/
Allow: /private/ok.html

User-agent: TestBot
Disallow: /
""",
    # 2: allow beats disallow only by ORDER (first match wins)
    """User-agent: *
Allow: /private/ok.html
Disallow: /private/
Disallow: /pri
""",
    # 3: rules BEFORE any user-agent line are dropped (state 0)
    """Disallow: /everything
User-agent: *
Disallow: /private
""",
    # 4: blank line after user-agent drops the half-built group
    """User-agent: GhostBot

Disallow: /never-attached
User-agent: *
Disallow: /x
""",
    # 5: comment-only lines do NOT flush state; inline comments stripped
    """User-agent: TestBot
# just a comment
Disallow: /a # trailing comment
# another
Allow: /a/b
""",
    # 6: multiple agents share one group; '*' among them makes it DEFAULT
    """User-agent: FooBot
User-agent: TestBot
Disallow: /shared/

User-agent: BarBot
User-agent: *
Disallow: /default-trap/
""",
    # 7: two default groups — first wins, second silently dropped
    """User-agent: *
Disallow: /first/

User-agent: *
Disallow: /second/
""",
    # 8: crawl-delay + request-rate, valid and rejected shapes
    """User-agent: TestBot
Crawl-delay: 5
Request-rate: 3/20

User-agent: FooBot
Crawl-delay: fast
Request-rate: 3/20/9

User-agent: *
Crawl-delay: 010
Request-rate: 0/0
""",
    # 9: unicode Nd digits parse (int("٥") == 5); isdigit gates floats out
    """User-agent: TestBot
Crawl-delay: ٥
Request-rate: ۳/٢٠

User-agent: *
Crawl-delay: 1.5
""",
    # 10: CRASH — superscript two passes isdigit, int() raises
    """User-agent: *
Crawl-delay: ²
""",
    # 11: CRASH — circled digit in request-rate numerator
    """User-agent: *
Request-rate: ①/3
""",
    # 12: sitemap lines never change state; collected globally
    """Sitemap: http://example.com/s1.xml
User-agent: *
Sitemap: http://example.com/s2.xml
Disallow: /x
Sitemap: /relative.xml
""",
    # 13: %-escapes in values are unquoted at parse, re-quoted in RuleLine
    """User-agent: *
Disallow: /a%20b/
Allow: /a%2Fb
Disallow: /caf%C3%A9/
""",
    # 14: rule path normalization: urlunparse(urlparse(path)) + quote
    """User-agent: *
Disallow: /x?q=1#frag
Disallow: /p;params
Disallow: http://example.com/abs
Disallow: *
Allow:
Disallow:
""",
    # 15: empty Disallow value means allow-all rule; empty Allow stays allow
    """User-agent: TestBot
Disallow:

User-agent: FooBot
Disallow: /
""",
    # 16: agent matching is SUBSTRING on lowered product token
    """User-agent: bot
Disallow: /substring-trap/

User-agent: MEGA
Disallow: /mega/
""",
    # 17: empty user-agent value matches every agent
    """User-agent:
Disallow: /empty-agent/
""",
    # 18: user-agent after rules starts a NEW group
    """User-agent: TestBot
Disallow: /a
User-agent: FooBot
Disallow: /b
""",
    # 19: keys are case/space-insensitive; missing colon ignored
    """  USER-AGENT  :  TestBot
  DISALLOW  :  /caps/
this line has no colon and is ignored
DisAllow: /mixed/
""",
    # 20: \r\n, \v, \x1c, NEL, U+2028 all split lines like str.splitlines
    ("User-agent: *\r\nDisallow: /crlf/\x0bAllow: /vt/\x1c"
     "Disallow: /fs/\x85Disallow: /nel/\u2028Disallow: /ls/\n"),
    # 21: NBSP is python-whitespace: stripped from keys/values
    "User-agent: TestBot\nDisallow:\u00a0/nbsp/x\u00a0\n",
    # 22: unknown directives ignored without state change
    """User-agent: *
Host: example.com
Clean-param: ref /articles/
Disallow: /after-unknown/
""",
    # 23: crawl-delay/request-rate in state 1 still move to state 2 (group
    # gets flushed at EOF even though no rule line followed)
    """User-agent: TestBot
Crawl-delay: 7
""",
    # 24: huge-but-Long-safe delay
    """User-agent: *
Crawl-delay: 123456789012345678
""",
]


def grammar_docs():
    rng = random.Random(0xB07)  # fixed seed
    pool = [
        "User-agent: *", "User-agent: TestBot", "User-agent: FooBot",
        "User-agent: bot", "User-agent:",
        # %-escapes and unicode in agent values (unquoted at parse time)
        "User-agent: %54estBot", "User-agent: GRAFT", "User-agent: Бот",
        "User-agent: Mega Bot",
        "Disallow: /a", "Disallow: /a/b", "Disallow: /a%20b", "Disallow:",
        "Disallow: *", "Disallow: /private/",
        "Disallow: //double", "Disallow: ../relative", "Disallow: /a?q=1#f",
        "Disallow: %2F", "Disallow: /ümlaut/", "Disallow: /p;par",
        "Allow: /a/b/c", "Allow: /", "Allow:", "Allow: /a%2Fb",
        "Crawl-delay: 3", "Crawl-delay: x", "Crawl-delay: ٥",
        "Crawl-delay: +5", "Crawl-delay: ٥٥", "Crawl-delay: 5 # c",
        "Crawl-delay: 07", "Crawl-delay: 5.0",
        "Request-rate: 1/5", "Request-rate: 9/x", "Request-rate: 1/5/9",
        "Request-rate: /", "Request-rate: ۱/۲", "Request-rate:  2 / 6 ",
        "Sitemap: http://e.com/s.xml", "Sitemap: /rel.xml",
        "# comment", "", "no colon line", "  Disallow : /spaced  # c",
        "DISALLOW: /caps", "dIsAlLoW: /mixed", "Useragent: NotAKey",
        ":", "#", " ", "Disallow: /nbsp-value",
    ]
    docs = []
    for _ in range(160):
        n = rng.randrange(1, 16)
        docs.append("\n".join(rng.choice(pool) for _ in range(n)) + "\n")
    return docs


def probe(doc):
    rfp = urllib.robotparser.RobotFileParser()
    try:
        rfp.parse(doc.splitlines())
    except Exception:
        return {"doc": doc, "crash": True}
    row = {"doc": doc, "render": str(rfp)}
    sm = rfp.site_maps()
    row["sitemaps"] = sm
    row["agents"] = {}
    row["fetch"] = {}
    for a in AGENTS:
        d = rfp.crawl_delay(a)
        r = rfp.request_rate(a)
        row["agents"][a] = {"delay": d,
                            "rate": [r.requests, r.seconds] if r else None}
        row["fetch"][a] = {u: rfp.can_fetch(a, u) for u in URLS}
    return row


def main():
    rows = [probe(d) for d in DOCS + grammar_docs()]
    crashes = sum(1 for r in rows if r.get("crash"))
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump({"agents": AGENTS, "urls": URLS, "rows": rows}, f,
                  ensure_ascii=False, indent=1)
    print(f"wrote {len(rows)} docs ({crashes} crash rows) -> {OUT}")


if __name__ == "__main__":
    main()
