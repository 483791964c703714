#!/usr/bin/env python3
"""Random-text html.unescape fuzz: the exhaustive entities_full.json
golden covers every WHATWG name in isolation; this corpus exercises
MID-TEXT occurrences — semicolon-less longest-prefix matching against
following text ("&notit;" → "¬it;"), truncated names, adjacent
references, numeric edge forms — through the real CPython html.unescape.

Output: unescape_fuzz.json [{"in", "out"}]

Regenerate with:  python3 scripts/gen_unescape_fuzz.py
"""
import html
import json
import os
import random

PIECES = ["&", ";", "#", "x", "amp", "not", "notin", "lt", "gt", "cent",
          "copy", "COPY", "Amp", "aelig", "AElig", "in", "it", "o",
          "&amp;", "&amp", "&not", "&notit;", "&notin;", "&#38;", "&#x26;",
          "&#38", "&#X26;", "&#", "&#;", "&#x;", "&#0;", "&#x110000;",
          "&#xD800;", "&#999999999;", "&#9999999999999999999;",
          "&bogus;", "&bogus", "&CounterClockwiseContourIntegral;",
          "&CounterClockwiseContourIntegr", "a", "b", " ", "1", "<", ">",
          "ä", "&frac12;", "&frac", "&fjlig;", "&fj", "&gt", "&LT",
          "&lt;amp;", "&&amp;&", "&ampamp;", "&amp;amp;", "&thetasym;",
          "&ThisDoesNotExist;", "&no", "&n"]


def main():
    rng = random.Random(42)
    cases = list(PIECES)
    for _ in range(3000):
        n = rng.randint(1, 8)
        cases.append("".join(rng.choice(PIECES) for _ in range(n)))
    seen = set()
    uniq = [c for c in cases if not (c in seen or seen.add(c))]
    rows = [{"in": s, "out": html.unescape(s)} for s in uniq]
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden", "unescape_fuzz.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=True)
    print(f"wrote {len(rows)} rows -> unescape_fuzz.json")


if __name__ == "__main__":
    main()
