#!/usr/bin/env python3
"""Line-terminator cases for the math-span regex family (SURVEY §7.5 #3):
Python's non-DOTALL `.` excludes ONLY '\n', while Java's default also
excludes \r/U+0085/U+2028/U+2029 — the engine spells the inline dot as
[^\n] to match Python. This golden runs the REFERENCE'S OWN functions
(core/scraper.py:360-372, replicated verbatim below — the module itself
imports selenium and cannot be imported here) over probes whose math
spans contain each line terminator.

Output: math_spans_lineterm.json [{"in", "mathjax", "katex"}]
"""
import json
import os
import re


def preserve_mathjax(content):
    content = re.sub(r'\$(.+?)\$', r'<span class="math-inline">\1</span>', content)
    content = re.sub(r'\$\$(.+?)\$\$', r'<div class="math-block">\1</div>', content,
                     flags=re.DOTALL)
    return content


def preserve_katex(content):
    content = re.sub(r'\\(.+?)\\', r'<span class="katex-inline">\1</span>', content)
    content = re.sub(r'\\\[(.+?)\\\]', r'<div class="katex-block">\1</div>', content,
                     flags=re.DOTALL)
    return content


TERMS = ["\r", "\x85", " ", " ", "\n", "\r\n"]

PROBES = []
for t in TERMS:
    PROBES += [
        f"a $x{t}y$ b",          # inline span containing the terminator
        f"$${t}block{t}$$",      # DOTALL block spanning it
        f"\\k{t}atex\\ tail",    # katex inline containing it
        f"\\[{t}kb{t}\\]",       # katex block
        f"$a$ {t} $b$",          # two spans separated by it
        f"pre{t}$only one dollar",  # no span at all
    ]
PROBES += [
    "$a\rb$ and $$c\nd$$ mixed",
    " $edge$ ",
    "$\r$",              # span of just a CR
    "$$\n$$",            # block of just an LF
]


def main():
    rows = [{"in": p, "mathjax": preserve_mathjax(p),
             "katex": preserve_katex(p)} for p in PROBES]
    out = os.path.join(os.path.dirname(__file__),
                       "../src/test/resources/golden/math_spans_lineterm.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=0, ensure_ascii=False)
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
