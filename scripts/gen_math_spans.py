#!/usr/bin/env python3
"""Golden for preserve_mathjax / preserve_katex
(/root/reference/core/scraper.py:360-372): the exact CPython re.sub
results, including the inline-before-block mangling quirk and Python's
non-DOTALL `.` (which excludes ONLY '\n' — unlike Java's, which also
excludes \r/NEL/LS/PS). Pins graft.clean.Sanitize.

Regenerate with:  python3 scripts/gen_math_spans.py
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


PROBES = [
    "pay $5 and $10 today",
    "inline $E=mc^2$ math",
    "$$block\nmath$$",
    "$a\rb$ cr inside",
    "$a\u0085b$ nel inside",
    "$a\u2028b$ ls inside",
    "$a\u2029b$ ps inside",
    "$a\nb$ newline breaks inline",
    "$$a\rb$$",
    "\\frac{1}{2}\\ katex",
    "\\a\rb\\ cr inline katex",
    "\\a\nb\\ nl",
    "\\[x\n+y\\]",
    "\\[x\r+y\\]",
    "mix $i$ and $$b$$ and \\k\\ and \\[B\\]",
    "$$\n$$",
    "$ $",
    "$\r$",
    "no math here",
    "$unclosed",
    "\\unclosed",
]


def main():
    out = [{"in": s,
            "mathjax": preserve_mathjax(s),
            "katex": preserve_katex(s)} for s in PROBES]
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden", "math_spans.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=True)
    print(f"wrote {len(out)} probes -> {dest}")


if __name__ == "__main__":
    main()
