#!/usr/bin/env python3
"""Golden for the hidden-element predicate: the reference filters
`soup.find_all(style=re.compile(r'display:\s*none'))`
(/root/reference/core/scraper.py:229) — a SEARCH with Python's UNICODE \s.
Pins graft.clean.Cleaner.hasDisplayNone.

Regenerate with:  python3 scripts/gen_display_none.py
"""
import json
import os
import re

PAT = re.compile(r'display:\s*none')

PROBES = [
    "display:none",
    "display: none",
    "display:  none",
    "display:\tnone",
    "display:\nnone",
    "display:\x0bnone",
    "display:\x1cnone",
    "display:\xa0none",
    "display:　none",
    "display: none",
    "display :none",
    "DISPLAY:none",
    "Display: None",
    "color:red;display: none;margin:0",
    "display:nonexistent",
    "display:non",
    "xdisplay:none",
    "display:inline; display:none",
    "display:block",
    "",
    "display:",
    "display: ",
    "display:\xa0",
    "display:\xa0  none",
]


def main():
    out = [{"style": s, "hidden": bool(PAT.search(s))} for s in PROBES]
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden", "display_none.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=True)
    print(f"wrote {len(out)} probes -> {dest}")


if __name__ == "__main__":
    main()
