#!/usr/bin/env python3
"""Diff fuzz differential: run the REFERENCE's own myers_diff /
generate_diff / generate_optimized_diff (/root/reference/processing/
diff_generator.py, imported with offline stubs) plus the
update_partial_content apply semantics (core/scraper.py:420-431, inlined)
over a seeded corpus of line-structured strings — including the crash
cases (the backtrack KeyErrors / IndexErrors the reference wraps in
ParsingError: crash parity is part of the byte contract).

Output: diff_fuzz.json rows:
  {"old", "new", "ops": [[op, a|null, b|null, c|null], ...],
   "old_md5", "new_md5", "applied",
   "chunks": [[idx, [ops...]], ...] | {"chunks_error": true},
   "chunk_size": N}
  or {"old", "new", "error": true} when myers_diff/generate_diff raises.

Regenerate with:  python3 scripts/gen_diff_fuzz.py
"""
import importlib.util
import json
import os
import random
import sys
import types

ce = types.ModuleType('custom_exceptions')


class ParsingError(Exception):
    def __init__(self, msg, **kw):
        super().__init__(msg)


class ScraperError(Exception):
    pass


ce.ParsingError = ParsingError
ce.ScraperError = ScraperError
sys.modules['custom_exceptions'] = ce

lg = types.ModuleType('logger')
lg.log_error = lambda *a, **k: None
lg.log_info = lambda *a, **k: None
sys.modules['logger'] = lg

spec = importlib.util.spec_from_file_location(
    'refdiff', '/root/reference/processing/diff_generator.py')
refdiff = importlib.util.module_from_spec(spec)
spec.loader.exec_module(refdiff)


def apply_ops(ops):
    """update_partial_content's reconstruction (core/scraper.py:420-431)."""
    out = []
    for op in ops:
        if op['operation'] == 'equal':
            out.append(op['content'])
        elif op['operation'] == 'replace':
            out.append(op['new_content'])
        elif op['operation'] == 'insert':
            out.append(op['content'])
    return '\n'.join(out)


def op_row(op):
    if op['operation'] == 'replace':
        return ['replace', None, op['old_content'], op['new_content']]
    return [op['operation'], op['content'], None, None]


LINES = ["alpha", "beta", "gamma", "delta", "", "x", "longer line with spaces",
         "tab\there", "ünïcødé", "末尾", "a,b,c", "  indented", "trailing  "]
SEPS = ["\n", "\n", "\n", "\r\n", "\r", "\x85", " ", "\x0b", "\x1c"]


def rand_text(rng, max_lines=14):
    n = rng.randint(0, max_lines)
    parts = []
    for i in range(n):
        parts.append(rng.choice(LINES))
        if i < n - 1 or rng.random() < 0.5:
            parts.append(rng.choice(SEPS))
    return "".join(parts)


def mutate(rng, s):
    lines = s.splitlines()
    mode = rng.randint(0, 5)
    if mode == 0 and lines:           # drop some lines (crash-parity food)
        k = rng.randint(1, len(lines))
        for _ in range(k):
            lines.pop(rng.randrange(len(lines)))
    elif mode == 1:                    # append lines
        lines += [rng.choice(LINES) for _ in range(rng.randint(1, 3))]
    elif mode == 2 and lines:          # replace a line
        lines[rng.randrange(len(lines))] = rng.choice(LINES)
    elif mode == 3:                    # prepend
        lines = [rng.choice(LINES)] + lines
    elif mode == 4:                    # shuffle
        rng.shuffle(lines)
    else:
        return rand_text(rng)
    return "\n".join(lines)


def main():
    rng = random.Random(42)
    pairs = []
    # hand edges
    for p in [("", ""), ("a", "a"), ("a\nb", ""), ("", "a\nb"),
              ("a\nb\nc", "a\nc"), ("a\nb\nc", "c"), ("a\nb\nc\nd", "a"),
              ("a\nb", "a\nb\nc"), ("x\ny", "y\nx"), ("a\r\nb", "a\nb"),
              ("a\x85b", "a\nb"), ("a b c", "a\nc"),
              ("same\nsame\nsame", "same\nsame"), ("a\nb\nc", "b")]:
        pairs.append(p)
    for _ in range(900):
        old = rand_text(rng)
        new = mutate(rng, old) if rng.random() < 0.75 else rand_text(rng)
        pairs.append((old, new))
    # big contents to exercise chunking at the default size
    for _ in range(40):
        old = "".join(rng.choice(LINES) + "\n" for _ in range(rng.randint(150, 300)))
        new = mutate(rng, old)
        pairs.append((old, new))

    rows = []
    for old, new in pairs:
        row = {"old": old, "new": new}
        try:
            fd = refdiff.generate_diff(old, new, "doc", "1")
            row["ops"] = [op_row(o) for o in fd["operations"]]
            row["old_md5"] = fd["metadata"]["old_content_hash"]
            row["new_md5"] = fd["metadata"]["new_content_hash"]
            row["applied"] = apply_ops(fd["operations"])
        except Exception:
            row["error"] = True
        if "error" not in row:
            cs = 1000 if len(old) > 900 or len(new) > 900 else 7
            row["chunk_size"] = cs
            try:
                od = refdiff.generate_optimized_diff(old, new, "doc", "1", chunk_size=cs)
                row["chunks"] = [[c["chunk_index"],
                                  [op_row(o) for o in c["operations"]]]
                                 for c in od["chunks"]]
            except Exception:
                row["chunks_error"] = True
        rows.append(row)

    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden", "diff_fuzz.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=True)
    nerr = sum(1 for r in rows if r.get("error"))
    ncerr = sum(1 for r in rows if r.get("chunks_error"))
    print(f"wrote {len(rows)} rows ({nerr} diff errors, {ncerr} chunk errors) -> diff_fuzz.json")


if __name__ == "__main__":
    main()
