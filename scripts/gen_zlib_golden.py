#!/usr/bin/env python3
"""Golden fixture for the Gopher-style compression-ratio quality signal.

Pins CPython zlib.compress(text_utf8, 6) output SIZES for a fixture corpus
spanning the regimes the signal separates: highly repetitive text (spam,
keyword stuffing), normal prose, and incompressible noise. java.util.zip
.Deflater(6) is the same zlib stream format and was verified byte-identical
to CPython zlib on these inputs before this fixture was created — the spec
(TextAnalysisSpec) gates the Scala implementation on EXACT sizes.

Run: python3 scripts/gen_zlib_golden.py  (writes the checked-in fixture)
"""
import json
import os
import zlib

cases = []


def add(name, text):
    cases.append({
        "name": name,
        "text": text,
        "n_bytes": len(text.encode("utf-8")),
        "n_compressed": len(zlib.compress(text.encode("utf-8"), 6)),
    })


add("empty", "")
add("one_char", "a")
add("short_prose", "The quick brown fox jumps over the lazy dog.")
add("repeat_char", "a" * 2000)
add("repeat_word", "buy " * 500)
add("repeat_sentence", "Subscribe to our newsletter today! " * 60)
add("prose", (
    "Apache Spark is a multi-language engine for executing data "
    "engineering, data science, and machine learning on single-node "
    "machines or clusters. It provides high-level APIs in Scala, Java, "
    "Python and R, and an optimized engine that supports general "
    "execution graphs. The declarative DataFrame API lets the Catalyst "
    "optimizer plan predicate pushdown, column pruning and join "
    "reordering without user intervention, while Tungsten compiles "
    "whole stages to JVM bytecode. "))
add("prose_x4", cases[-1]["text"] * 4)
add("unicode", "héllo wörld — ünïcode ↔ 中文 × emoji 🎉 " * 20)
add("numbers", " ".join(str(i * 7919 % 10007) for i in range(400)))
# deterministic pseudo-noise: xorshift over a fixed seed, mapped to
# printable ASCII so it stays valid UTF-8 but nearly incompressible
x = 88172645463325252
noise = []
for _ in range(2000):
    x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 7
    x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    noise.append(chr(33 + (x % 94)))
add("noise", "".join(noise))
add("mixed", "INTRO " + "nav nav nav " * 40 + cases[6]["text"] + "".join(noise[:500]))

out = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/golden/zlib_sizes.json")
with open(out, "w") as f:
    json.dump(cases, f, ensure_ascii=False, indent=1)
print(f"wrote {len(cases)} cases to {out}")
