#!/usr/bin/env python3
"""Function-level URL fuzz: parse_qsl / parse_qs(keep_blank_values) /
urlencode (plain + doseq) / quote(safe='/:@&=+$,') / quote_plus / unquote
— the exact stdlib calls the reference composes
(/root/reference/processing/utils.py:66-73, core/scraper.py:210-220) —
plus the reference's own is_session_id predicate (utils.py:101-112,
re.match IGNORECASE with unicode casefolding). The composite fuzz suites
exercise these transitively; this pins each function alone, including
edges the composites mask.

Output: qs_fuzz.json  {"qsl": [...], "qs": [...], "quote": [...],
                       "unquote": [...], "session": [...]}

Regenerate with:  python3 scripts/gen_qs_fuzz.py
"""
import importlib.util
import json
import os
import random
import sys
import types
from urllib.parse import (parse_qsl, parse_qs, urlencode, quote, quote_plus,
                          unquote)

# is_session_id needs the reference module (offline stubs)
requests_stub = types.ModuleType('requests')


class _RE(Exception):
    pass


requests_stub.RequestException = _RE
requests_stub.head = lambda *a, **k: (_ for _ in ()).throw(_RE())
sys.modules['requests'] = requests_stub
ce = types.ModuleType('custom_exceptions')
ce.NetworkError = type('NetworkError', (Exception,), {})
ce.ParsingError = type('ParsingError', (Exception,), {})
sys.modules['custom_exceptions'] = ce
spec = importlib.util.spec_from_file_location(
    'refutils', '/root/reference/processing/utils.py')
refutils = importlib.util.module_from_spec(spec)
spec.loader.exec_module(refutils)

QS_ATOMS = ["a=1", "b=", "=c", "=", "", "a", "&", "a=1=2", "a==", "a%3D=1",
            "k%20ey=v%20al", "a+b=c+d", "%E4=%FF", "%zz=1", "a=%C3%A4",
            "ä=ö", "a=1;b=2", ";", "a&&b", "%=x", "a=+", "+=a", "a%2B=1",
            "utm_source=x", "a=b&a=c", "%41=%42", "a=%", "a=%2", "a=%%41"]

QUOTE_PROBES = ["abc", "a b", "a/b:c@d", "ä", "€", "𝄞", "a&b=c+d$,", "~.-_",
                "100%", "%41", "\n\t", "a?b#c", "[]{}|\\^", "'\"", ";param",
                " ", "", "ヘ", "\x00\x1f", "a b+c"]

SESSION_PROBES = ["session", "SESSION", "sid", "SID", "s", "S", "sess",
                  "mysessionid", "PHPSESSID", "phpsessid_x", "JSESSIONIDx",
                  "aspsessionidABC", "cfid", "XCFTOKENX", "token", "id",
                  "sessio", "sidx", "xs", "ssid", "İD", "sİd", "ſession",
                  "ＳＩＤ", "sessionİ", "CFİD", "sessıon", "а"]


def rand_qs(rng):
    n = rng.randint(0, 6)
    return "&".join(rng.choice(QS_ATOMS) for _ in range(n))


def main():
    rng = random.Random(42)
    qss = [rand_qs(rng) for _ in range(600)] + QS_ATOMS
    out = {
        "qsl": [{"in": q, "pairs": [[k, v] for k, v in parse_qsl(q)],
                 "pairs_blank": [[k, v] for k, v in parse_qsl(q, keep_blank_values=True)],
                 "enc": urlencode(parse_qsl(q))}
                for q in qss],
        "qs": [{"in": q,
                "grouped": [[k, v] for k, v in parse_qs(q, keep_blank_values=True).items()],
                "enc_doseq": urlencode(parse_qs(q, keep_blank_values=True), doseq=True)}
               for q in qss],
        "quote": [{"in": p, "quoted": quote(p, safe='/:@&=+$,'),
                   "plus": quote_plus(p)} for p in QUOTE_PROBES],
        "unquote": [{"in": p, "out": unquote(p)} for p in
                    ["a%41b", "%C3%A4", "%E4", "%FF%FE", "%zz", "%", "%2",
                     "a+b", "%25", "%%41", "%c3%a4", "%C3", "%C3%28",
                     "%F0%9D%84%9E", "%00", "%E2%82%AC", "abc", ""]],
        "session": [{"param": p, "hit": bool(refutils.is_session_id(p))}
                    for p in SESSION_PROBES],
    }
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden", "qs_fuzz.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=True)
    print(f"wrote qsl={len(out['qsl'])} qs={len(out['qs'])} quote={len(out['quote'])} "
          f"unquote={len(out['unquote'])} session={len(out['session'])} -> qs_fuzz.json")


if __name__ == "__main__":
    main()
