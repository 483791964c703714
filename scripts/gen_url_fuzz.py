#!/usr/bin/env python3
"""URL fuzz differentials: run the REFERENCE's own normalize_url
(/root/reference/processing/utils.py:14-87, imported with offline stubs
for requests/custom_exceptions) plus stdlib urljoin and the reference's
per-href tracking-param strip (core/scraper.py:209-220) over a seeded
fuzz corpus, and freeze the results.

Outputs:
  normalize_url_fuzz.json  [{"input", "expected", "expected2"} | {"input", "error": true}]
  urljoin_fuzz.json        [{"base", "href", "expected"} | {..., "error": true}]
  href_norm_fuzz.json      [{"base", "href", "expected"} | {..., "error": true}]

The error rows pin the reference's exception behavior (ParsingError out of
normalize_url — e.g. stdlib-idna label failures, invalid ports); the Scala
side must throw on exactly those inputs.

Regenerate with:  python3 scripts/gen_url_fuzz.py
"""
import importlib.util
import json
import os
import random
import sys
import types

# --- import the reference's utils.py with offline stubs ---
requests_stub = types.ModuleType('requests')


class _RequestException(Exception):
    pass


def _head(*a, **k):
    raise _RequestException('offline')


requests_stub.RequestException = _RequestException
requests_stub.head = _head
sys.modules['requests'] = requests_stub

ce = types.ModuleType('custom_exceptions')


class NetworkError(Exception):
    def __init__(self, msg, url=None):
        super().__init__(msg)


class ParsingError(Exception):
    def __init__(self, msg, url=None):
        super().__init__(msg)


ce.NetworkError = NetworkError
ce.ParsingError = ParsingError
sys.modules['custom_exceptions'] = ce

spec = importlib.util.spec_from_file_location(
    'refutils', '/root/reference/processing/utils.py')
refutils = importlib.util.module_from_spec(spec)
spec.loader.exec_module(refutils)

from urllib.parse import (urljoin, urlparse, parse_qs, parse_qsl,  # noqa: E402
                          urlencode, urlunparse)


def normalize_query_params(url):
    """core/scraper.py:522-532 — sort params, drop empty values, keep
    params/fragment (unlike normalize_url)."""
    parsed = urlparse(url)
    query_params = parse_qsl(parsed.query)
    query_params = sorted((k, v) for k, v in query_params if v)
    return urlunparse(
        (parsed.scheme, parsed.netloc, parsed.path, parsed.params,
         urlencode(query_params), parsed.fragment)
    )


def href_normalize(base, href):
    """core/scraper.py:209-220 — absolutize + strip utm_* params."""
    u = urljoin(base, href)
    parsed = urlparse(u)
    qd = parse_qs(parsed.query, keep_blank_values=True)
    filtered = {k: v for k, v in qd.items() if not k.startswith('utm_')}
    parsed = parsed._replace(query=urlencode(filtered, doseq=True))
    return urlunparse(parsed)


SCHEMES = ["http", "https", "HTTP", "HtTpS", "ftp", "file", ""]
USERINFO = ["", "", "", "u@", "u:p@", "U:P%40@"]
HOSTS = [
    "example.com", "EXAMPLE.COM", "www.Example.com", "WWW1.site.org",
    "www2.x.y", "wwww.z.net", "www.www.a.com", "awww.b.com",
    "bücher.de", "пример.test",
    "xn--bcher-kva.de", "café.www.fr", "127.0.0.1", "h_st.com",
    "a..b.com", "a.b.", ".a.b", "x" * 64 + ".com", "ex。jp",
    "e．com", "trİm.de", "♥.net", "", ".",
]
PORTS = ["", "", "", ":80", ":443", ":8080", ":0080", ":", ":00443"]
SEGS = ["a", "B", ".", "..", "", "a b", "%20", "%2F", "ä", "index.php",
        "guide.html", "x.TAR.gz", "...", "c:d", "@e", "&", "+", "$", ",",
        "~", "%C3%A4", "%ZZ", "a%", "f.", ".f", "a=b"]
QUERIES = ["", "", "a=1", "b=", "=c", "a=1&a=0", "sessionid=x", "SID=9",
           "s=1", "Sess=2", "utm_source=t&x=1", "a%20b=c%2Fd", "a+b=c+d",
           "a=b=c", "flag", "&&", "a=ä", "a=1;b=2", "jsessionid=q&k=v",
           "CFID=1&ok=2", "utm_=1", "utmx=2"]
FRAGS = ["", "", "", "#frag", "#", "#a b"]
PARAMS = ["", "", "", ";p=1", ";"]

HREFS = ["", "#f", "?q=1", "a/b", "/a/b", "../c", "./d", "//other.org/z",
         "mailto:a@b.c", "javascript:void(0)", "tel:+1555", "data:text/plain,x",
         "HTTP://UP.COM/Y", "bücher.html", "a b.html", "?utm_source=x&k=1",
         "../../../../up", "x//y", "/..", "..", ".", "//h:80/p", "ftp:z",
         "?a=1&a=2&utm_campaign=c", "page2.html#sec", ":colon", "/%7Euser"]


def gen_urls(rng, num):
    out = []
    for _ in range(num):
        scheme = rng.choice(SCHEMES)
        host = rng.choice(HOSTS)
        netloc = rng.choice(USERINFO) + host + rng.choice(PORTS)
        nseg = rng.randint(0, 4)
        path = "/".join(rng.choice(SEGS) for _ in range(nseg))
        lead = rng.choice(["/", "/", "/", "", "//"])
        trail = rng.choice(["", "", "/", "//"])
        p = (lead + path + trail) if path else rng.choice(["", "/", "//"])
        url = (f"{scheme}://{netloc}" if scheme else f"//{netloc}") + p
        url += rng.choice(PARAMS)
        q = rng.choice(QUERIES)
        if q:
            url += "?" + q
        url += rng.choice(FRAGS)
        out.append(url)
    # relative-ish and degenerate inputs
    out += ["", "/", "//", "///x", "a/b/c", "?q=1", "#f", "http:", "http://",
            "http:///p", "http://#f", "http://?q=1", "http://u@:80/x",
            "//bit.ly.evil.com/x", "http://example.com/a\nb", "http://h/%"]
    return out


def run_normalize(urls):
    rows = []
    for u in urls:
        row = {"input": u}
        try:
            e1 = refutils.normalize_url(u)
            row["expected"] = e1
            try:
                row["expected2"] = refutils.normalize_url(e1)
            except Exception:
                row["error2"] = True
        except Exception:
            row["error"] = True
        rows.append(row)
    return rows


def run_pairs(fn, bases, hrefs, rng, num):
    rows = []
    for _ in range(num):
        b = rng.choice(bases)
        h = rng.choice(hrefs)
        row = {"base": b, "href": h}
        try:
            row["expected"] = fn(b, h)
        except Exception:
            row["error"] = True
        rows.append(row)
    return rows


def main():
    rng = random.Random(42)
    urls = gen_urls(rng, 2500)
    norm = run_normalize(urls)
    bases = [u for u in urls if u.startswith("http")][:400] + [
        "http://example.com/docs/guide/", "https://a.b/c/d.html?x=1#f"]
    joins = run_pairs(urljoin, bases, HREFS + urls[:200], rng, 2000)
    hrefs = run_pairs(href_normalize, bases, HREFS + urls[:120], rng, 1500)
    nqp = []
    for u in urls[:1200]:
        row = {"input": u}
        try:
            row["expected"] = normalize_query_params(u)
        except Exception:
            row["error"] = True
        nqp.append(row)
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden")
    for name, rows in [("normalize_url_fuzz.json", norm),
                       ("urljoin_fuzz.json", joins),
                       ("href_norm_fuzz.json", hrefs),
                       ("normalize_qp_fuzz.json", nqp)]:
        with open(os.path.join(dest, name), "w", encoding="utf-8") as f:
            json.dump(rows, f, ensure_ascii=True)
        nerr = sum(1 for r in rows if r.get("error"))
        print(f"wrote {len(rows)} rows ({nerr} error rows) -> {name}")


if __name__ == "__main__":
    main()
