#!/usr/bin/env python3
"""Date-normalization differential: the reference normalizes date metas
with `dateutil.parser.parse(content).isoformat()`
(/root/reference/processing/content_processor.py:50,104). This golden
runs this container's REAL dateutil over a curated corpus of realistic
meta-date shapes (ISO variants, numeric with separators, month names,
RFC 2822, offsets/named zones, fractions, AM/PM, 2-digit years) plus
systematic mutations.

Rows where the result depends on TODAY (partial dates — dateutil fills
missing fields from the current date) are marked {"partial": true} and
excluded from parity (the engine is deterministic by contract; the
reference is wall-clock-dependent there — documented deviation).

NOTE: two-digit-year rows ("99-01-02", "68-01-02", ...) encode a
+/-50-year window relative to the GENERATION-TIME year (dateutil's
parserinfo captures the clock at import; PyDateUtil's default pivot is
the current year). The checked-in golden is generation-year-relative:
it silently expires when the wall clock crosses a window boundary
(first flip ~2049) — regenerate the corpus in the same era it is run.
Runs that need era-independent bytes pin PyDateUtil's pivotYear
parameter instead.

Output: dates_fuzz.json [{"in", "iso"} | {"in", "error": true} | {"in", "partial": true}]

Regenerate with:  python3 scripts/gen_dates_fuzz.py
"""
import json
import os
import warnings
from datetime import datetime

from dateutil import parser

warnings.filterwarnings("ignore")

SHAPES = [
    "2024-01-02", "2024-01-02T03:04:05", "2024-01-02 03:04:05",
    "2024-01-02T03:04", "2024-01-02T03:04:05Z", "2024-01-02T03:04:05z",
    "2024-01-02t03:04:05", "2024-01-02T03:04:05+02:00",
    "2024-01-02T03:04:05-05:00", "2024-01-02T03:04:05+0230",
    "2024-01-02T03:04:05-0500", "2024-01-02T03:04:05+02",
    "2024-01-02T03:04:05.123456", "2024-01-02T03:04:05.123",
    "2024-01-02T03:04:05.1", "2024-01-02 03:04:05.500000",
    "20240102", "20241231", "2024/01/02", "2024.01.02", "2024-1-2",
    "2024/1/2", "01/02/2024", "02/01/2024", "1/2/2024", "12/31/2024",
    "31/12/2024", "13/12/2024", "12/13/2024", "Jan 2, 2024",
    "January 2, 2024", "JANUARY 2, 2024", "jan 2 2024", "2 Jan 2024",
    "2nd January 2024", "1st Feb 2024", "3rd Mar 2024", "4th Apr 2024",
    "02-Jan-2024", "2-jan-2024", "Dec 31, 1999", "Sep 1, 2024",
    "Sept 1, 2024", "Tue, 2 Jan 2024 03:04:05 GMT",
    "Tue, 02 Jan 2024 03:04:05 +0000", "Mon, 2 Jan 2024 03:04:05 UTC",
    "Sat Oct 11 17:13:46 UTC 2003", "Sat Oct 11 17:13:46 2003",
    "Wed, 02 Oct 2002 08:00:00 EST", "2024-01-02T03:04:05 GMT",
    "2024-01-02T03:04:05GMT", "2024-01-02T03:04:05 UTC",
    "2024-01-02 03:04:05 AM", "2024-01-02 03:04:05 PM",
    "2024-01-02 3:04 PM", "2024-01-02 3:04pm", "2024-01-02 12:00 AM",
    "2024-01-02 12:00 PM", "99-01-02", "24-01-02", "68-01-02", "69-01-02",
    "1999-12-31 23:59:59", "2000-02-29", "1900-02-29", "2024-02-30",
    "2024-13-01", "2024-01-32", "2024-00-01", "2024-01-00",
    "2024-01-02T25:00:00", "2024-01-02T03:60:00", "2024-01-02T03:04:61",
    "2024-01-02T03:04:60", "  2024-01-02  ", "\t2024-01-02T03:04:05\n",
    "12024-01-02", "not a date", "", "   ", "2024", "202401",
    "2024-01-02T03:04:05+15:00", "2024-01-02T03:04:05+14:59",
    "2024-01-02T03:04:05-15:30", "2024-01-02T03:04:05+00:30",
    "2024-01-02T030405", "2024-01-02T0304", "20240102T030405",
    "20240102030405", "2024-01-02 03.04.05", "03:04:05 2024-01-02",
    "2024-Jan-02", "02/Jan/2024", "2024, Jan 2", "Jan. 2, 2024",
    "2024-01-02T03:04:05.123456789", "2024-01-02T03:04:05,123",
    "Thursday, January 2, 2024", "Thu Jan 2 2024", "wed jan 3 2024",
    "2024-01-02 AD", "02.01.2024", "31.12.2024", "2024-01-02T03",
    "2024-01-02 3am", "2024-01-02 3 am", "11:00 PM 2024-01-02",
    "2024-01-02T03:04:05 +02:00", "2024-01-02T03:04:05Z+02:00",
    # review-found divergent shapes (now pinned)
    "2024--1-02", "-024-01-02", "\u0662\u0660\u0662\u0664-\u0660\u0661-\u0660\u0662",
    "2024-\u0660\u0661-02", "0000-01-02", "0000-01-02T03:04:05",
    "Tue, 2 Jan 2024 03:04:05 -0300 (BRST)",
    "Tue, 2 Jan 2024 03:04:05 +0100 (CET)",
    "2024-01-02\u00a003:04:05", "2024-01-02\u008503:04:05",
    "2024-01-02\u202f03:04:05",
    "2024-01-02T03:04:05+9900", "2024-01-02T03:04:05-2400",
    "2024-01-02T03:04:05+23:59", "2024-01-02 1234.5", "1234.5",
    "2.5Jan2024", "12.5 am 2 Jan 2024", "2024-01-02 3.5:04",
    "0001-01-02", "9999-12-31T23:59:59",
]


def gen_combos():
    import random
    rng = random.Random(42)
    years = ["2024", "1999", "2003", "0099", "99", "12", "1900"]
    months_num = ["01", "1", "12", "09", "13"]
    month_names = ["Jan", "January", "sep", "Sept", "DEC", "jul"]
    days = ["01", "1", "31", "30", "29", "09", "2nd", "22"]
    seps = ["-", "/", ".", " "]
    times = ["", "03:04", "03:04:05", "3:4:5", "23:59:59", "03:04:05.25",
             "12:00", "0:00:00", "11:59:59.999999"]
    tzs = ["", "Z", "z", " GMT", " UTC", "+02:00", "-0500", "+09", " EST",
           " PST", "+00:00", "-00:30"]
    out = []
    for _ in range(2000):
        style = rng.randint(0, 3)
        sep = rng.choice(seps)
        y, d = rng.choice(years), rng.choice(days)
        if style == 0:
            date = sep.join([y, rng.choice(months_num), d])
        elif style == 1:
            date = sep.join([d, rng.choice(month_names), y])
        elif style == 2:
            date = sep.join([rng.choice(month_names), d, y])
        else:
            date = sep.join([rng.choice(months_num), d, y])
        t = rng.choice(times)
        joiner = rng.choice(["T", " ", " "]) if t else ""
        tz = rng.choice(tzs) if t else rng.choice(["", "", " GMT"])
        out.append(date + joiner + t + tz)
    return out


def main():
    rows = []
    # The stock default is TODAY with the time zeroed, so only missing
    # DATE fields are wall-clock-dependent: probe with two zero-time
    # defaults on different dates and compare.
    dA = datetime(2001, 3, 5)
    dB = datetime(2032, 8, 17)
    for s in SHAPES + gen_combos():
        row = {"in": s}
        try:
            rA = parser.parse(s, default=dA)
            rB = parser.parse(s, default=dB)
            if rA != rB:
                row["partial"] = True
            else:
                row["iso"] = rA.isoformat()
        except Exception:
            row["error"] = True
        rows.append(row)
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "golden", "dates_fuzz.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=True)
    n_err = sum(1 for r in rows if r.get("error"))
    n_part = sum(1 for r in rows if r.get("partial"))
    print(f"wrote {len(rows)} rows ({n_err} errors, {n_part} partial) -> dates_fuzz.json")


if __name__ == "__main__":
    main()
