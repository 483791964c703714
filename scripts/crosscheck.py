#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs every oracle SQL from `<outDir>/oracle_sql.json` in DuckDB against the
same parquet tables graft.Verify consumed (sf dir + side tables under
GRAFT_SIDE_DIR, default /tmp/graft_side), and compares against the Spark
result parquet per query: row count, sorted column names, and a canonical
value hash (columns sorted by name, rows sorted, repr-stringified — order
-insensitive like the driver's compare).

Usage:  python3 scripts/crosscheck.py [sfDir] [outDir]
        (defaults: /root/testdata/sf0.01 /tmp/verify_out)
"""
import hashlib
import json
import os
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def key(r):
        return tuple("\x00" if r[i] is None else repr(r[i]) for i in order)
    h = hashlib.sha256()
    for r in sorted(rows, key=key):
        for i in order:
            v = r[i]
            if isinstance(v, float):
                s = f"{v:.9g}"
            else:
                s = "\x00" if v is None else str(v)
            h.update(s.encode("utf-8", "replace"))
            h.update(b"\x01")
        h.update(b"\x02")
    return h.hexdigest()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/**/*.parquet')"
                        if os.path.isdir(p) else
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = []
    for name, sql in sorted(oracle.items()):
        qdir = os.path.join(out, name)
        spark = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()
        scols = [d[0] for d in con.description]
        rel = con.sql(sql)
        wcols = list(rel.columns)
        wtypes = [str(t) for t in rel.types]
        # Driver-hasher fragility gate: DuckDB HUGEINT (uncast sum()) and
        # DECIMAL canonicalize differently in the driver's hasher than in
        # this fetchall-to-Python-int path (r4 lesson: the only two driver
        # hash-fails were exactly the only two HUGEINT-emitting oracles).
        # No oracle may emit them — cast to BIGINT/DOUBLE in the SQL.
        fragile = [f"{c}:{t}" for c, t in zip(wcols, wtypes)
                   if "HUGEINT" in t or "DECIMAL" in t]
        want = rel.fetchall()
        rows_ok = len(spark) == len(want)
        schema_ok = sorted(scols) == sorted(wcols)
        hash_ok = schema_ok and canon(spark, scols) == canon(want, wcols)
        status = "OK" if (rows_ok and schema_ok and hash_ok and not fragile) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{status} {name}: rows {len(spark)}/{len(want)} "
              f"schema_ok={schema_ok} hash_ok={hash_ok}"
              + (f" FRAGILE_TYPES={fragile}" if fragile else ""))
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} OK; fails: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
