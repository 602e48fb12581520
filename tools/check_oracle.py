#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run the matching oracle SQL in DuckDB over the same parquet
tables, canonicalize both results (columns sorted by name, rows sorted),
and compare. Usage: check_oracle.py <verify_out_dir> <sf_dir>
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round-trip float text can differ in last ulp between engines;
        # normalize to 12 significant digits like the driver does
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame(con, sql):
    cur = con.sql(sql)
    cols = list(cur.columns)
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark result dumped")
            n_fail += 1
            continue
        try:
            scols, srows = frame(con, f"SELECT * FROM '{qdir}/*.parquet'")
            ocols, orows = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            print(f"FAIL {name}: schema {scols} vs oracle {ocols}")
            n_fail += 1
        elif srows != orows:
            diff = next((i for i, (a, b) in enumerate(zip(srows, orows)) if a != b),
                        min(len(srows), len(orows)))
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}; first diff @ {diff}:")
            print(f"  spark : {srows[diff] if diff < len(srows) else '<eof>'}")
            print(f"  oracle: {orows[diff] if diff < len(orows) else '<eof>'}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
