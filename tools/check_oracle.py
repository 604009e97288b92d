#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only —
the engine itself is pure Scala/Spark).

Runs DuckDB over the same parquet tables for every entry in
<outDir>/oracle_sql.json, compares against the Spark-written parquet in
<outDir>/<name>/, and reports row-count / schema / value mismatches.
Comparison: sort columns by name, sort rows by all columns, exact value
equality (floats compared exactly after both sides' round()s — any
diff here would also break a hash compare).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    def key(row):
        return tuple("\0N" if v is None else str(v) for v in row)
    return sorted(rows, key=key)


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    import datetime
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0][:120]}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: schema {gcols} != oracle {wcols}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        w = canon([tuple(norm(v) for v in r) for r in want[wcols].itertuples(index=False)])
        g = canon([tuple(norm(v) for v in r) for r in got[gcols].itertuples(index=False)])
        if w != g:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(w, g)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad[0]}:")
            print(f"  oracle: {bad[1]}")
            print(f"  spark : {bad[2]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    # queries without oracle -> rows-only; missing dir -> exec failure
    import os
    try:
        all_queries = json.load(open(f"{out_dir}/queries.json"))
    except Exception:
        all_queries = []
    for name in sorted(set(all_queries) | {
            d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}):
        if name in oracle:
            continue
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            print(f"FAIL {name}: query did not execute (no output dir)")
            n_fail += 1
            continue
        n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
        status = "PASS" if n > 0 else "FAIL"
        print(f"{status} {name} (rows-only: {n} rows)")
        if n == 0:
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
