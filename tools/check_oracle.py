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
import hashlib
import json
import math
import os
import re
import sys
import tempfile

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# ---------------------------------------------------------------------------
# Fast min-label oracle (harness-side only — oracle_sql.json keeps the pure
# recursive-CTE contract the driver runs).
#
# The min-label family's oracles spell connected components as a recursive
# CTE (`reach` = full reachability, O(V*E) intermediate rows), which DuckDB
# replays in ~hours at sf0.1. Semantics are identical to: union-find over
# the SAME symmetric `edges` CTE, labeling each node with the min id in its
# component. So: evaluate the edges prefix in DuckDB (the pair join — the
# part that IS oracle-verified separately via the pair-list queries), union-
# find in Python (seconds), and swap the reach+comp block for a lookup into
# the computed label table. Labels are cached to parquet keyed by the hash
# of the edges-producing SQL, so the 6 queries embedding the same clustering
# pay the pair join once.
# ---------------------------------------------------------------------------

REACH_BLOCK = re.compile(
    r"reach\(id, r\) AS \(\s*"
    r"SELECT src, src FROM edges\s*"
    r"UNION\s*"
    r"SELECT e\.src, reach\.r FROM edges e JOIN reach ON e\.dst = reach\.id\s*\),\s*"
    r"comp AS \(SELECT id, min\(r\) AS (\w+) FROM reach GROUP BY id\)")


def _cc_min_labels(edges):
    """Union-find with attach-larger-root-under-smaller: the root of each
    tree is always the min element of its set, so find(x) at the end IS
    the min-label connected component id the recursive CTE computes."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for s, d in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        ra, rb = find(s), find(d)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(x, find(x)) for x in parent]


def cc_cache_dir(sf_dir):
    """Label cache is per-DATASET: the same edges SQL text runs against
    different views at each sf, so the sf dir is part of the cache path."""
    return os.path.join(tempfile.gettempdir(), "graft_cc_cache",
                        hashlib.md5(sf_dir.encode()).hexdigest())


def derecursify(con, sql, cache_dir):
    """Replace every min-label reach+comp recursive block in `sql` with a
    parquet-backed label table computed by union-find over the same-scope
    `edges` CTE. Returns sql unchanged when the pattern is absent."""
    os.makedirs(cache_dir, exist_ok=True)
    while True:
        m = REACH_BLOCK.search(sql)
        if not m:
            return sql
        label = m.group(1)
        scope = sql.rfind("WITH RECURSIVE", 0, m.start())
        assert scope >= 0, "reach block outside a WITH RECURSIVE scope"
        prefix = sql[scope:m.start()].rstrip().rstrip(",")
        edges_sql = prefix + " SELECT src, dst FROM edges"
        path = os.path.join(
            cache_dir,
            "cc_" + hashlib.md5(edges_sql.encode()).hexdigest() + ".parquet")
        if not os.path.exists(path):
            comp = _cc_min_labels(con.execute(edges_sql).fetchall())
            tmp = path + ".tmp"
            import pandas as pd
            df = pd.DataFrame(comp, columns=["id", "cc"]).astype("int64")
            con.register("graft_cc_tmp", df)
            con.execute(
                f"COPY (SELECT id, cc FROM graft_cc_tmp) TO '{tmp}' (FORMAT PARQUET)")
            con.unregister("graft_cc_tmp")
            os.rename(tmp, path)
        sql = (sql[:m.start()] +
               f"comp AS (SELECT id, cc AS {label} FROM read_parquet('{path}'))" +
               sql[m.end():])


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
            want = con.execute(
                derecursify(con, sql, cc_cache_dir(sf_dir))).fetchdf()
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
