#!/usr/bin/env python3
"""Full-surface DuckDB oracle sweep at any SF (dev tooling only — the
engine itself is pure Scala/Spark). The committed version of the sweep
that produced CORRECTNESS_sf01_r17_full.json, plus the fast min-label
oracle (check_oracle.derecursify): connected components computed by
union-find over the DuckDB-evaluated edge list instead of the ~hours
recursive-CTE replay, so NOTHING needs to be skipped.

Phases:
  0. derecursify every oracle (cc label tables computed once, serially —
     they are the expensive shared prefix) and hash the RESULTING text;
  1. precompute missing oracle results to parquet, N worker processes,
     per-query timeout; cache keyed by (name, sql-hash) so re-sweeps and
     unchanged-oracle rounds pay nothing;
  2. exact compare against the Spark dump (sorted columns+rows, same
     normalization as check_oracle.py / the driver's hash gate) and
     write the CORRECTNESS json artifact.

Usage:
  python3 tools/sweep_oracle.py <sf_dir> <spark_out_dir> <cache_dir> \
      <result_json> [--round N] [--workers 4] [--timeout 600]
  python3 tools/sweep_oracle.py --worker <sf_dir> <sql_file> <dst>
"""
import argparse
import hashlib
import json
import math
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from check_oracle import TABLES, cc_cache_dir, derecursify  # noqa: E402


def connect(sf_dir, threads):
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def worker(sf_dir, sql_file, dst):
    con = connect(sf_dir, 8)
    sql = open(sql_file).read()
    con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def canon(df, cols):
    return sorted(
        tuple(norm(v) for v in r) for r in df[cols].itertuples(index=False))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("spark_out_dir")
    ap.add_argument("cache_dir")
    ap.add_argument("result_json")
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=600)
    a = ap.parse_args()
    os.makedirs(a.cache_dir, exist_ok=True)

    oracle = json.load(open(f"{a.spark_out_dir}/oracle_sql.json"))

    # phase 0: fast min-label oracles (serial — the cc label tables are
    # the expensive shared prefix; computed once, reused by every
    # embedding query AND by parallel workers via the parquet cache)
    con = connect(a.sf_dir, 16)
    ccd = cc_cache_dir(a.sf_dir)
    fast = {}
    for name in sorted(oracle):
        t0 = time.time()
        fast[name] = derecursify(con, oracle[name], ccd)
        if fast[name] != oracle[name]:
            print(f"derecursified {name} ({time.time() - t0:.1f}s)",
                  flush=True)
    con.close()

    # phase 1: precompute oracle results, cache keyed by (name, sql hash)
    def dst_path(name):
        h = hashlib.md5(fast[name].encode()).hexdigest()[:12]
        return f"{a.cache_dir}/{name}.{h}.parquet"

    def run(name):
        dst = dst_path(name)
        if os.path.exists(dst):
            return (name, "cached", 0.0)
        sql_file = f"{a.cache_dir}/{name}.sql"
        open(sql_file, "w").write(fast[name])
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 a.sf_dir, sql_file, dst + ".tmp"],
                capture_output=True, text=True, timeout=a.timeout)
            dt = time.time() - t0
            if r.returncode != 0:
                tail = (r.stderr.strip().splitlines() or ["?"])[-1][:160]
                return (name, "ERR: " + tail, dt)
            os.rename(dst + ".tmp", dst)
            return (name, "ok", dt)
        except subprocess.TimeoutExpired:
            return (name, "TIMEOUT", time.time() - t0)

    statuses = {}
    with ThreadPoolExecutor(max_workers=a.workers) as ex:
        for name, status, dt in ex.map(run, sorted(oracle)):
            statuses[name] = status
            print(f"{status:8s} {name} ({dt:.1f}s)", flush=True)
    # contention evictions (parallel timeout, fine solo): one serial retry
    for name in sorted(n for n, s in statuses.items() if s == "TIMEOUT"):
        print(f"solo retry {name}", flush=True)
        name, status, dt = run(name)
        statuses[name] = status
        print(f"{status:8s} {name} (solo, {dt:.1f}s)", flush=True)

    # phase 2: compare
    con = connect(a.sf_dir, 16)
    results, skipped = {}, []
    npass = nfail = 0
    names = sorted(d for d in os.listdir(a.spark_out_dir)
                   if os.path.isdir(os.path.join(a.spark_out_dir, d)))
    for name in names:
        if name not in oracle:
            continue  # rows-only queries are the driver gate's business
        op = dst_path(name)
        if not os.path.exists(op):
            skipped.append(f"{name}: {statuses.get(name, 'no oracle run')}")
            continue
        want = con.execute(f"SELECT * FROM '{op}'").fetchdf()
        got = con.execute(
            f"SELECT * FROM '{a.spark_out_dir}/{name}/*.parquet'").fetchdf()
        wc, gc = sorted(want.columns), sorted(got.columns)
        ok = (wc == gc and len(want) == len(got)
              and canon(want, wc) == canon(got, gc))
        results[name] = {"match": bool(ok), "rows": int(len(got))}
        if ok:
            npass += 1
        else:
            nfail += 1
            print(f"FAIL {name}: schema {gc} vs {wc}, "
                  f"rows spark={len(got)} oracle={len(want)}")
            if wc == gc and len(want) == len(got):
                w, g = canon(want, wc), canon(got, gc)
                bad = next((i, x, y) for i, (x, y) in enumerate(zip(w, g))
                           if x != y)
                print(f"  oracle: {bad[1]}\n  spark : {bad[2]}")
    print(f"\n{npass} pass, {nfail} fail, {len(skipped)} skipped: {skipped}")
    json.dump(
        {"round": a.round, "sf_dir": a.sf_dir,
         "scope": "FULL-SURFACE oracle sweep (tools/sweep_oracle.py): "
                  "every driver query with a DuckDB oracle",
         "method": "Spark dump at the given SF + DuckDB exact value "
                   "compare (sorted columns+rows); oracle side "
                   "precomputed to parquet keyed by (name, sql-hash), "
                   f"{a.workers}-way parallel, {a.timeout}s/query budget "
                   "+ serial retry of contention evictions; min-label "
                   "recursive CTEs replaced by the exact union-find "
                   "fast path (check_oracle.derecursify — A/B-proven "
                   "equal to the recursive CTE at sf0.001 and sf0.01)",
         "n_pass": npass, "n_fail": nfail, "skipped_oracle": skipped,
         "queries": results},
        open(a.result_json, "w"), indent=1)
    return 1 if nfail else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3], sys.argv[4])
        sys.exit(0)
    sys.exit(main())
