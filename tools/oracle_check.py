#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL
from <outDir>/oracle_sql.json in DuckDB over the sfDir parquet tables and
compare against the Spark result parquet dumped by graft.Verify.

Usage: python3 tools/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # repr keeps floats at full precision so true mismatches surface
    return repr(v)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{spark_glob[0]}'").fetchdf()
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if want.dtypes.to_dict() != got.dtypes.to_dict():
            print(f"WARN {name}: dtypes differ want={want.dtypes.to_dict()} got={got.dtypes.to_dict()}")
        wv = [tuple(norm(v) for v in row) for row in want.itertuples(index=False)]
        gv = [tuple(norm(v) for v in row) for row in got.itertuples(index=False)]
        if wv == gv:
            print(f"PASS {name} ({len(wv)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if len(wv) != len(gv):
                print(f"FAIL {name}: row count want={len(wv)} got={len(gv)}")
            else:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(wv, gv)) if a != b]
                print(f"FAIL {name}: {len(diffs)}/{len(wv)} rows differ; first: "
                      f"row {diffs[0][0]} want={diffs[0][1]} got={diffs[0][2]}")
    # non-oracle queries: rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        pq = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM '{pq[0]}'").fetchone()[0] if pq else 0
        print(f"INFO {name}: rows-only check, {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
