#!/usr/bin/env python3
"""Local pre-verification of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>
Reads each <outDir>/<query> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB (with views for
the sfDir tables), and compares row count, column names, and values
(rows sorted, exact equality; floats compared bitwise after float64 cast).
Dev-only tool — the real gate is driver-side.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:300]}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={got_cols} oracle={exp_cols}")
            failures += 1
            continue
        # driver sorts columns by name; mirror that, then sort rows
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted(tuple(canon_cell(r[i]) for i in gi) for r in got)
        e = sorted(tuple(canon_cell(r[i]) for i in ei) for r in exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            failures += 1
            continue
        diff = [(a, b) for a, b in zip(g, e) if a != b]
        if diff:
            print(f"FAIL {name}: {len(diff)}/{len(g)} rows differ; first: spark={diff[0][0]} oracle={diff[0][1]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(g)} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
