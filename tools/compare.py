#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of the
library): runs Verify's parquet dumps against the DuckDB oracle SQL and
reports per-query row/schema/value match. Usage:

  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out [query...]
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        spark = spark[sorted(spark.columns)]
        want = want[sorted(want.columns)]
        if list(spark.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(spark.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(spark) != len(want):
            print(f"FAIL {name}: rows {len(spark)} vs {len(want)}")
            n_bad += 1
            continue
        srows = [tuple(canon(v) for v in r) for r in spark.itertuples(index=False)]
        wrows = [tuple(canon(v) for v in r) for r in want.itertuples(index=False)]
        if srows != wrows:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, wrows)) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(spark)} rows)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
