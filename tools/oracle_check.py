#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 gate: run each oracle SQL in DuckDB
over the fixture parquet, load the Spark result parquet written by
graft.Verify, and compare (columns sorted by name, rows sorted, exact
values). Not part of the Scala library."""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fail += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    cols = list(exp.columns)
    exp_rows = sorted(map(tuple, exp.itertuples(index=False)), key=repr)
    got_rows = sorted(map(tuple, got.itertuples(index=False)), key=repr)
    bad = None
    for i, (a, b) in enumerate(zip(exp_rows, got_rows)):
        for c, (x, y) in enumerate(zip(a, b)):
            same = (x == y) or (x is None and y is None)
            if not same:
                try:
                    import pandas as pd
                    if pd.isna(x) and pd.isna(y):
                        same = True
                except (TypeError, ValueError):
                    pass
            if not same:
                bad = (i, cols[c], x, y)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: exp={bad[2]!r} got={bad[3]!r}")
        fail += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} oracle queries pass")
sys.exit(1 if fail else 0)
