#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify
output parquet against the DuckDB oracle SQL and compare values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_dir}/*.parquet"):
            print(f"FAIL {name}: no spark output at {spark_dir}")
            failed.append(name)
            continue
        try:
            s = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols, srows = norm_rows(s.columns, s.fetchall())
        except Exception as e:
            print(f"FAIL {name}: reading spark output: {e}")
            failed.append(name); continue
        try:
            d = con.sql(sql)
            dcols, drows = norm_rows(d.columns, d.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {str(e)[:300]}")
            failed.append(name); continue
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duckdb={dcols}")
            failed.append(name); continue
        if srows != drows:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print(f"FAIL {name}: {len(srows)} spark vs {len(drows)} duckdb rows; first diffs: {diff}")
            only_s = set(srows) - set(drows)
            only_d = set(drows) - set(srows)
            print(f"  only-spark({len(only_s)}): {list(only_s)[:2]}")
            print(f"  only-duck({len(only_d)}): {list(only_d)[:2]}")
            failed.append(name); continue
        print(f"PASS {name}: {len(srows)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
