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

def array_col(cols, rows):
    """The driver's gate sorts the raw pandas frame, which crashes on
    array-typed cells (unhashable numpy.ndarray). Mirror that: any
    list-valued cell is a hard failure here too."""
    for r in rows:
        for c, v in zip(cols, r):
            if isinstance(v, (list, tuple)):
                return c
    return None

def dtype_kinds(rel):
    """Pandas dtype kind per column, as the driver's gate sees the data.
    The gate compares pandas frames, so DuckDB HUGEINT (windowed sum of
    BIGINT) surfacing as float64 vs Spark's int64 is a real mismatch even
    when every value is identical — fetchall()'s Python ints mask it,
    .df() does not. Width differences (int32 vs int64) hash the same in
    the gate, so compare the KIND ('i'/'u' vs 'f' vs 'O'...), with signed
    and unsigned ints treated as one kind."""
    kinds = {}
    for c, dt in rel.df().dtypes.items():
        k = dt.kind
        kinds[c] = 'i' if k in ('i', 'u') else k
    return kinds

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort RAW values first (like the driver's pandas sort_values),
    # canonicalize only afterwards — canonicalizing first masked the
    # round-1 array-sort failure
    raw = sorted((tuple(r[i] for i in order) for r in rows),
                 key=lambda t: tuple((v is None, v) for v in t))
    out = [tuple(canon(v) for v in t) for t in raw]
    return sorted(cols), out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir (e.g. ScaleUp output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
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
            sraw = s.fetchall()
            bad = array_col(s.columns, sraw)
            if bad is not None:
                print(f"FAIL {name}: array-typed output column '{bad}' — driver's pandas gate cannot sort it")
                failed.append(name); continue
            scols, srows = norm_rows(s.columns, sraw)
            skinds = dtype_kinds(s)
        except Exception as e:
            print(f"FAIL {name}: reading spark output: {e}")
            failed.append(name); continue
        try:
            # materialize once: the relation re-executes per consumption,
            # and heavy oracles (unrolled k-means CTEs) are read twice
            # below (values + dtype kinds)
            con.execute(f"CREATE OR REPLACE TEMP TABLE _oracle_out AS {sql}")
            d = con.sql("SELECT * FROM _oracle_out")
            draw = d.fetchall()
            bad = array_col(d.columns, draw)
            if bad is not None:
                print(f"FAIL {name}: array-typed ORACLE column '{bad}' — driver's pandas gate cannot sort it")
                failed.append(name); continue
            dcols, drows = norm_rows(d.columns, draw)
            dkinds = dtype_kinds(d)
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {str(e)[:300]}")
            failed.append(name); continue
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duckdb={dcols}")
            failed.append(name); continue
        kind_diff = {c: (skinds.get(c), dkinds.get(c)) for c in scols
                     if skinds.get(c) != dkinds.get(c)}
        if kind_diff:
            print(f"FAIL {name}: dtype-kind mismatch (spark, oracle): {kind_diff} — "
                  f"values may be identical but the driver's pandas gate hashes them differently")
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
