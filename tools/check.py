#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the shipped
library is pure Scala/Spark). Usage:

    python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads <out>/oracle_sql.json, registers each testdata parquet as a DuckDB
view, runs every oracle, and compares against the Spark-written parquet in
<out>/<name>/: schema (column names, sorted), row count, and exact value
equality. Floats are compared bit-exactly — that is the bar the driver's
hash comparison sets."""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        got, exp = got[gc], exp[gc]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # The driver hashes pandas values dtype-sensitively: a DuckDB HUGEINT
        # (e.g. an uncast window SUM(BIGINT)) lands as float64 while Spark
        # writes int64, and bit-identical values still hash-mismatch. Compare
        # dtypes first so this class of oracle-authoring bug fails locally.
        dbad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in gc
                if str(got[c].dtype) != str(exp[c].dtype)]
        if dbad:
            c, gd, ed = dbad[0]
            print(f"FAIL {name}: dtype col={c}: spark={gd} oracle={ed}")
            n_fail += 1
            continue
        bad = []
        for c in gc:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a != b and not (a is None and b is None) \
                        and str(a) != str(b):
                    bad.append((c, i, a, b))
                    break
        if bad:
            c, i, a, b = bad[0]
            print(f"FAIL {name}: first diff col={c} row={i}: "
                  f"spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
