#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare (dev tool only;
the shipped engine is pure Scala/Spark — see SURVEY.md §5.2).

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir>

For every query in <verifyOutDir>/oracle_sql.json:
  - register each bare table name as a DuckDB view over <sfDir>/<t>.parquet
  - run the oracle SQL
  - read the Spark result parquet
  - compare: row count, column names (sorted), and cell values in row
    order with columns sorted by name (the driver's hash normalization).
Exit code = number of mismatching queries.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            bad.append(name)
            continue
        # The driver's hash is type-sensitive: a DuckDB HUGEINT/DECIMAL
        # column str()-compares equal to Spark's BIGINT here but still
        # fails the driver hash (round-14 q_token_budget). Gate on type.
        leaky = [f"{c}:{t}" for c, t in zip(dcols, dtypes)
                 if any(k in t.upper() for k in
                        ("HUGEINT", "UHUGEINT", "DECIMAL"))]
        if leaky:
            print(f"FAIL {name}: oracle emits driver-hash-unsafe types: {leaky}")
            bad.append(name)
            continue
        try:
            sq = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in sq.description]
            srows = sq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            bad.append(name)
            continue
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: columns duck={sorted(dcols)} spark={sorted(scols)}")
            bad.append(name)
            continue
        if len(drows) != len(srows):
            print(f"FAIL {name}: rows duck={len(drows)} spark={len(srows)}")
            bad.append(name)
            continue
        dperm = [dcols.index(c) for c in sorted(dcols)]
        sperm = [scols.index(c) for c in sorted(scols)]
        mism = 0
        for i, (dr, sr) in enumerate(zip(drows, srows)):
            dv = [norm(dr[j]) for j in dperm]
            sv = [norm(sr[j]) for j in sperm]
            if dv != sv:
                if mism == 0:
                    print(f"FAIL {name}: first diff row {i}:\n  duck ={dv}\n  spark={sv}")
                mism += 1
        if mism:
            print(f"FAIL {name}: {mism} differing rows of {len(drows)}")
            bad.append(name)
        else:
            print(f"OK   {name} ({len(drows)} rows)")
    print(f"\n{len(oracle) - len(bad)}/{len(oracle)} match; failures: {bad}")
    sys.exit(len(bad))

if __name__ == "__main__":
    main()
