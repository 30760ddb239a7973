#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each query dir under verify_out_dir, loads the Spark parquet result and the
oracle SQL (oracle_sql.json) evaluated by DuckDB over the sf_dir tables, sorts
columns by name, and compares row counts + values.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def main(out_dir, sf_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"  {name}: NO OUTPUT"); n_fail += 1; continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_df)} rows)"
                  + (" EMPTY!" if len(spark_df) == 0 else ""))
            n_rowsonly += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        # HUGEINT lint: DuckDB widens integer sums to HUGEINT, which the
        # driver hashes differently from Spark's BIGINT even when values
        # match (shipped twice: sp01/sp03 r5, sp03 r6). Fail loudly here.
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper()]
            if huge:
                print(f"  {name}: HUGEINT LINT {huge} — add CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1; continue
        except Exception:
            pass  # DESCRIBE unsupported for this statement shape; value compare still runs
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        if sorted(s.columns) != sorted(o.columns):
            print(f"  {name}: COLUMN MISMATCH spark={sorted(s.columns)} oracle={sorted(o.columns)}")
            n_fail += 1; continue
        if len(s) != len(o):
            print(f"  {name}: ROWCOUNT spark={len(s)} oracle={len(o)}"); n_fail += 1; continue
        sv = [tuple(norm(x) for x in r) for r in s.itertuples(index=False)]
        ov = [tuple(norm(x) for x in r) for r in o.itertuples(index=False)]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"  {name}: VALUE MISMATCH {len(bad)}/{len(sv)} rows; first at {i}:\n    spark={a}\n    duck ={b}")
            n_fail += 1
        else:
            print(f"  {name}: OK ({len(s)} rows)"); n_pass += 1
    print(f"\npass={n_pass} rows-only={n_rowsonly} fail={n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
