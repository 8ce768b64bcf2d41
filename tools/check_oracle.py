#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each <name> subdir in verifyOutDir (written by graft.Verify), run the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet
tables, sort columns by name, sort rows, and compare values exactly.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols = list(spark_rel.columns)
        s_rows = spark_rel.fetchall()
        if name not in oracles:
            print(f"  ROWS-ONLY {name}: {len(s_rows)} rows "
                  f"{'OK' if len(s_rows) > 0 else 'EMPTY!'}")
            continue
        try:
            o_rel = con.sql(oracles[name])
            o_cols = list(o_rel.columns)
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"  FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"  FAIL {name}: columns {sorted(s_cols)} vs {sorted(o_cols)}")
            n_fail += 1
            continue
        a, b = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if a == b:
            print(f"  PASS {name}: {len(a)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  FAIL {name}: spark {len(a)} rows vs oracle {len(b)} rows")
            sa, sb = set(a), set(b)
            for x in list(sa - sb)[:3]:
                print(f"    spark-only: {x[:200]}")
            for x in list(sb - sa)[:3]:
                print(f"    oracle-only: {x[:200]}")
    print(f"{n_pass} pass / {n_fail} fail / {len(names)} queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
