#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each <name> subdir in verifyOutDir (written by graft.Verify), run the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet
tables, sort columns by name, sort rows, and compare values exactly.

Deliberately routes both result sets through PANDAS, like the driver does:
- DuckDB HUGEINT (e.g. SUM over BIGINT) becomes float64 in pandas, so an
  un-CAST oracle aggregate stringifies as "99111.0" vs Spark's "99111"
  and fails the hash compare. CAST(... AS BIGINT) in the oracle SQL.
- pandas sort_values over an array-typed column raises TypeError
  (unhashable ndarray) — the driver reports that as `err`. Don't emit
  array columns from gated queries; scalarize them.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-style canonicalization: alphabetical column order, row sort
    via pandas sort_values (raises on unsortable cell types), then
    str()-per-cell lines. Type-sensitive: int64 1 != float64 1.0."""
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float) and v != v:  # NaN
                vals.append("NaN")
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
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
        try:
            s_df = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
        except Exception as e:
            print(f"  FAIL {name}: spark result read error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"  ROWS-ONLY {name}: {len(s_df)} rows "
                  f"{'OK' if len(s_df) > 0 else 'EMPTY!'}")
            continue
        try:
            o_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"  FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(s_df.columns) != sorted(o_df.columns):
            print(f"  FAIL {name}: columns {sorted(s_df.columns)} "
                  f"vs {sorted(o_df.columns)}")
            n_fail += 1
            continue
        try:
            a, b = canon(s_df), canon(o_df)
        except Exception as e:
            print(f"  FAIL {name}: canon error (driver would report err): "
                  f"{type(e).__name__}: {e}")
            n_fail += 1
            continue
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
