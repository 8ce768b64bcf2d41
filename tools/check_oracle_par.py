#!/usr/bin/env python3
"""Parallel wrapper around check_oracle's per-query compare.

Usage: check_oracle_par.py <sfDir> <verifyOutDir> [workers] [skipLog]

Same semantics as check_oracle.py (same canon + compare), but fans the
queries out over a process pool — at sf1 the sequential loop is
hours-slow because each DuckDB oracle replay and pandas canonicalization
runs alone. If skipLog is given, keys already reported "  PASS <k>:" in
that log are not re-run (resume support for a killed sequential run).
"""
import sys, os, json, re
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon, TABLES  # noqa: E402

SF_DIR = None
OUT_DIR = None
ORACLES = None


def init(sf_dir, out_dir, oracles):
    global SF_DIR, OUT_DIR, ORACLES
    SF_DIR, OUT_DIR, ORACLES = sf_dir, out_dir, oracles


def check(name):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 4")
    for t in TABLES:
        p = os.path.join(SF_DIR, t + ".parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        s_df = con.sql(
            f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')").df()
    except Exception as e:
        return (name, False, f"spark result read error: {e}")
    if name not in ORACLES:
        return (name, len(s_df) > 0, f"ROWS-ONLY {len(s_df)} rows")
    try:
        o_df = con.sql(ORACLES[name]).df()
    except Exception as e:
        return (name, False, f"oracle SQL error: {e}")
    if sorted(s_df.columns) != sorted(o_df.columns):
        return (name, False,
                f"columns {sorted(s_df.columns)} vs {sorted(o_df.columns)}")
    try:
        a, b = canon(s_df), canon(o_df)
    except Exception as e:
        return (name, False, f"canon error: {type(e).__name__}: {e}")
    if a == b:
        return (name, True, f"{len(a)} rows")
    sa, sb = set(a), set(b)
    detail = [f"spark {len(a)} rows vs oracle {len(b)} rows"]
    detail += [f"spark-only: {x[:200]}" for x in list(sa - sb)[:3]]
    detail += [f"oracle-only: {x[:200]}" for x in list(sb - sa)[:3]]
    return (name, False, "; ".join(detail))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    skip = set()
    if len(sys.argv) > 4 and os.path.exists(sys.argv[4]):
        with open(sys.argv[4]) as f:
            skip = set(re.findall(r"^  PASS (\S+):", f.read(), re.M))
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    todo = [n for n in names if n not in skip]
    print(f"{len(names)} queries, {len(skip & set(names))} already passed, "
          f"{len(todo)} to run on {workers} workers", flush=True)
    n_pass, n_fail = len(skip & set(names)), 0
    with ProcessPoolExecutor(max_workers=workers, initializer=init,
                             initargs=(sf_dir, out_dir, oracles)) as ex:
        for name, ok, msg in ex.map(check, todo):
            print(f"  {'PASS' if ok else 'FAIL'} {name}: {msg}", flush=True)
            if ok:
                n_pass += 1
            else:
                n_fail += 1
    print(f"{n_pass} pass / {n_fail} fail / {len(names)} queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
