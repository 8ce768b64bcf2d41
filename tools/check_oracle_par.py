#!/usr/bin/env python3
"""Parallel wrapper around check_oracle's per-query compare.

Usage:
  check_oracle_par.py <sfDir> <verifyOutDir> [workers] [skipLog] [timeoutSec]
  check_oracle_par.py --one <sfDir> <verifyOutDir> <name>   (internal)

Same semantics as check_oracle.py (same canon + compare), but each query
runs in its OWN subprocess with a hard timeout — at sf1 a handful of
DuckDB oracle replays are pathological (tens of GB of spill); a timeout
kills the child (releasing its spill) and reports ORACLE-TIMEOUT instead
of wedging the whole gate. Results print as they complete (unordered).
Keys already reported "  PASS <k>:" in skipLog are not re-run.
"""
import sys, os, json, re, subprocess, time
from concurrent.futures import ThreadPoolExecutor, as_completed

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon, TABLES  # noqa: E402


def check_one(sf_dir, out_dir, name):
    import duckdb, tempfile
    con = duckdb.connect()
    # Default 4 threads / 12 GB fits 8 concurrent children on the
    # 32-core/128 GB box; the retry pass for heavy keys (graph/knn
    # replays at sf3) overrides via env with fewer, fatter children.
    con.execute(f"SET threads TO {os.environ.get('ORACLE_THREADS', '4')}")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("ORACLE_MEM", "12GB"))
    # Each child gets its OWN spill dir: concurrent children sharing the
    # default cwd-relative ".tmp" delete each other's temp files. Created
    # UNDER the verify out dir so the parent can rmtree it even when this
    # child is killed by the timeout mid-spill (r10 advisory: orphaned
    # mkdtemp dirs accumulated tens of GB across ORACLE-TIMEOUT runs).
    spill_parent = os.path.join(out_dir, ".oracle_spill")
    os.makedirs(spill_parent, exist_ok=True)
    con.execute(
        f"SET temp_directory="
        f"'{tempfile.mkdtemp(prefix=name + '_', dir=spill_parent)}'")
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    try:
        s_df = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
    except Exception as e:
        return (False, f"spark result read error: {e}")
    if name not in oracles:
        return (len(s_df) > 0, f"ROWS-ONLY {len(s_df)} rows")
    try:
        o_df = con.sql(oracles[name]).df()
    except Exception as e:
        return (False, f"oracle SQL error: {e}")
    if sorted(s_df.columns) != sorted(o_df.columns):
        return (False,
                f"columns {sorted(s_df.columns)} vs {sorted(o_df.columns)}")
    try:
        a, b = canon(s_df), canon(o_df)
    except Exception as e:
        return (False, f"canon error: {type(e).__name__}: {e}")
    if a == b:
        return (True, f"{len(a)} rows")
    sa, sb = set(a), set(b)
    detail = [f"spark {len(a)} rows vs oracle {len(b)} rows"]
    detail += [f"spark-only: {x[:200]}" for x in list(sa - sb)[:3]]
    detail += [f"oracle-only: {x[:200]}" for x in list(sb - sa)[:3]]
    return (False, "; ".join(detail))


def main():
    if sys.argv[1] == "--one":
        ok, msg = check_one(sys.argv[2], sys.argv[3], sys.argv[4])
        print(("PASS " if ok else "FAIL ") + msg)
        sys.exit(0 if ok else 1)
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    skip = set()
    if len(sys.argv) > 4 and os.path.exists(sys.argv[4]):
        with open(sys.argv[4]) as f:
            skip = set(re.findall(r"^ *PASS (\S+):", f.read(), re.M))
    timeout = int(sys.argv[5]) if len(sys.argv) > 5 else 900
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and not d.startswith("."))  # skip .oracle_spill
    todo = [n for n in names if n not in skip]
    print(f"{len(names)} queries, {len(skip & set(names))} already passed, "
          f"{len(todo)} to run on {workers} workers, {timeout}s/key cap",
          flush=True)

    def run(name):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout)
            line = (r.stdout.strip().splitlines() or ["FAIL empty output"])[0]
            ok = line.startswith("PASS")
            msg = line.split(" ", 1)[1] if " " in line else line
            if not ok and r.stderr:
                msg += " | " + r.stderr.strip().splitlines()[-1][:200]
        except subprocess.TimeoutExpired:
            ok, msg = False, f"ORACLE-TIMEOUT after {timeout}s (DuckDB side)"
        return name, ok, msg, time.time() - t0

    # Reap any stale spill left by a previous interrupted run BEFORE
    # children start creating fresh dirs under the same parent.
    import shutil
    shutil.rmtree(os.path.join(out_dir, ".oracle_spill"),
                  ignore_errors=True)
    n_pass, n_fail = len(skip & set(names)), 0
    try:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [ex.submit(run, n) for n in todo]
            for f in as_completed(futs):
                name, ok, msg, dt = f.result()
                print(f"  {'PASS' if ok else 'FAIL'} {name}: {msg} "
                      f"[{dt:.0f}s]", flush=True)
                n_pass += ok
                n_fail += not ok
    finally:
        # Reap every child's spill dir — a timeout-killed DuckDB can
        # leave tens of GB behind; finally makes cleanup unconditional
        # even on KeyboardInterrupt / worker exception (r11 advisory).
        shutil.rmtree(os.path.join(out_dir, ".oracle_spill"),
                      ignore_errors=True)
    print(f"{n_pass} pass / {n_fail} fail / {len(names)} queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
