#!/usr/bin/env python3
"""Full-board value sweep one decade above the driver's gate.

Usage: python3 tools/sweep.py <verify_out_dir> <sf_dir> [out_json]

Same compare as tools/check.py (values with columns sorted by name and
rows sorted, plus the driver-parity int-vs-float pandas dtype gate), but
each query runs in its OWN subprocess with a wall timeout so a hung
oracle can never stall the board. The round-7 skip list is GONE: the
seven formerly-quadratic truth oracles (q30/q65/q135/q207/q209/q210/
q252) were rewritten to exactly-equivalent near-linear forms
(OracleSql.blockedPairs inverted-index blocking; q252 materialized-CTE
hash-join closure; old-vs-new parity pinned by tools/oracle_parity.py),
all <4 s in DuckDB at sf0.1. Output: a JSON artifact listing EVERY
query with ok/skip/fail status.
"""
import json
import multiprocessing as mp
import os
import sys

# Empty since round 8: every oracle is now sub-quadratic (see module
# docstring). Kept as a mechanism for any future genuinely-ungateable
# oracle; entries must carry a reason string.
SKIP = {}
TIMEOUT_S = int(os.environ.get("SWEEP_TIMEOUT_S", "180"))
JOBS = int(os.environ.get("SWEEP_JOBS", "6"))


def compare_one(args):
    """Runs inside a worker process: one query's full compare."""
    name, out_dir, sf_dir, sql = args
    import duckdb
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check  # reuse canon/norm/dtype_mismatches verbatim

    con = duckdb.connect()
    for t in check.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    con.sql(f"CREATE TEMP TABLE _got AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}/*.parquet')")
    got_rel = con.sql("SELECT * FROM _got")
    got_cols = [c.lower() for c in got_rel.columns]
    got = check.canon(got_rel.fetchall(), got_cols)
    if sql is None:
        return (name, "ok" if len(got) > 0 else "fail",
                f"rows-only: {len(got)} rows")
    try:
        con.sql(f"CREATE TEMP TABLE _exp AS {sql}")
    except Exception as e:
        return (name, "fail", f"oracle SQL error: {e}")
    exp_rel = con.sql("SELECT * FROM _exp")
    exp_cols = [c.lower() for c in exp_rel.columns]
    exp = check.canon(exp_rel.fetchall(), exp_cols)
    if sorted(got_cols) != sorted(exp_cols):
        return (name, "fail",
                f"schema {sorted(got_cols)} vs {sorted(exp_cols)}")
    if len(got) != len(exp):
        return (name, "fail", f"rowcount {len(got)} vs {len(exp)}")
    if got != exp:
        bad = [(g, e) for g, e in zip(got, exp) if g != e][:2]
        return (name, "fail", f"value mismatch e.g. {bad}")
    dt = check.dtype_mismatches(con.sql("SELECT * FROM _got").df(),
                                con.sql("SELECT * FROM _exp").df())
    if dt:
        return (name, "fail", f"dtype (driver-hash red): {dt}")
    return (name, "ok", f"rows={len(got)}")


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if not d.endswith(".json"))
    results = {}
    todo = []
    for n in names:
        if n in SKIP:
            results[n] = {"status": "skip", "note": SKIP[n] +
                          "; value-gated at sf0.01 by tools/check.py"}
        else:
            todo.append((n, out_dir, sf_dir, oracle.get(n)))
    # Each query in its own dedicated Process with a REAL per-task
    # deadline measured from its own start: a hung oracle is terminated
    # (freeing its slot) and can never starve queued healthy queries —
    # mp.Pool's get(timeout) abandons the future but leaves the worker
    # running, which both blocked a slot and falsely timed out tasks
    # still sitting in the queue.
    import collections
    import time

    def _worker(a, q):
        try:
            q.put(compare_one(a))
        except Exception as e:  # surfaced as a fail row, not a hang
            q.put((a[0], "fail", f"worker: {e}"))

    pending = collections.deque(todo)
    running = {}  # name -> (process, queue, started_at)
    while pending or running:
        while pending and len(running) < JOBS:
            a = pending.popleft()
            q = mp.Queue(1)
            pr = mp.Process(target=_worker, args=(a, q), daemon=True)
            pr.start()
            running[a[0]] = (pr, q, time.monotonic())
        time.sleep(0.2)
        for n in list(running):
            pr, q, t0 = running[n]
            if not q.empty():
                name, status, note = q.get()
                results[name] = {"status": status, "note": note}
            elif not pr.is_alive():
                # TOCTOU guard: the worker may have put its result and
                # exited between the q.empty() sample and this liveness
                # check (mp.Queue flushes via a feeder thread at exit).
                # Drain once with a timeout before declaring it dead.
                try:
                    name, status, note = q.get(timeout=1)
                    results[name] = {"status": status, "note": note}
                except Exception:
                    results[n] = {"status": "fail",
                                  "note": "worker died without a result"}
            elif time.monotonic() - t0 > TIMEOUT_S:
                pr.terminate()
                results[n] = {"status": "fail",
                              "note": f"timeout >{TIMEOUT_S}s (killed)"}
            else:
                continue
            pr.join(5)
            del running[n]
            print(f"  {n}: {results[n]['status']} {results[n]['note']}",
                  flush=True)
    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    n_skip = sum(1 for r in results.values() if r["status"] == "skip")
    n_fail = len(results) - n_ok - n_skip
    summary = {
        "what": ("full-board sf0.1 value sweep: graft.Verify dumped every "
                 "registry query at sf0.1 (10x the driver's gate SF), each "
                 "DuckDB oracle re-run at sf0.1 under tools/check.py's "
                 "value + pandas-dtype compare, one subprocess per query "
                 f"with a {TIMEOUT_S}s timeout, {JOBS}-way parallel"),
        "why": ("the driver gates only sf0.01; scale-dependent divergences "
                "(tie-breaking, int64 overflow, div-by-zero, "
                "plan-dependent float paths) would hide there"),
        "n_ok": n_ok, "n_skip": n_skip, "n_fail": n_fail,
        "queries": results,
    }
    print(f"\n{n_ok} ok / {n_skip} skip / {n_fail} fail "
          f"of {len(results)}")
    if out_json:
        json.dump(summary, open(out_json, "w"), indent=1)
        print(f"wrote {out_json}")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
