#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the standing numeric baseline for
the "within 2x of BASELINE" gate. Runs every oracle_sql.json entry
against the same parquet tables the Spark bench reads, min-of-N per
query (pass-structured like graft.Bench: N full passes over the
suite, per-query minimum across passes), and writes a JSON artifact.

Usage:
  python3 tools/baseline_duckdb.py /root/testdata/sf0.1 \
      /tmp/vout/oracle_sql.json /tmp/baseline_duckdb.json [passes]

Run QUIET (no concurrent JVMs) — same contamination rules as
graft.Bench. DuckDB uses all cores by default; thread count is
recorded in the artifact.
"""
import sys, os, json, time, subprocess
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def drop_caches():
    """Mirror graft.Bench's default cold-read posture: each timed
    window re-reads its parquet at disk speed. No-op without root.
    Opt out with GRAFT_BASELINE_KEEP_CACHES=1 (warm protocol)."""
    if os.environ.get("GRAFT_BASELINE_KEEP_CACHES") == "1":
        return False
    r = subprocess.run(
        ["sh", "-c", "{ sync && echo 3 > /proc/sys/vm/drop_caches; } 2>/dev/null"])
    return r.returncode == 0


def main(sfdir, oracle_path, out_path, passes=3):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    names = sorted(oracle)
    threads = con.execute("SELECT current_setting('threads')").fetchone()[0]

    cold = drop_caches()
    per_pass = []          # list of {name: sec} per pass
    pass_totals = []
    for p in range(passes):
        times = {}
        t_pass = time.monotonic()
        for name in names:
            if cold:
                drop_caches()   # outside the timed window, like graft.Bench
            t0 = time.monotonic()
            con.execute(oracle[name]).fetchall()   # full materialization
            times[name] = round(time.monotonic() - t0, 4)
        pass_totals.append(round(time.monotonic() - t_pass, 3))
        per_pass.append(times)
        print(f"pass {p + 1}/{passes}: {pass_totals[-1]}s", file=sys.stderr)

    best = {n: min(pp[n] for pp in per_pass) for n in names}
    artifact = {
        "engine": "duckdb",
        "version": duckdb.__version__,
        "threads": int(threads),
        "sf_dir": sfdir,
        "cold_reads": cold,
        "passes": passes,
        "queries": len(names),
        "pass_totals": pass_totals,
        "best_total": round(sum(best.values()), 3),
        "best_queries": best,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({k: artifact[k] for k in
                      ("engine", "version", "threads", "sf_dir", "passes",
                       "queries", "pass_totals", "best_total")}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 3)
