#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify output
against DuckDB oracles over the same parquet tables. Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    # sort columns by name, then rows by all columns — driver-style
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        files = sorted(glob.glob(f"{spark_dir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        got = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}"); n_bad += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_bad += 1; continue
        # exact value compare (hash-equivalent)
        mismatch = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                same = (gv.astype(str).fillna("NULL") == ev.astype(str).fillna("NULL")).all()
            except Exception:
                same = gv.equals(ev)
            if not same:
                mismatch = c; break
        if mismatch:
            print(f"FAIL {name}: column {mismatch} differs")
            idx = (g[mismatch].astype(str) != e[mismatch].astype(str))
            print("  spark:", g[idx][mismatch].head(3).tolist())
            print("  duck :", e[idx][mismatch].head(3).tolist())
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
