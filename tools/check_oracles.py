#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run graft.Verify into an outDir, then for each query load
<outDir>/<name>/ parquet and compare against the oracle SQL from
oracle_sql.json executed over the same sf's parquet tables.

DRIVER PARITY (r15): the driver loads both sides into pandas, sorts
columns by name, `sort_values` over every column, and hashes. That path
dies on LIST/MAP-typed columns (`unhashable type: numpy.ndarray`) and
mismatches when DuckDB's HUGEINT/DECIMAL becomes float64 while Spark's
BIGINT stays int64 — classes the old tuple-based compare here silently
passed (q61/q83/q86/q89 in r14). This checker therefore compares THROUGH
pandas exactly as the driver does; a query that passes here passes there.

Usage: python3 tools/check_oracles.py /tmp/verify_out /root/testdata/sf0.001
"""
import duckdb, glob, json, sys
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(d.split("/")[-1] for d in glob.glob(f"{outdir}/*") if not d.endswith(".json"))


def driver_frame(df):
    """The driver's normalization: columns sorted by name, rows sorted by
    every column, floats rounded. Raises on driver-unhashable dtypes the
    same way the driver does."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


n_pass = n_fail = n_noracle = 0
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    got_df = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    if name not in oracle:
        print(f"---- {name}: no oracle (rows={len(got_df)})")
        n_noracle += 1
        continue
    try:
        want_df = con.execute(oracle[name]).df()
        if want_df is None:
            raise RuntimeError("oracle returned no relation (bare COPY/DDL?) "
                               "— model the result as a SELECT (q69/q77 convention)")
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    if sorted(got_df.columns) != sorted(want_df.columns):
        print(f"FAIL {name}: columns {sorted(got_df.columns)} vs {sorted(want_df.columns)}")
        n_fail += 1
        continue
    try:
        g = driver_frame(got_df)
        w = driver_frame(want_df)
    except Exception as e:
        print(f"FAIL {name}: DRIVER-UNHASHABLE ({type(e).__name__}: {e}) — "
              "flatten LIST/MAP outputs to strings in the declared text")
        n_fail += 1
        continue
    dtype_mismatch = [
        (c, str(g[c].dtype), str(w[c].dtype))
        for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
    if dtype_mismatch:
        print(f"FAIL {name}: pandas dtype mismatch (HUGEINT/DECIMAL class?) "
              f"{dtype_mismatch} — CAST the aggregate in BOTH statement texts")
        n_fail += 1
        continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        n_fail += 1
        continue
    eq = g.equals(w)
    if not eq:
        # Float columns: exact-equality after round can still differ in
        # representation; fall back to a tolerant elementwise check.
        try:
            pd.testing.assert_frame_equal(g, w, check_exact=False, rtol=0, atol=1e-9)
            eq = True
        except Exception:
            eq = False
    if eq:
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    else:
        print(f"FAIL {name}: value mismatch")
        diff = (g.astype(str) != w.astype(str))
        rows = diff.any(axis=1)
        idx = list(g.index[rows])[:3]
        for i in idx:
            print(f"  row {i}:\n   got  {list(g.loc[i])}\n   want {list(w.loc[i])}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} without oracle")
sys.exit(1 if n_fail else 0)
