#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run graft.Verify into an outDir, then for each query load
<outDir>/<name>/ parquet and compare (schema + sorted rows) against the
oracle SQL from oracle_sql.json executed over the same sf's parquet tables.

Usage: python3 tools/check_oracles.py /tmp/verify_out /root/testdata/sf0.001
"""
import duckdb, glob, json, math, sys

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(d.split("/")[-1] for d in glob.glob(f"{outdir}/*") if not d.endswith(".json"))

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 9) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))

n_pass = n_fail = n_noracle = 0
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    got_cols = [d[0] for d in got.description]
    got_rows = got.fetchall()
    if name not in oracle:
        print(f"---- {name}: no oracle (rows={len(got_rows)})")
        n_noracle += 1
        continue
    try:
        want = con.execute(oracle[name])
        want_cols = [d[0] for d in want.description]
        want_rows = want.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    # driver sorts columns by name before hashing
    gidx = [got_cols.index(c) for c in sorted(got_cols)]
    widx = [want_cols.index(c) for c in sorted(want_cols)]
    if sorted(got_cols) != sorted(want_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(want_cols)}")
        n_fail += 1
        continue
    g = norm([[r[i] for i in gidx] for r in got_rows])
    w = norm([[r[i] for i in widx] for r in want_rows])
    if g == w:
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    else:
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        for i, (a, b) in enumerate(zip(g, w)):
            if a != b:
                print(f"  first diff at {i}:\n   got  {a}\n   want {b}")
                break
        if len(g) != len(w):
            only_g = [r for r in g if r not in w][:3]
            only_w = [r for r in w if r not in g][:3]
            print(f"   only-got {only_g}\n   only-want {only_w}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} without oracle")
sys.exit(1 if n_fail else 0)
