#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet tables.
Compares schema (column names sorted) and values (rows sorted) per query.

Usage: python3 tools/check.py [sfdir] [verify_out_dir] [query_filter...]
"""
import sys, json, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_path = f"{outdir}/{name}"
    if not glob.glob(f"{spark_path}/*.parquet"):
        bad.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        ddf = con.sql(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"SQL ERROR: {str(e)[:200]}"))
        continue
    s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
    if s_cols != d_cols:
        bad.append((name, f"SCHEMA spark={s_cols} duck={d_cols}"))
        continue
    # The driver's hash is dtype-sensitive (round-1 q96: DuckDB window
    # sum(BIGINT) -> HUGEINT vs Spark BIGINT hashed differently with equal
    # values) — so flag dtype drift as a failure here too.
    # ... but int WIDTH differences (int32 vs int64) hash the same (q61/q94
    # were green in round 1), so compare dtype KIND only: HUGEINT/decimal
    # surface as float64/object and still get caught.
    dt = [(c, str(sdf[c].dtype), str(ddf[c].dtype)) for c in s_cols
          if sdf[c].dtype.kind != ddf[c].dtype.kind]
    if dt:
        bad.append((name, f"DTYPE {dt}"))
        continue
    if len(sdf) != len(ddf):
        bad.append((name, f"ROWCOUNT spark={len(sdf)} duck={len(ddf)}"))
        continue
    s = sdf[s_cols].sort_values(s_cols).reset_index(drop=True)
    d = ddf[d_cols].sort_values(d_cols).reset_index(drop=True)
    mismatch = None
    for c in s_cols:
        sv, dv = s[c], d[c]
        try:
            eq = (sv == dv) | (sv.isna() & dv.isna())
        except Exception:
            eq = sv.astype(str) == dv.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = f"VALUE col={c} row={i} spark={sv[i]!r} duck={dv[i]!r} ({int((~eq).sum())} diffs)"
            # dtype note
            mismatch += f" [dtypes {sv.dtype}/{dv.dtype}]"
            break
    if mismatch:
        bad.append((name, mismatch))
    else:
        ok.append((name, len(sdf)))

for name, n in ok:
    print(f"PASS {name} ({n} rows)")
for name, msg in bad:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(ok)} pass / {len(bad)} fail")
sys.exit(1 if bad else 0)
