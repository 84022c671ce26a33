#!/usr/bin/env python3
"""Local replica of the driver's DuckDB hash gate.

Usage: python3 tools/check.py SFDIR OUTDIR [names...]

Compares each Verify parquet dump under OUTDIR against DuckDB running the
same oracle SQL (OUTDIR/oracle_sql.json) over the SFDIR parquet tables —
columns sorted by name, row count + stringified values compared exactly,
mirroring the driver's compare. Queries without an oracle are reported as
rows-only. Exit 0 = every oracled query matches.
"""
import sys
import json

import duckdb

argv = sys.argv[1:]
json_out = None
if "--json" in argv:
    i = argv.index("--json")
    json_out = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
sfdir, outdir = argv[0], argv[1]
names = argv[2:]
results = {}

con = duckdb.connect()
for tname in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {tname} AS SELECT * FROM '{sfdir}/{tname}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
missing = []
if not names:
    import os
    found = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(f"{outdir}/{d}"))
    # an oracled query that crashed in Verify and left no dump is a FAILURE,
    # not a silent skip
    missing = sorted(set(oracles) - set(found))
    names = found

fails = 0
for name in names:
    if name not in oracles:
        try:
            n = len(con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf())
            print(f"{name}: NO ORACLE (rows-only, {n} rows)")
            results[name] = {"status": "no_oracle", "rows": n}
        except Exception as e:
            print(f"{name}: ERR reading dump: {e}")
            results[name] = {"status": "err", "error": str(e)}
            fails += 1
        continue
    try:
        spark = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        oracle = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ERR {e}")
        results[name] = {"status": "err", "error": str(e)}
        fails += 1
        continue
    sc, oc = sorted(spark.columns), sorted(oracle.columns)
    ok_cols = sc == oc
    ok_rows = len(spark) == len(oracle)
    ok_vals = False
    if ok_cols and ok_rows:
        # sort rows deterministically: ORDER BY ties in non-key columns must
        # not false-fail the compare
        a_raw = spark[sc].astype(str).values.tolist()
        b_raw = oracle[oc].astype(str).values.tolist()
        a = sorted(a_raw)
        b = sorted(b_raw)
        ok_vals = a == b
    if ok_cols and ok_rows and ok_vals:
        # values match set-wise; surface (without failing) when the ROW
        # ORDER diverges — a dropped ORDER BY would otherwise pass silently.
        # Genuine ORDER BY ties in non-key columns also land here, which is
        # why this is a warning and not a failure.
        note = "" if a_raw == b_raw else " [order differs from oracle]"
        print(f"{name}: OK ({len(spark)} rows){note}")
        results[name] = {"status": "ok", "rows": len(spark)}
    else:
        fails += 1
        print(f"{name}: FAIL cols={ok_cols} ({sc} vs {oc}) rows={ok_rows} "
              f"({len(spark)} vs {len(oracle)}) vals={ok_vals}")
        results[name] = {"status": "fail", "cols_match": ok_cols,
                         "rows": [len(spark), len(oracle)], "vals_match": ok_vals}
        if ok_cols and ok_rows:
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}: spark={x} oracle={y}")
                    break
for name in missing:
    fails += 1
    print(f"{name}: FAIL missing-output (oracled query produced no dump)")
    results[name] = {"status": "fail", "error": "missing-output"}
if json_out:
    summary = {
        "sfdir": sfdir,
        "total": len(results),
        "oracled": sum(1 for r in results.values() if r["status"] in ("ok", "fail")),
        "ok": sum(1 for r in results.values() if r["status"] == "ok"),
        "no_oracle": sum(1 for r in results.values() if r["status"] == "no_oracle"),
        "failed": fails,
        "queries": results,
    }
    with open(json_out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
sys.exit(1 if fails else 0)
