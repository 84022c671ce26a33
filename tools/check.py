#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet and compare (columns sorted by name, rows
sorted, exact values) against the Spark output parquet written by Verify.

Usage: tools/check.py [sfDir] [verifyOutDir]
"""
import duckdb, sys, json, glob, os
import pyarrow as pa

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
declared = sorted(
    os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d))
fails = 0

for name in declared:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"[FAIL empty-out] {name}")
        fails += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetch_arrow_table()
    if name not in oracle:
        print(f"[rows-only] {name}: {got.num_rows} rows")
        continue
    try:
        exp = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as ex:
        print(f"[FAIL oracle-sql] {name}: {ex}")
        fails += 1
        continue
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        print(f"[FAIL cols] {name}: oracle={ecols} got={gcols}")
        fails += 1
        continue
    exp, got = exp.select(ecols), got.select(gcols)
    for cn in ecols:
        et, gt = exp.schema.field(cn).type, got.schema.field(cn).type
        if et != gt:
            print(f"[warn type] {name}.{cn}: oracle={et} got={gt}")
    if exp.num_rows != got.num_rows:
        print(f"[FAIL nrows] {name}: oracle={exp.num_rows} got={got.num_rows}")
        fails += 1
        continue
    ep, gp = exp.to_pylist(), got.to_pylist()
    key = lambda r: json.dumps(
        {k: str(v) for k, v in r.items()}, sort_keys=True)
    ep.sort(key=key)
    gp.sort(key=key)
    if ep != gp:
        bad = 0
        for i, (a, b) in enumerate(zip(ep, gp)):
            if a != b:
                if bad == 0:
                    print(f"[FAIL vals] {name} row {i}:\n  oracle={a}\n  got   ={b}")
                bad += 1
        print(f"[FAIL vals] {name}: {bad} mismatched rows of {exp.num_rows}")
        fails += 1
        continue
    print(f"[OK] {name} ({exp.num_rows} rows)")

missing = sorted(set(oracle) - set(declared))
if missing:
    print(f"[FAIL missing-output] {missing}")
    fails += len(missing)
print(f"\n{'FAIL' if fails else 'PASS'}: {fails} failures, "
      f"{len(declared)} outputs, {len(oracle)} oracled")
sys.exit(1 if fails else 0)
