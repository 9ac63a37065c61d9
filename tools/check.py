#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of the
engine; the shipped library is pure Scala/Spark). Runs each oracle SQL in
DuckDB over the same parquet tables and compares against the Verify dump:
column names (sorted), row count, and cell values on row-sorted frames.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_r1 [--json out.json]

--json writes a driver-shaped artifact ({query: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) so a builder re-run can commit
evidence in the same schema the driver's CORRECTNESS_r{N}.json uses.
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
json_out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None
report = {}
con = duckdb.connect()
# Deliberately NON-UTC: every oracle must be timezone-free (naive
# TIMESTAMP arithmetic only), and pinning the gate to an offset zone
# keeps that property enforced — a TZ-sensitive oracle fails here even
# if the driver's DuckDB happens to run in UTC.
con.execute("SET TimeZone='Asia/Tokyo'")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    rec = report[name] = {"rows_match": False, "schema_match": False,
                          "hash_match": False, "spark_rows": None,
                          "oracle_rows": None, "err": None}
    try:
        exp = con.sql(sql).df()
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        rec["err"] = f"{type(e).__name__}: {e}"
        fail += 1
        continue
    rec["spark_rows"], rec["oracle_rows"] = len(got), len(exp)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    rec["schema_match"] = list(exp.columns) == list(got.columns)
    rec["rows_match"] = len(exp) == len(got)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    bad = []
    for c in exp.columns:
        for i in range(len(exp)):
            a, b = exp[c].iloc[i], got[c].iloc[i]
            if isinstance(a, float) or isinstance(b, float):
                an, bn = (a != a), (b != b)  # NaN checks
                if an != bn or (not an and a != b):
                    bad.append((c, i, a, b))
            elif a != b:
                bad.append((c, i, a, b))
    if bad:
        print(f"FAIL {name}: {len(bad)} cell diffs, first: {bad[:3]}")
        # dtype hint
        print(f"     dtypes exp={dict(exp.dtypes.astype(str))}")
        print(f"     dtypes got={dict(got.dtypes.astype(str))}")
        rec["err"] = f"{len(bad)} cell diffs"
        fail += 1
    else:
        rec["hash_match"] = True
        dt_exp = dict(exp.dtypes.astype(str))
        dt_got = dict(got.dtypes.astype(str))
        note = "" if dt_exp == dt_got else f"  [dtype drift exp={dt_exp} got={dt_got}]"
        print(f"PASS {name} ({len(exp)} rows){note}")

rows_only = [d.split("/")[-1] for d in glob.glob(f"{outdir}/*")
             if not d.endswith(".json") and d.split("/")[-1] not in oracle]
for name in sorted(rows_only):
    try:
        n = len(pd.read_parquet(f"{outdir}/{name}"))
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n} rows)")
        fail += 0 if n > 0 else 1
        report[name] = {"rows_match": n > 0, "schema_match": None,
                        "hash_match": None, "spark_rows": n,
                        "oracle_rows": None, "err": None if n > 0 else "0 rows"}
    except Exception as e:
        print(f"FAIL {name} (rows-only): {e}")
        report[name] = {"rows_match": False, "schema_match": None,
                        "hash_match": None, "spark_rows": None,
                        "oracle_rows": None, "err": str(e)}
        fail += 1
if json_out:
    # provenance block: every builder-regenerated gate artifact says
    # what produced it (round-7 ADVICE) — commit, data, date, generator
    import subprocess, datetime
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True,
                                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                                ).stdout.strip()
    except Exception:
        commit = "unknown"
    report["_meta"] = {
        "generator": "tools/check.py",
        "commit": commit,
        "sf_dir": sfdir,
        "verify_dir": outdir,
        "date": datetime.date.today().isoformat(),
        "n_queries": len([k for k in report if not k.startswith("_")]),
    }
    json.dump(report, open(json_out, "w"), indent=1, default=str)
print(f"\n{'ALL GREEN' if fail == 0 else f'{fail} FAILURES'}")
sys.exit(1 if fail else 0)
