#!/usr/bin/env python3
"""Dev-time oracle validator mimicking the driver's CORRECTNESS check.

Usage: python3 tools/validate.py [outDir] [sfDir]
Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, canonicalizes both (sort columns by name, sort rows,
round doubles to 6 dp, normalize nulls) and diffs.

This is a development tool only — the shipped Scala library never uses it.
"""
import json, sys, math
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    v = 0.0 if v == 0 else v
            rr.append(str(v))
        out.append(tuple(rr))
    return sorted(out)

fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        # Single execution: arrow table supplies both the row values and
        # the schema lint. The driver fetches via arrow/pandas, where
        # DuckDB HUGEINT (e.g. an un-cast SUM over integers) becomes
        # decimal128/float64 and hash-mismatches Spark's int64 — so
        # check the arrow schema explicitly.
        etab = con.execute(sql).fetch_arrow_table()
        ecols = etab.schema.names
        erows = [tuple(d.values()) for d in etab.to_pylist()]
        atypes = {f.name: str(f.type) for f in etab.schema}
        bad = {k: v for k, v in atypes.items() if v.startswith("decimal")}
        if bad:
            print(f"FAIL {name}: oracle emits non-native arrow types "
                  f"(cast to BIGINT/DOUBLE in the SQL): {bad}")
            fail += 1
            continue
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
    except Exception as e:
        print(f"FAIL {name}: engine output missing: {e}")
        fail += 1
        continue
    if sorted(ecols) != sorted(gcols):
        print(f"FAIL {name}: columns differ: oracle={sorted(ecols)} engine={sorted(gcols)}")
        fail += 1
        continue
    ce, cg = canon(erows, ecols), canon(grows, gcols)
    if ce == cg:
        print(f"PASS {name} ({len(cg)} rows)")
    else:
        fail += 1
        print(f"FAIL {name}: rows differ (oracle {len(ce)} vs engine {len(cg)})")
        diff = [(a, b) for a, b in zip(ce, cg) if a != b][:3]
        for a, b in diff:
            print(f"  oracle: {a}\n  engine: {b}")
        only_e = set(ce) - set(cg)
        only_g = set(cg) - set(ce)
        for x in list(only_e)[:2]:
            print(f"  only-oracle: {x}")
        for x in list(only_g)[:2]:
            print(f"  only-engine: {x}")

missing = [q for q in json.load(open(f"{outdir}/oracle_sql.json")) if q not in oracle]
print(f"\n{'ALL PASS' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} oracled queries")
sys.exit(1 if fail else 0)
