#!/usr/bin/env python3
"""Local correctness self-check, mimicking the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]
Reads verifyOutDir/<name>/ (Spark parquet) + verifyOutDir/oracle_sql.json,
runs each oracle SQL in DuckDB over sfDir's parquet tables, and compares
row counts, column names (sorted), and values (sorted rows; exact for
non-floats, 1e-9 rtol for floats). Strictly stricter than the driver's
hash compare — if this passes, the driver's gate should too.
"""
import duckdb, json, sys, glob, os, math
from decimal import Decimal

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: cols oracle={ocols} spark={scols}"); fails += 1; continue
    # The driver's hash stringifies values, so an int64-vs-float64 dtype
    # mismatch (e.g. DuckDB HUGEINT from sum(BIGINT) reaching the output
    # uncast) hashes "999.0" vs "999" even when values agree — flag it.
    dbad = [(c, str(odf[c].dtype), str(sdf[c].dtype)) for c in ocols
            if (str(odf[c].dtype).startswith("float") !=
                str(sdf[c].dtype).startswith("float"))]
    if dbad:
        print(f"FAIL {name}: int/float dtype mismatch (cast oracle to BIGINT?): {dbad}")
        fails += 1; continue
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}"); fails += 1; continue
    o = odf[ocols].astype(object).values.tolist()
    s = sdf[scols].astype(object).values.tolist()
    def key(row):
        return tuple(str(x) for x in row)
    o.sort(key=key); s.sort(key=key)
    bad = None
    for i, (orow, srow) in enumerate(zip(o, s)):
        for c, (ov, sv) in enumerate(zip(orow, srow)):
            if isinstance(ov, float) or isinstance(sv, float):
                ofl, sfl = float(ov), float(sv)
                if math.isnan(ofl) and math.isnan(sfl):
                    continue
                if not math.isclose(ofl, sfl, rel_tol=1e-9, abs_tol=1e-12):
                    bad = (i, ocols[c], ov, sv); break
            elif isinstance(ov, Decimal) or isinstance(sv, Decimal):
                if Decimal(str(ov)) != Decimal(str(sv)):
                    bad = (i, ocols[c], ov, sv); break
            else:
                if str(ov) != str(sv):
                    bad = (i, ocols[c], ov, sv); break
        if bad: break
    if bad:
        i, c, ov, sv = bad
        print(f"FAIL {name}: row {i} col {c}: oracle={ov!r} spark={sv!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(odf)} rows")
print(f"{'PASS' if fails == 0 else 'FAIL'}: {len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
