#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]
Run AFTER: sbt "runMain graft.Verify <sfDir> <verifyOutDir>"

Compares each Spark result parquet against the DuckDB oracle SQL with
columns sorted by name (mirroring the driver's hash compare). Exact value
equality; reports first diff per failing query.
"""
import sys, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    # Optional third arg: dump a CORRECTNESS_r*-shaped json (the driver's
    # per-query schema) so tools/gen_catalog.py can regenerate the README
    # catalog from a LOCAL verify run between driver rounds.
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    results = {}

    def record(name, ok, spark_rows=None, oracle_rows=None, err=None):
        # hash_match stays null in LOCAL dumps: the pandas fetchdf value
        # compare here coerces types (decimals, dates, NaN folding)
        # differently from the driver's hash discipline, so a local pass is
        # recorded as value_match — gen_catalog.py labels it provisional and
        # README hash-green counts only ever come from driver artifacts.
        results[name] = {"rows_match": ok, "schema_match": ok,
                         "hash_match": None, "value_match": ok,
                         "spark_rows": spark_rows, "oracle_rows": oracle_rows,
                         "err": err}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: missing spark output"); n_fail += 1
            record(name, False, err="missing spark output"); continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1
            record(name, False, err=f"oracle error: {e}"); continue
        sdf = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        odf = odf[sorted(odf.columns)]
        sdf = sdf[sorted(sdf.columns)]
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: cols spark={list(sdf.columns)} oracle={list(odf.columns)}"); n_fail += 1
            record(name, False, len(sdf), len(odf), "column mismatch"); continue
        if [str(t) for t in odf.dtypes] != [str(t) for t in sdf.dtypes]:
            print(f"FAIL {name}: dtypes spark={[str(t) for t in sdf.dtypes]} oracle={[str(t) for t in odf.dtypes]}"); n_fail += 1
            record(name, False, len(sdf), len(odf), "dtype mismatch"); continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}"); n_fail += 1
            record(name, False, len(sdf), len(odf), "row-count mismatch"); continue
        bad = None
        for c in odf.columns:
            a, b = sdf[c].tolist(), odf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                ok = (x == y) or (x != x and y != y)  # NaN==NaN; None==None via ==? no:
                if x is None or y is None:
                    ok = x is None and y is None
                try:
                    import pandas as pd
                    if pd.isna(x) and pd.isna(y):
                        ok = True
                except (TypeError, ValueError):
                    pass
                if not ok:
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r}"); n_fail += 1
            record(name, False, len(sdf), len(odf), f"value mismatch col={c} row={i}")
        else:
            print(f"PASS {name} ({len(odf)} rows)"); n_pass += 1
            record(name, True, len(sdf), len(odf))
    missing = [q for q in glob.glob(f"{out}/*/") if q.split('/')[-2] not in oracle]
    for m in missing:
        name = m.split('/')[-2]
        print(f"NOTE rows-only (no oracle): {name}")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}/{name}/*.parquet')").fetchone()[0]
        results[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                         "spark_rows": n, "oracle_rows": None, "err": "no_oracle"}
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        json.dump(results, open(json_out, "w"), indent=2)
        print(f"wrote {json_out} ({len(results)} entries)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
