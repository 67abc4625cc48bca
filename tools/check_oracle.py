#!/usr/bin/env python3
"""Dev-only harness replicating the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir> (written by graft.Verify), loads the
parquet result, runs the matching SQL from oracle_sql.json in DuckDB (views
named after the testdata tables), sorts columns by name and rows by all
columns, and compares cell-by-cell. Prints PASS/FAIL per query with first
diffs. NOT part of the shipped library — driver-side python is available in
this container for exactly this kind of validation.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table().to_pylist()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetch_arrow_table().to_pylist()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        def canon(rows):
            out = []
            for r in rows:
                out.append(tuple((k, norm(r[k])) for k in sorted(r)))
            return sorted(out, key=lambda t: str(t))
        ce, cg = canon(exp), canon(got)
        if ce == cg:
            print(f"PASS {name} ({len(ce)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: oracle {len(ce)} rows vs spark {len(cg)} rows")
            for i, (a, b) in enumerate(zip(ce, cg)):
                if a != b:
                    print(f"  first diff at sorted row {i}:")
                    print(f"    oracle: {a}")
                    print(f"    spark : {b}")
                    break
            else:
                k = min(len(ce), len(cg))
                print(f"  extra rows from {k}:")
                print(f"    oracle: {ce[k] if k < len(ce) else '-'}")
                print(f"    spark : {cg[k] if k < len(cg) else '-'}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
