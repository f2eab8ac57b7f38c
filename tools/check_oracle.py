#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over the same testdata
tables, and compares row count, schema (column names sorted), values,
AND physical arrow types. The driver's comparer hashes serialized bytes,
so an uncast DuckDB SUM() (HUGEINT → decimal128) vs Spark's int64 fails
there even when every printed value matches — the type check here makes
that class of drift fail locally too. Array-typed output columns are
also rejected: the driver's pandas sort crashes on ndarray cells.

Dev tool only — the engine itself is pure Scala/Spark.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(rows, cols):
    """Rows as sorted tuples of canonicalized values, column-name order."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)  # full precision
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


# Arrow types the driver's byte-hash treats as equal (same wire width).
# Integer WIDTH differs between engines for small ints but the driver
# compares post-pandas int64, so all plain ints unify; HUGEINT becomes
# decimal128 and does NOT.
def type_bucket(t):
    s = str(t)
    if s.startswith("int") or s.startswith("uint"):
        return "int64"
    if s in ("float", "double", "halffloat"):
        return "float64"
    if s.startswith("timestamp"):
        return "timestamp"
    if s in ("string", "large_string", "utf8", "large_utf8"):
        return "string"
    return s


def type_report(tbl):
    return {f.name: type_bucket(f.type) for f in tbl.schema}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        got = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        if name not in oracles:
            print(f"  SKIP {name}: no oracle (rows={len(got.fetchall())})")
            n_skip += 1
            continue
        exp = con.sql(oracles[name])
        gcols, ecols = list(got.columns), list(exp.columns)
        if sorted(gcols) != sorted(ecols):
            print(f"  FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        gt, et = got.arrow(), exp.arrow()
        bad_arrays = [f.name for f in gt.schema
                      if str(f.type).startswith(("list", "large_list",
                                                 "fixed_size_list"))]
        if bad_arrays:
            print(f"  FAIL {name}: array-typed columns {bad_arrays} — "
                  f"driver's pandas comparer cannot sort ndarray cells")
            n_fail += 1
            continue
        gtypes, etypes = type_report(gt), type_report(et)
        if gtypes != etypes:
            diffs = {c: (gtypes[c], etypes.get(c)) for c in gtypes
                     if gtypes[c] != etypes.get(c)}
            print(f"  FAIL {name}: type drift (spark, oracle): {diffs} — "
                  f"cast the oracle side (uncast DuckDB SUM() is HUGEINT)")
            n_fail += 1
            continue
        grows, erows = gt.to_pylist(), et.to_pylist()
        grows = [[r[c] for c in gt.column_names] for r in grows]
        erows = [[r[c] for c in et.column_names] for r in erows]
        if len(grows) != len(erows):
            print(f"  FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        if g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"  FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"  PASS {name} ({len(grows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
