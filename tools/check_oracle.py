#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [gatesJson]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over the same testdata
tables, and compares row count, schema (column names sorted), values,
AND physical arrow types. The driver's comparer hashes serialized bytes,
so an uncast DuckDB SUM() (HUGEINT → decimal128) vs Spark's int64 fails
there even when every printed value matches — the type check here makes
that class of drift fail locally too. Array-typed output columns are
also rejected: the driver's pandas sort crashes on ndarray cells.

When [gatesJson] is given, a CORRECTNESS-shaped record
  {query: {rows_match, schema_match, hash_match, err}}
is written there — the round's self-evidencing gate artifact
(committed as GATES_rN_sf0.01.json at each round close), so the
per-query correctness evidence lives in-repo even when the driver's
CORRECTNESS_rN.json artifact arrives empty (the r02/r09 incident).
`hash_match` here is the canonicalized-value comparison — the same
equality the driver's byte-hash certifies, via the type-bucket check
that makes hash-relevant physical-type drift fail locally.

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


def check_one(con, out_dir, name, oracles):
    """One query's gate record: CORRECTNESS-shaped dict + log line."""
    rec = {"rows_match": False, "schema_match": False,
           "hash_match": False, "err": None}
    got = con.sql(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    if name not in oracles:
        rec["err"] = f"no oracle (rows={len(got.fetchall())})"
        print(f"  SKIP {name}: {rec['err']}")
        return "skip", rec
    exp = con.sql(oracles[name])
    gcols, ecols = list(got.columns), list(exp.columns)
    if sorted(gcols) != sorted(ecols):
        rec["err"] = f"columns {sorted(gcols)} != {sorted(ecols)}"
        print(f"  FAIL {name}: {rec['err']}")
        return "fail", rec
    gt, et = got.arrow(), exp.arrow()
    bad_arrays = [f.name for f in gt.schema
                  if str(f.type).startswith(("list", "large_list",
                                             "fixed_size_list"))]
    if bad_arrays:
        rec["err"] = (f"array-typed columns {bad_arrays} — driver's "
                      f"pandas comparer cannot sort ndarray cells")
        print(f"  FAIL {name}: {rec['err']}")
        return "fail", rec
    gtypes, etypes = type_report(gt), type_report(et)
    if gtypes != etypes:
        diffs = {c: (gtypes[c], etypes.get(c)) for c in gtypes
                 if gtypes[c] != etypes.get(c)}
        rec["err"] = (f"type drift (spark, oracle): {diffs} — cast the "
                      f"oracle side (uncast DuckDB SUM() is HUGEINT)")
        print(f"  FAIL {name}: {rec['err']}")
        return "fail", rec
    rec["schema_match"] = True
    grows, erows = gt.to_pylist(), et.to_pylist()
    grows = [[r[c] for c in gt.column_names] for r in grows]
    erows = [[r[c] for c in et.column_names] for r in erows]
    if len(grows) != len(erows):
        rec["err"] = f"rows {len(grows)} != {len(erows)}"
        print(f"  FAIL {name}: {rec['err']}")
        return "fail", rec
    rec["rows_match"] = True
    g, e = canon(grows, gcols), canon(erows, ecols)
    if g != e:
        bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
        rec["err"] = f"value mismatch, first diffs: {bad}"
        print(f"  FAIL {name}: {rec['err']}")
        return "fail", rec
    rec["hash_match"] = True
    print(f"  PASS {name} ({len(grows)} rows)")
    return "pass", rec


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    gates_path = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    counts = {"pass": 0, "fail": 0, "skip": 0}
    gates = {}
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        try:
            status, rec = check_one(con, out_dir, name, oracles)
        except Exception as ex:  # oracle SQL error, unreadable parquet, ...
            status = "fail"
            rec = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "err": f"{type(ex).__name__}: {ex}"}
            print(f"  FAIL {name}: {rec['err']}")
        counts[status] += 1
        gates[name] = rec
    if gates_path:
        Path(gates_path).write_text(json.dumps(
            {"sf_dir": sf_dir, "n_pass": counts["pass"],
             "n_fail": counts["fail"], "n_no_oracle": counts["skip"],
             "queries": gates}, indent=1, sort_keys=True) + "\n")
        print(f"== gate artifact written to {gates_path}")
    print(f"== {counts['pass']} pass, {counts['fail']} fail, "
          f"{counts['skip']} no-oracle")
    sys.exit(1 if counts["fail"] else 0)


if __name__ == "__main__":
    main()
