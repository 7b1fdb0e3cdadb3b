#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage:
  python3 tools/check.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Registers every <sfDir>/*.parquet as a DuckDB view named after the
table, executes each oracle_sql.json entry, loads the Spark result
parquet, sorts columns by name and rows by all columns, and compares
cell-exact. Reports per-query PASS/FAIL with first diff.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def sort_key_cell(x):
    # numerically equal cells must sort identically on both sides even
    # when their textual forms differ (2 vs 2.0, Decimal vs float) —
    # otherwise the row-wise compare misaligns and reports a false diff
    if x is None:
        return (0, "", 0.0)
    if isinstance(x, bool):
        return (1, "b", float(x))
    if isinstance(x, (int, float)) or type(x).__name__ == "Decimal":
        f = float(x)
        if math.isnan(f):
            return (1, "nan", 0.0)
        return (1, "n", f)
    return (2, str(x), 0.0)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple(sort_key_cell(x) for x in t))
    return [c for _, c in sorted(zip(cols, cols))], out


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    failed = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            failed.append(name)
            continue
        try:
            o = con.sql(oracle[name])
            o_cols = [c.lower() for c in o.columns]
            o_rows = o.fetchall()
            s = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            s_cols = [c.lower() for c in s.columns]
            s_rows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
            failed.append(name)
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1
            failed.append(name)
            continue
        # Type-strict: the driver's hash is type-aware, so an oracle
        # typed HUGEINT where the engine emits BIGINT fails there even
        # when every cell is numerically identical (round-11 lesson:
        # un-CAST `//` floor division). Compare DuckDB column types,
        # name-aligned, and fail on any mismatch.
        o_types = dict(zip(o_cols, [str(t) for t in o.types]))
        s_types = dict(zip(s_cols, [str(t) for t in s.types]))
        bad_types = [
            (c, o_types[c], s_types[c])
            for c in sorted(o_types)
            if o_types[c] != s_types[c]
        ]
        if bad_types:
            c, ot, st = bad_types[0]
            print(f"FAIL {name}: type of {c} oracle={ot} spark={st}")
            n_fail += 1
            failed.append(name)
            continue
        _, oc = canon(o_rows, o_cols)
        _, sc = canon(s_rows, s_cols)
        if len(oc) != len(sc):
            print(f"FAIL {name}: rows oracle={len(oc)} spark={len(sc)}")
            n_fail += 1
            failed.append(name)
            continue
        diff = None
        for i, (ro, rs) in enumerate(zip(oc, sc)):
            if not all(cells_equal(a, b) for a, b in zip(ro, rs)):
                diff = (i, ro, rs)
                break
        if diff:
            print(f"FAIL {name}: row {diff[0]} oracle={diff[1]} spark={diff[2]}")
            n_fail += 1
            failed.append(name)
        else:
            print(f"PASS {name} ({len(oc)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
