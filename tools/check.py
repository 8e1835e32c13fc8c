"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row count, column names,
and values (order-insensitive, bit-exact on doubles — stricter than any
plausible driver hasher, so passing here should pass the driver).

Usage: python tools/check.py [--arrow] [sf_dir] [query ...]

``--arrow`` fetches the DuckDB oracle result through the Arrow path
(``.arrow().to_pylist()``) instead of ``fetchall()``. The two differ for
non-standard column types — DuckDB surfaces HUGEINT as Python int via
fetchall but decimal128(38,0) via Arrow (and float64 via pandas), which
is exactly the representation-level divergence that made 4 bit-exact
queries hash-fail at the round-5/6 driver gate. Running both modes green
bounds the driver's possible fetch paths.
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return struct.pack("<d", v).hex()
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return f"s:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)


def main():
    argv = sys.argv[1:]
    arrow = "--arrow" in argv
    if arrow:
        argv = [a for a in argv if a != "--arrow"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as E
    from machinelearningalgomapreduce_spark.session import get_spark

    spark = get_spark(app_name="check")
    con = duckdb.connect()
    for t in TABLES:
        # directory-layout tables (real corpora: <t>.parquet/ holding
        # part files) need the recursive glob — DuckDB's bare-path form
        # only reads single files (r14 reader audit)
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/**/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            if arrow:
                tbl = res.arrow()
                # Positional extraction: to_pylist() dicts are keyed by
                # column name and would silently collapse duplicate output
                # columns (the fetchall path preserves positional dups).
                drows = list(zip(*(col.to_pylist() for col in tbl.columns))) \
                    if tbl.num_columns else [() for _ in range(tbl.num_rows)]
            else:
                drows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        # Ordered compare + dup guard: a column-order-insensitive check would
        # silently realign cells (and misalign entirely on duplicate names).
        if len(set(scols)) != len(scols):
            problems.append(f"duplicate spark columns {scols}")
        if scols != dcols:
            problems.append(f"cols spark={scols} duckdb={dcols}")
        if not problems:
            cs, cd = canon_rows(scols, srows), canon_rows(dcols, drows)
            if cs != cd:
                bad = sum(1 for a, b in zip(cs, cd) if a != b) + abs(len(cs) - len(cd))
                problems.append(f"values differ in {bad}/{len(cs)} rows")
                for a, b in list(zip(cs, cd))[:2000]:
                    if a != b:
                        problems.append(f"  spark : {a[:300]}")
                        problems.append(f"  duckdb: {b[:300]}")
                        break
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows, {dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
