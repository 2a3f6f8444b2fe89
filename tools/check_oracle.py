"""Local replica of the driver's correctness gate.

Runs every declared query on Spark AND its DuckDB oracle at a given
scale factor, then compares row count, sorted column names, and an
order-insensitive multiset of normalized row values.  Use while
iterating so CORRECTNESS_r{N}.json holds no surprises.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from iot_simulator_datalake_spark.queries import REGISTRY, TABLES  # noqa: E402
from iot_simulator_datalake_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        return repr(v)
    if hasattr(v, "asDict"):       # Spark Row (struct cell) — must
        return tuple(sorted(       # normalize like DuckDB's dict form
            (k, norm_cell(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):        # MapType / STRUCT rows must be
        return tuple(sorted(       # hashable for the multiset compare
            (k, norm_cell(x)) for k, x in v.items()))
    if isinstance(v, bytearray):   # Spark BinaryType
        return bytes(v)
    return v


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):       # replica/lake layouts: flat dirs
            src = f"{src}/**/*.parquet"   # AND key=val partition subdirs
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    failures = []
    for name in names:
        t0 = time.monotonic()
        # per-query containment: one broken (or unknown) query must not
        # abort the sweep and hide the verdicts of everything after it
        try:
            _check_one(spark, con, sf_dir, name, REGISTRY[name], t0,
                       failures)
        except Exception as e:  # noqa: BLE001 — report-and-continue tool
            print(f"  {name:35s} ERR {type(e).__name__}: {str(e)[:140]}")
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match"
          + (f"; FAILURES: {failures}" if failures else ""))
    return 1 if failures else 0


def _duck_to_spark(dt: str) -> str:
    """DuckDB type string → Spark dtype string (arrays recurse:
    'FLOAT[]' → 'array<float>'; decimals keep their precision)."""
    type_map = {"INTEGER": "int", "BIGINT": "bigint",
                "HUGEINT": "hugeint", "DOUBLE": "double",
                "FLOAT": "float", "VARCHAR": "string", "DATE": "date",
                "TIMESTAMP": "timestamp", "BOOLEAN": "boolean"}
    dt = dt.strip()
    if dt.endswith("[]"):
        return f"array<{_duck_to_spark(dt[:-2])}>"
    base = dt.split("(")[0]
    if base in ("DECIMAL", "NUMERIC"):
        return "decimal" + dt[len(base):].replace(" ", "")
    return type_map.get(base, dt.lower())


def _check_one(spark, con, sf_dir, name, qd, t0, failures):
    sdf = qd.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    spark_sec = time.monotonic() - t0
    if qd.oracle is None:
        print(f"  {name:35s} rows-only: {len(srows):7d} rows "
              f"[{spark_sec:5.1f}s]")
        return
    drel = con.sql(qd.oracle)     # ONE execution serves columns,
    dcols = list(drel.columns)    # types, and rows (the x10 sweep
    dtypes = dict(zip(dcols, [str(t) for t in drel.types]))
    drows = drel.fetchall()       # runs full-scan oracles — don't 2x)

    problems = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    # column TYPES must align too (a strict driver-side schema
    # compare would flag int32-vs-int64 drift)
    for col, styp in sdf.dtypes:
        dt = dtypes.get(col, "MISSING")
        if _duck_to_spark(dt) != styp:
            problems.append(f"dtype {col}: spark={styp} duck={dt}")
    if not problems:
        sm, dm = row_multiset(scols, srows), row_multiset(dcols, drows)
        if sm != dm:
            only_s = list((sm - dm).items())[:3]
            only_d = list((dm - sm).items())[:3]
            problems.append(f"values differ; spark-only={only_s} "
                            f"duck-only={only_d}")
    status = "OK " if not problems else "FAIL"
    print(f"  {name:35s} {status} {len(srows):7d} rows [{spark_sec:5.1f}s]")
    for p in problems:
        print(f"      {p}")
    if problems:
        failures.append(name)


if __name__ == "__main__":
    raise SystemExit(main())
