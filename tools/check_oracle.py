"""Local replica of the driver's correctness gate.

Runs every declared query on Spark AND its DuckDB oracle at a given
scale factor, then compares row count, sorted column names, and an
order-insensitive multiset of normalized row values.  Use while
iterating so CORRECTNESS_r{N}.json holds no surprises.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]

Hash mode (VERDICT r8 #7): with ``ORACLE_HASH_MODE=1`` both result
sets are fetched as ARROW tables and value-compared by a vectorized
order-insensitive row-hash multiset (sorted uint64 hash arrays)
instead of the per-row Python Counter — the ×100 sweep's wall was
dominated by the Python comparator on big outputs (attribution_linear
631 s, semdedup_cap_recall_eval 1352 s), not by the engines.  Columns
whose types the vectorized canonicalizer doesn't cover (lists,
structs, maps, binary) fall back per-query to the Counter compare
over the same Arrow values.  The DEFAULT mode is byte-identical to
the driver's gate; only tools/x100_ledger.py opts into hash mode.
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


HASH_MODE = os.environ.get("ORACLE_HASH_MODE", "") == "1"


def _canon_frame(tbl):
    """Arrow table → pandas DataFrame of canonical hashable columns
    (sorted by name; every nullable column gets an explicit null-mask
    sibling so a fill sentinel can never collide with data), or None
    when a column type is outside the vectorized set — the caller then
    falls back to the Counter compare.

    Canonical forms mirror norm_cell's equivalences: ints/bools →
    int64; float32/decimal → float64 whose BIT pattern is compared
    (repr-equality ⇔ bit-equality for doubles); timestamps → naive
    microsecond int64 (Spark exports tz=UTC, DuckDB naive — same wall
    clock under the repo's UTC session rule); date32 → epoch days."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = {}
    for name in sorted(tbl.column_names):
        arr = tbl.column(name).combine_chunks()
        t = arr.type
        cols[name + "\x00null"] = pc.is_null(arr).cast(pa.int8()) \
            .to_numpy(zero_copy_only=False)
        if pa.types.is_boolean(t) or pa.types.is_integer(t):
            cols[name] = pc.fill_null(arr.cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False)
        elif pa.types.is_floating(t) or pa.types.is_decimal(t):
            f = pc.fill_null(arr.cast(pa.float64()), 0.0) \
                .to_numpy(zero_copy_only=False)
            # canonicalize NaN payload/sign bits to ONE pattern before
            # the bit-view, matching the Counter path's repr-'nan'
            # equivalence (any NaN == any NaN)
            f = np.where(np.isnan(f), np.float64("nan"), f)
            cols[name] = f.view(np.int64)
        elif pa.types.is_timestamp(t):
            cols[name] = pc.fill_null(
                arr.cast(pa.timestamp("us")).cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False)
        elif pa.types.is_date(t):
            cols[name] = pc.fill_null(
                arr.cast(pa.date32()).cast(pa.int32()).cast(pa.int64()),
                0).to_numpy(zero_copy_only=False)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            cols[name] = pc.fill_null(arr.cast(pa.large_string()), "") \
                .to_pandas()
        else:                       # list/struct/map/binary → fallback
            return None
    import pandas as pd
    return pd.DataFrame(cols)


def _hash_multiset(tbl):
    """Sorted per-row uint64 hash array of an Arrow table (canonical
    column order + null masks via _canon_frame), or None if the schema
    needs the Counter fallback."""
    import numpy as np
    import pandas as pd

    df = _canon_frame(tbl)
    if df is None:
        return None
    # categorize=False: the default categorize=True factorizes object
    # columns through a C-string (NUL-terminated) hash table, so ''
    # and '\x00' collide into one category whose surviving hash
    # depends on insertion order — breaking permutation invariance
    # (caught by tests/test_properties.py hash-multiset property).
    h = pd.util.hash_pandas_object(df, index=False,
                                   categorize=False).to_numpy()
    return np.sort(h)


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
    if HASH_MODE:
        stbl = sdf.toArrow()
        n_spark = stbl.num_rows
    else:
        srows = [tuple(r) for r in sdf.collect()]
        n_spark = len(srows)
    spark_sec = time.monotonic() - t0
    if qd.oracle is None:
        print(f"  {name:35s} rows-only: {n_spark:7d} rows "
              f"[{spark_sec:5.1f}s]")
        return
    drel = con.sql(qd.oracle)     # ONE execution serves columns,
    dcols = list(drel.columns)    # types, and rows (the x10 sweep
    dtypes = dict(zip(dcols, [str(t) for t in drel.types]))
    if HASH_MODE:                 # runs full-scan oracles — don't 2x)
        dtbl = drel.arrow()
        n_duck = dtbl.num_rows
    else:
        drows = drel.fetchall()
        n_duck = len(drows)

    problems = []
    if n_spark != n_duck:
        problems.append(f"rowcount spark={n_spark} duck={n_duck}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    # column TYPES must align too (a strict driver-side schema
    # compare would flag int32-vs-int64 drift)
    for col, styp in sdf.dtypes:
        dt = dtypes.get(col, "MISSING")
        if _duck_to_spark(dt) != styp:
            problems.append(f"dtype {col}: spark={styp} duck={dt}")
    if not problems:
        problems += (_values_differ_hash(stbl, dtbl) if HASH_MODE
                     else _values_differ(scols, srows, dcols, drows))
    status = "OK " if not problems else "FAIL"
    print(f"  {name:35s} {status} {n_spark:7d} rows [{spark_sec:5.1f}s]")
    for p in problems:
        print(f"      {p}")
    if problems:
        failures.append(name)


def _values_differ(scols, srows, dcols, drows) -> list[str]:
    sm, dm = row_multiset(scols, srows), row_multiset(dcols, drows)
    if sm != dm:
        only_s = list((sm - dm).items())[:3]
        only_d = list((dm - sm).items())[:3]
        return [f"values differ; spark-only={only_s} "
                f"duck-only={only_d}"]
    return []


def _values_differ_hash(stbl, dtbl) -> list[str]:
    """Hash-mode value compare (module docstring): vectorized sorted
    row-hash arrays; schemas outside the canonical set fall back to
    the Counter compare over the same Arrow values."""
    import numpy as np

    hs, hd = _hash_multiset(stbl), _hash_multiset(dtbl)
    if hs is None or hd is None:    # unsupported column type
        return _values_differ(
            list(stbl.column_names),
            [tuple(d.values()) for d in stbl.to_pylist()],
            list(dtbl.column_names),
            [tuple(d.values()) for d in dtbl.to_pylist()])
    if not np.array_equal(hs, hd):
        n_diff = int((hs != hd).sum()) if len(hs) == len(hd) else -1
        return [f"values differ (hash mode; {n_diff} of {len(hs)} "
                f"sorted row-hash slots disagree — re-run without "
                f"ORACLE_HASH_MODE for sample rows)"]
    return []


if __name__ == "__main__":
    raise SystemExit(main())
