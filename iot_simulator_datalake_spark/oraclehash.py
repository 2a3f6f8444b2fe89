"""Vectorized + streamed oracle-comparator core (VERDICT r8 #7,
r10 #1) shared by tools/check_oracle.py and its tests.

Lives inside the package (not tools/) because the stream digest's
``mapInArrow`` closure must be UNPICKLABLE-BY-REFERENCE on Spark's
Python workers: workers import modules by name, and only the package
is importable from the repo cwd — a ``tools/``-resident closure dies
with ``ModuleNotFoundError: check_oracle`` the moment it leaves the
driver.

Three layers:

- ``_canon_frame``  — Arrow table → pandas frame of canonical hashable
  columns (the single normalization both engines' outputs flow
  through; semantics documented on the function).
- ``_hash_multiset`` — whole-table sorted per-row uint64 hash array
  (hash mode: exact multiset compare, result fetched to the driver).
- digest functions — fixed-size order-insensitive bucket digest
  (stream mode: per-row hashes computed executor-side / in DuckDB
  chunks; only ~128 KiB ever reaches the driver).  4096 buckets keyed
  by the hash's top 12 bits, each carrying (count, Σh, Σh², XOR h)
  with uint64 wraparound.  Equal multisets always digest equal (every
  statistic is commutative); a false pass needs all four statistics
  to collide in all 4096 buckets simultaneously.  Per-row hashes are
  batch-boundary-independent — ``hash_pandas_object`` is elementwise
  with a fixed key — pinned by tests/test_oracle_stream_mode.py.
"""

from __future__ import annotations

N_BUCKETS = 4096

#: Spark dtype strings the vectorized canonicalizer covers.  Anything
#: else (arrays, structs, maps, binary) must use the fallback compare.
_STREAM_TYPES = {"boolean", "tinyint", "smallint", "int", "bigint",
                 "float", "double", "date", "timestamp", "string"}


def duck_to_spark(dt: str) -> str:
    """DuckDB type string → Spark dtype string (arrays recurse:
    'FLOAT[]' → 'array<float>'; decimals keep their precision)."""
    type_map = {"INTEGER": "int", "BIGINT": "bigint",
                "HUGEINT": "hugeint", "DOUBLE": "double",
                "FLOAT": "float", "VARCHAR": "string", "DATE": "date",
                "TIMESTAMP": "timestamp", "BOOLEAN": "boolean"}
    dt = dt.strip()
    if dt.endswith("[]"):
        return f"array<{duck_to_spark(dt[:-2])}>"
    base = dt.split("(")[0]
    if base in ("DECIMAL", "NUMERIC"):
        return "decimal" + dt[len(base):].replace(" ", "")
    return type_map.get(base, dt.lower())


def _stream_supported(spark_dtypes, duck_types) -> bool:
    """True iff BOTH sides' column types are inside the vectorized
    canonical set, so the streamed digest is exact (no fallback
    mid-stream after rows were already consumed)."""
    for t in ([t for _, t in spark_dtypes]
              + [duck_to_spark(str(t)) for t in duck_types]):
        if t not in _STREAM_TYPES and not t.startswith("decimal"):
            return False
    return True


def _canon_frame(tbl):
    """Arrow table → pandas DataFrame of canonical hashable columns
    (sorted by name; every nullable column gets an explicit null-mask
    sibling so a fill sentinel can never collide with data), or None
    when a column type is outside the vectorized set — the caller then
    falls back to the Counter compare.

    Canonical forms mirror check_oracle.norm_cell's equivalences:
    ints/bools → int64; float32/decimal → float64 whose BIT pattern is
    compared (repr-equality ⇔ bit-equality for doubles); timestamps →
    naive microsecond int64 (Spark exports tz=UTC, DuckDB naive — same
    wall clock under the repo's UTC session rule); date32 → epoch
    days."""
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


def _digest_new():
    import numpy as np
    return {"cnt": np.zeros(N_BUCKETS, np.int64),
            "s1": np.zeros(N_BUCKETS, np.uint64),
            "s2": np.zeros(N_BUCKETS, np.uint64),
            "x": np.zeros(N_BUCKETS, np.uint64)}


def _digest_add(dig, tbl) -> bool:
    """Fold one Arrow table's canonical per-row hashes into the
    bucketized digest (module docstring).  Integer overflow wraps mod
    2^64 by numpy semantics — deliberate: the digest is a commutative
    multiset fingerprint, not arithmetic.  Returns False when the
    schema needs the fallback compare."""
    import numpy as np
    import pandas as pd
    df = _canon_frame(tbl)
    if df is None:
        return False
    if not len(df):
        return True
    h = pd.util.hash_pandas_object(
        df, index=False, categorize=False).to_numpy().astype(
        np.uint64, copy=False)
    b = (h >> np.uint64(64 - 12)).astype(np.int64)
    np.add.at(dig["cnt"], b, 1)
    np.add.at(dig["s1"], b, h)
    np.add.at(dig["s2"], b, h * h)
    np.bitwise_xor.at(dig["x"], b, h)
    return True


def _spark_digest(sdf):
    """Executor-side digest of a Spark result: mapInArrow computes the
    canonical row hashes where the data lives and ships ONE 4096-row
    digest frame per partition; the driver reduces those (np.*.at —
    a collected Arrow batch may interleave partitions)."""
    import numpy as np
    import pyarrow as pa

    def part(it):
        import numpy as np
        import pyarrow as pa
        dig = _digest_new()
        for batch in it:
            ok = _digest_add(dig, pa.Table.from_batches([batch]))
            assert ok, "unsupported type reached the stream digest"
        yield pa.RecordBatch.from_arrays(
            [pa.array(np.arange(N_BUCKETS, dtype=np.int32)),
             pa.array(dig["cnt"]),
             pa.array(dig["s1"].view(np.int64)),
             pa.array(dig["s2"].view(np.int64)),
             pa.array(dig["x"].view(np.int64))],
            names=["b", "cnt", "s1", "s2", "x"])

    out = sdf.mapInArrow(part, "b int, cnt long, s1 long, s2 long, x long")
    tot = _digest_new()
    for rb in out.toArrow().to_batches():
        b = rb.column("b").to_numpy()
        np.add.at(tot["cnt"], b, rb.column("cnt").to_numpy())
        np.add.at(tot["s1"], b,
                  rb.column("s1").to_numpy().view(np.uint64))
        np.add.at(tot["s2"], b,
                  rb.column("s2").to_numpy().view(np.uint64))
        np.bitwise_xor.at(tot["x"], b,
                          rb.column("x").to_numpy().view(np.uint64))
    return tot


def _duck_digest(drel, chunk: int = 1_000_000):
    """Chunked digest of the DuckDB oracle — fetch_arrow_reader keeps
    driver residency at one chunk instead of the whole result."""
    import pyarrow as pa
    dig = _digest_new()
    for batch in drel.fetch_arrow_reader(chunk):
        ok = _digest_add(dig, pa.Table.from_batches([batch]))
        assert ok, "unsupported type reached the stream digest"
    return dig


def _digests_differ(sdig, ddig) -> list[str]:
    import numpy as np
    bad = [k for k in ("cnt", "s1", "s2", "x")
           if not np.array_equal(sdig[k], ddig[k])]
    if bad:
        nb = int((sdig["cnt"] != ddig["cnt"]).sum()) or \
            max(int((sdig[k] != ddig[k]).sum()) for k in bad)
        return [f"values differ (stream digest; stats {bad} disagree "
                f"in {nb} of {N_BUCKETS} buckets — re-run without "
                f"ORACLE_STREAM_MODE for sample rows)"]
    return []
