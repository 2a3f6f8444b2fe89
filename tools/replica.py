"""Build a ×N replica of a testdata SF dir with key-shifted copies —
the dataset behind SCALE.md's replica probes.

Usage: python tools/replica.py [N] [src_dir] [out_dir] [--zipf]
       (defaults: 10 /root/testdata/sf0.1 /tmp/x10)

Key columns shift by copy index so cardinalities scale realistically
(10× users / orders / docs), while dimension-like columns (partkey,
event_type, text) repeat — which also makes the replica a worst-case
duplicate corpus for the dedup family (see SCALE.md's minhash note).

``--zipf`` (VERDICT r10 #3): the uniform replica never exercises KEY
SKEW — every shifted key appears exactly once per copy.  Zipf mode
replaces the per-copy shift on the fact-side hot columns (ZIPF_COLS:
``lineitem.l_orderkey``, ``orders.o_custkey``, ``events.user_id``)
with a BUCKETED shift ``floor(log2(copy+1))``: bucket b absorbs 2^b
copies, so key multiplicities follow a power law (1, 2, 4, …, ~n/2 —
at ×100 the hottest orderkey/custkey/user class carries 37% of all
rows).  Deterministic (no RNG), and JOIN MULTIPLICITY IS PRESERVED:
the unique-key side (o_orderkey, c_custkey, event_id) keeps the
uniform shift, so a hot fact key resolves to exactly ONE row in
copies 0..log2(n) of the dimension side — the join output size stays
×n while its shuffle distribution becomes maximally skewed.  The
DuckDB oracle reads the same files, so every gated query stays
value-comparable on the skewed replica.
"""

from __future__ import annotations

import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from iot_simulator_datalake_spark.queries import load  # noqa: E402
from iot_simulator_datalake_spark.session import get_spark  # noqa: E402

SHIFTS = {
    "lineitem": {"l_orderkey": 10**9},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "events": {"event_id": 10**9, "user_id": 10**7},
    "documents": {"doc_id": 10**7},
    "customer": {"c_custkey": 10**7},
    # embeddings share the documents id space (doc↔vector pairing), so
    # they shift by the same constant — otherwise every retrieval probe
    # over the replica would measure an SF-invariant vector corpus
    "embeddings": {"vec_id": 10**7},
}
COPY_AS_IS = ("region", "nation", "supplier", "part")

#: fact-side columns that get the power-law bucketed shift under
#: --zipf (module docstring); their unique-key join partners stay
#: uniform so join multiplicity is preserved
ZIPF_COLS = {("lineitem", "l_orderkey"), ("orders", "o_custkey"),
             ("events", "user_id")}


def main(argv: list[str]) -> int:
    zipf = "--zipf" in argv
    argv = [a for a in argv if a != "--zipf"]
    n = int(argv[0]) if argv else 10
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    out = argv[2] if len(argv) > 2 else "/tmp/x10"
    spark = get_spark("replica")
    shutil.rmtree(out, ignore_errors=True)
    for t, sh in SHIFTS.items():
        df = load(spark, src, t)
        # one broadcast range cross-join instead of an n-way union:
        # identical rows, but the plan stays one node — at ×1000 the
        # unrolled union overwhelmed Catalyst/driver plan processing.
        # Repartition the SMALL source BEFORE the join: repartitioning
        # the joined output shuffles the full ×n dataset (measured:
        # 44 GB of shuffle blocks before the first parquet byte at
        # ×1000); pre-splitting the source costs one tiny shuffle and
        # each writer task streams (src/n_parts)·n rows straight to
        # parquet.
        copies = F.broadcast(
            spark.range(n).select(F.col("id").alias("_copy")))
        n_parts = max(8, min(256, n // 4))
        d = df.repartition(n_parts).crossJoin(copies)
        for c, k in sh.items():
            shift = F.col("_copy")
            if zipf and (t, c) in ZIPF_COLS:
                shift = F.floor(F.log2(F.col("_copy") + F.lit(1))) \
                    .cast("long")
            d = d.withColumn(c, F.col(c) + shift * F.lit(k))
        (d.drop("_copy")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
        print(f"{t}: x{n} written")
    for t in COPY_AS_IS:
        load(spark, src, t).write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")
    print(f"replica ready at {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
