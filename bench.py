"""Benchmark harness: runs the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is built lazily and executed via a count-style action that
materializes every row (``df.toLocalIterator`` would serialize; we use
``df.write.format("noop")``-equivalent: count over all columns is enough
since Catalyst cannot prune the aggregates away once collected — we use
``df.collect()`` length only for small results and a count() otherwise).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iot_simulator_datalake_spark.queries import REGISTRY  # noqa: E402
from iot_simulator_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    names = [n for n, qd in REGISTRY.items() if qd.bench]

    # Warm-up: one untimed pass of every benched query pays JVM/JIT/
    # codegen compilation and file-listing costs, so the timed pass
    # measures steady-state query execution — what a long-lived cluster
    # actually sees (plans are rebuilt fresh; no DataFrame caching).
    for name in names:
        REGISTRY[name].fn(spark, sf_dir).count()

    # Two timed passes, report the min per query: local[N] on a shared
    # host is noisy (GC, co-tenants) and the min is the stable estimate
    # of actual plan cost.  Plans are rebuilt fresh each pass — no
    # DataFrame/cache reuse.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            qd = REGISTRY[name]
            t0 = time.monotonic()
            df = qd.fn(spark, sf_dir)
            n = df.count()
            dt = round(time.monotonic() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            print(f"# pass{_pass} {name}: {n} rows in {dt:.2f}s",
                  file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
