"""Scale-probe harness: time declared queries at two scale factors and
print the scaling ratio — the evidence source for SCALE.md's probe
tables.

Usage:
  python tools/probe_scale.py q1 q2 ...              # sf0.01 → sf0.1
  python tools/probe_scale.py --sfs dirA dirB q1 ...  # custom dirs

Each query runs once per SF after a warmup pass at BOTH SFs (so
JVM/codegen compile and cold page cache are excluded at each size —
plans can change shape between SFs, and cold numbers say nothing
about the plan).  Ratios near 1× on 10× data mean the query is bounded by a
sub-linear structure (grid/sketch/top-k); ratios near 10× mean
scan-bound; superlinear ratios are the red flags SCALE.md documents.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


# full_mat is shared with bench.py so bench and probes time the SAME
# action (the helper's module docstring has the join-pruning rationale).
from iot_simulator_datalake_spark.actions import full_mat  # noqa: E402
from iot_simulator_datalake_spark.queries import REGISTRY  # noqa: E402
from iot_simulator_datalake_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> int:
    sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    if argv and argv[0] == "--sfs":
        if len(argv) < 3:
            print("usage: probe_scale.py [--sfs dirA dirB] [query ...]",
                  file=sys.stderr)
            return 2
        sfs = [argv[1], argv[2]]
        argv = argv[3:]
    names = argv or sorted(REGISTRY)
    bad = [n for n in names if n not in REGISTRY]
    if bad:
        print(f"unknown queries: {bad}", file=sys.stderr)
        return 2
    spark = get_spark("probe_scale")
    # warm at BOTH scale factors: a plan that changes shape with size
    # (AQE join-strategy switches, new codegen) would otherwise pay
    # compile + cold page cache inside the timed big run — inflating
    # exactly the ratio this tool exists to measure
    for sf in sfs:
        print(f"# warmup at {sf}")
        for n in names:
            full_mat(REGISTRY[n].fn(spark, sf))
    for n in names:
        times = []
        for sf in sfs:
            t0 = time.time()
            cnt = full_mat(REGISTRY[n].fn(spark, sf))
            times.append((time.time() - t0, cnt))
        (t_small, c_small), (t_big, c_big) = times
        ratio = t_big / t_small if t_small > 0 else float("inf")
        print(f"{n:40s} {t_small:7.2f}s ({c_small} rows)  "
              f"{t_big:7.2f}s ({c_big} rows)  x{ratio:.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
