"""Steal-aware per-query timing: bench-identical action (count /
full_mat after the bench's join-faithfulness check), N timed passes
after a warm-up, per-pass wall seconds AND the host CPU-steal delta
(/proc/stat field 9) so a co-tenant burst is visible per pass instead
of silently inflating a median (the round-11 measurement hazard: the
single-thread md5 calibration sentinel misses multi-core steal
entirely).

Usage: python tools/time_queries.py [--sf DIR] [--passes N] q1 q2 ...
Prints one JSON line: {query: {"walls": [...], "steals": [...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from iot_simulator_datalake_spark.actions import full_mat  # noqa: E402
from iot_simulator_datalake_spark.queries import REGISTRY  # noqa: E402
from iot_simulator_datalake_spark.session import get_spark  # noqa: E402


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main(argv: list[str]) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = 5
    while argv and argv[0].startswith("--"):
        if argv[0] == "--sf":
            sf_dir, argv = argv[1], argv[2:]
        elif argv[0] == "--passes":
            passes, argv = int(argv[1]), argv[2:]
    names = argv
    sys.path.insert(0, "/root/repo")
    from bench import count_is_faithful
    spark = get_spark("time_queries")
    needs_full_mat = set()
    for name in names:                      # warm-up
        df = REGISTRY[name].fn(spark, sf_dir)
        if not count_is_faithful(df):
            needs_full_mat.add(name)
            full_mat(df)
        else:
            df.count()
    out: dict[str, dict] = {n: {"walls": [], "steals": []} for n in names}
    for _ in range(passes):
        for name in names:
            s0, t0 = steal_jiffies(), time.monotonic()
            df = REGISTRY[name].fn(spark, sf_dir)
            full_mat(df) if name in needs_full_mat else df.count()
            out[name]["walls"].append(round(time.monotonic() - t0, 3))
            out[name]["steals"].append(steal_jiffies() - s0)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
