"""Dump .explain("formatted") for named queries into per-query files —
the optimization-round evidence format (plans/rNN/<query>_{before,after}.txt).

Usage: python tools/dump_plan_files.py OUTDIR SUFFIX query [query ...]
e.g.:  python tools/dump_plan_files.py plans/r11 before fuzzy_dedup_report_capped
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from iot_simulator_datalake_spark.queries import REGISTRY  # noqa: E402
from iot_simulator_datalake_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main(argv: list[str]) -> int:
    outdir, suffix, names = Path(argv[0]), argv[1], argv[2:]
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_plan_files")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(mode)
        (outdir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {outdir}/{name}_{suffix}.txt "
              f"({txt.count('Exchange')} Exchange mentions)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
