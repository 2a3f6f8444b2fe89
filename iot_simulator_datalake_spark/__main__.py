"""CLI: ``python -m iot_simulator_datalake_spark run|test`` — the
engine's equivalent of the reference job's two steps (``dbt run`` then
``dbt test``, resources/jobs.yml:30-33; O5 in SURVEY §2.10)."""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="iot_simulator_datalake_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("run", "test"):
        s = sub.add_parser(name)
        s.add_argument("--landing", default="/tmp/iot_landing",
                       help="JSON landing directory (iot_events_path var)")
        s.add_argument("--warehouse", default="/tmp/iot_lake_warehouse")
        s.add_argument("--batch", action="store_true",
                       help="batch bronze/silver instead of streaming")
    args = p.parse_args(argv)

    from .engine import Engine
    from .pipeline import attach_reference_checks, build_registry
    from .session import get_spark

    spark = get_spark("iot-lake-cli")
    eng = Engine(spark, build_registry(streaming=not args.batch),
                 config={"iot_events_path": args.landing,
                         "warehouse": args.warehouse},
                 warehouse=args.warehouse)
    result = eng.run()
    for qn in result.materialized:
        print(f"  materialized {qn} [{result.seconds[qn]:.2f}s]")
    if args.cmd == "test":
        attach_reference_checks(eng)
        failures = 0
        for res in eng.test():
            status = "PASS" if res.passed else f"FAIL ({res.violations}+)"
            print(f"  {res.name}: {status}")
            failures += 0 if res.passed else 1
        return 1 if failures else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
