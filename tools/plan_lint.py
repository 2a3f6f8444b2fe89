"""Registry-wide physical-plan lint: scan EVERY declared query's plan
for scale antipatterns.  The spot assertions in
tests/test_plan_shapes.py defend ~50 named plans; this tool sweeps all
of them so a regression in an unwatched query still surfaces.

Checks (each a named rule):

- cartesian        CartesianProduct anywhere (allowlisted: queries whose
                   docstring claims a deliberate bounded cross score)
- bnl-join         BroadcastNestedLoopJoin against a non-trivial side
                   (allowlisted the same way — theta joins against
                   1-row/threshold relations are fine)
- global-window    WindowExec with an empty partition spec over a
                   non-aggregated input (the single-partition funnel);
                   detected as 'Window [...]' without 'partitionBy' in
                   the formatted plan section following an Exchange
                   SinglePartition
- python-row-udf   BatchEvalPython (row-at-a-time Python) — always wrong
                   here; Arrow paths show ArrowEvalPython / FlatMap*
                   instead

Usage: python tools/plan_lint.py [sf_dir] [name ...]
Exit 1 if any non-allowlisted hit is found.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from iot_simulator_datalake_spark.queries import REGISTRY  # noqa: E402
from iot_simulator_datalake_spark.session import get_spark  # noqa: E402

#: queries whose docstrings justify a bounded cross/NL join (brute-force
#: verifier baselines, 1-row scalar broadcasts, tiny grids) — each cites
#: its own bound in-code; the lint trusts but lists them.
CROSS_ALLOW = {
    "similarity_topk_bruteforce",   # explicit O(P×C) verifier baseline
    "threshold_theta_join",         # thresholds relation is 4 rows
    "asof_threshold_join",          # same threshold relation
    "interval_overlap_join",        # oracle-side naive twin only
    "ann_recall_eval",              # brute-force ground truth inside
    "embedding_neardup_pairs",      # blocked; block sizes bounded
    "maxsim_late_interaction",      # query set × doc tokens, Q bounded
    "mmr_diverse_rerank",           # k×k re-rank, k bounded
    "stats_weighted_sample",        # 1-row total broadcast
    "string_similarity_levenshtein",  # blocked pair relation
    "random_walk_corpus",           # crossJoin with Range(per_node=10)
    "similarity_topk_ivf",          # probes × nlist centroid table
    "skipgram_pairs",               # composes random_walk_corpus
    "hard_negative_mining",         # bounded probe set × bucketed corpus
    "ab_ttest_welch",               # 1-row segA stats × 1-row segB stats
    "segment_overlap_kmv",          # pair-gen over the distinct-segment
                                    # relation: segments²·K bound cited
                                    # in queries_stats.py docstring
}

#: Python row paths that exist BY DESIGN (the UDTF API-correctness
#: gate); everything else must be Arrow-batched or JVM builtins.
PYTHON_ALLOW = {"udtf_doc_chunker"}

#: streaming / engine-run queries execute side effects at build time and
#: return small batch results — their final plan is not the interesting
#: one, and building them is expensive; the streaming twins are gated by
#: their own batch-equivalence oracles instead.
SKIP_PREFIX = ("streaming_", "engine_", "simulator_streaming",
               "incremental_", "apply_changes", "snapshot_changes")


def plan_of(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def lint(name: str, plan: str) -> list[str]:
    hits = []
    if "CartesianProduct" in plan and name not in CROSS_ALLOW:
        hits.append("cartesian")
    if ("BroadcastNestedLoopJoin" in plan and name not in CROSS_ALLOW
            and "Keys: []" not in plan):
        # a keyless HashAggregate ("Keys: []" in formatted detail)
        # marks the build side as a 1-row scalar (global aggregate)
        # broadcast — the intended shape for normalization constants;
        # anything else is a real NL join
        hits.append("bnl-join")
    if "BatchEvalPython" in plan and name not in PYTHON_ALLOW:
        hits.append("python-row-udf")
    # single-partition window funnel: Exchange SinglePartition directly
    # feeding a Window/Sort — scan the formatted tree for the pair
    if "Exchange SinglePartition" in plan and "Window" in plan:
        # tolerate TakeOrderedAndProject/global agg single partitions;
        # flag only when a Window consumes the single partition
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" in ln:
                above = "".join(lines[max(0, i - 6):i])
                if "Window" in above:
                    hits.append("global-window")
                    break
    return hits


def main(argv: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.001"
    if argv and "/" in argv[0]:
        sf_dir, argv = argv[0], argv[1:]
    names = argv or [n for n in sorted(REGISTRY)
                     if not n.startswith(SKIP_PREFIX)]
    spark = get_spark("plan_lint")
    bad = {}
    for n in names:
        try:
            hits = lint(n, plan_of(spark, n, sf_dir))
        except Exception as e:     # build failures are their own signal
            hits = [f"build-error: {str(e)[:80]}"]
        if hits:
            bad[n] = hits
            print(f"  LINT {n}: {', '.join(hits)}")
    print(f"{len(names) - len(bad)}/{len(names)} plans clean"
          + (f"; {len(bad)} flagged" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
