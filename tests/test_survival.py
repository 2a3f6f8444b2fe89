"""Invariant tests for the experimentation/survival additions:
Wilson intervals bracket the point rate and reproduce from (n, k);
the Kaplan–Meier curve reproduces from a direct Python estimator and
is monotonically non-increasing.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.queries import REGISTRY, load
from iot_simulator_datalake_spark.queries_behavior import _KM

SF = "/root/testdata/sf0.001"


def test_wilson_interval_reproduces_and_brackets(spark):
    rows = REGISTRY["conversion_rate_wilson"].fn(spark, SF).collect()
    assert rows
    z = 1.96
    for r in rows:
        n, k = r["n"], r["k"]
        assert 0 <= k <= n
        p = k / n
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        # bounds are floor(x * 1e9) integer nano-units; allow 1 ulp of
        # slack for the floor landing on either side of a float boundary
        lo_want = math.floor((center - half) / denom * 1e9)
        hi_want = math.floor((center + half) / denom * 1e9)
        assert abs(r["wilson_lo_nano"] - lo_want) <= 1
        assert abs(r["wilson_hi_nano"] - hi_want) <= 1
        assert 0 <= r["wilson_lo_nano"] <= p * 1e9 + 1
        assert p * 1e9 - 1 <= r["wilson_hi_nano"] <= 1e9
        assert r["rate_ppm"] == k * 1_000_000 // n


def test_kaplan_meier_matches_python_estimator(spark):
    out = [(r["day"], r["deaths"], r["n_risk"], r["ln_survival_nano"])
           for r in REGISTRY["kaplan_meier_churn"].fn(spark, SF)
           .orderBy("day").collect()]
    e = load(spark, SF, "events").select("user_id", "ts").collect()
    first, last = {}, {}
    tmax = max(r["ts"] for r in e)
    for r in e:
        u = r["user_id"]
        first[u] = min(first.get(u, r["ts"]), r["ts"])
        last[u] = max(last.get(u, r["ts"]), r["ts"])
    users = [((last[u].date() - first[u].date()).days,
              0 if (tmax.date() - last[u].date()).days
              < _KM["censor_days"] else 1) for u in first]
    from collections import Counter
    d = Counter(); leave = Counter()
    for dur, died in users:
        leave[dur] += 1
        d[dur] += died
    days = sorted(leave)
    at_risk = {}
    run = len(users)
    for t in days:
        at_risk[t] = run
        run -= leave[t]
    cum = 0
    want = []
    for t in days:
        if at_risk[t] <= d[t]:
            continue
        if d[t] > 0:
            cum += round(math.log((at_risk[t] - d[t]) / at_risk[t]) * 1e9)
        want.append((t, d[t], at_risk[t], cum))
    assert out == want
    # survival is non-increasing and ≤ 1
    lns = [w[3] for w in want]
    assert all(a >= b for a, b in zip(lns, lns[1:]))
    assert all(x <= 0 for x in lns)
