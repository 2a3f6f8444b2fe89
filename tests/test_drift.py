"""Invariant tests for the drift/experimentation family
(queries_drift.py): each statistic is recomputed independently in
numpy/pandas from the raw rows and must agree to tolerance; structural
invariants (one-sidedness, bounds, leakage exclusion) are asserted
exactly.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from iot_simulator_datalake_spark.queries import REGISTRY, load
from iot_simulator_datalake_spark.queries_drift import _LOO, _PSI, _SEG

SF = "/root/testdata/sf0.001"


def _seg_values(spark, quant=None):
    """Per-segment value lists; quantized to ``round(v*quant)`` ints
    when quant is given, raw doubles otherwise."""
    e = load(spark, SF, "events")
    rows = (e.filter(F.col("event_type").isin(_SEG["a"], _SEG["b"]) &
                     F.col("value").isNotNull())
            .select("event_type", "value").collect())
    conv = (lambda v: round(v * quant)) if quant else (lambda v: v)
    a = [conv(r["value"]) for r in rows if r["event_type"] == _SEG["a"]]
    b = [conv(r["value"]) for r in rows if r["event_type"] == _SEG["b"]]
    return a, b


def test_ks_matches_bruteforce(spark):
    out = REGISTRY["ks_drift_detect"].fn(spark, SF).collect()[0]
    a, b = _seg_values(spark, 1000)
    na, nb = len(a), len(b)
    grid = sorted(set(a) | set(b))
    d_num = max(abs(sum(1 for x in a if x <= v) * nb -
                    sum(1 for x in b if x <= v) * na) for v in grid)
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["d_num"] == d_num
    assert out["d_ppm"] == d_num * 1_000_000 // (na * nb)
    assert 0 <= out["d_ppm"] <= 1_000_000


def test_psi_matches_bruteforce(spark):
    out = REGISTRY["psi_drift_bins"].fn(spark, SF).collect()[0]
    a, b = _seg_values(spark)  # raw values, binned below
    nb_, lo, hi = _PSI["bins"], _PSI["lo"], _PSI["hi"]

    def bins(vals):
        c = [1] * nb_  # add-one smoothing
        for v in vals:
            c[min(nb_ - 1, max(0, math.floor((v - lo) * nb_ / (hi - lo))))] += 1
        return c
    ca, cb = bins(a), bins(b)
    na, nbt = sum(ca), sum(cb)
    want = sum(int(np.round((x / na - y / nbt) *
                            math.log((x * nbt) / (y * na)) * 1e9))
               for x, y in zip(ca, cb) if True)
    assert out["psi_nano"] == want
    assert out["psi_nano"] >= 0          # PSI terms are individually ≥ 0
    assert out["n_bins"] == nb_


def test_chi2_matches_bruteforce(spark):
    out = REGISTRY["chi2_independence"].fn(spark, SF).collect()[0]
    e = load(spark, SF, "events")
    rows = e.select("event_type", F.hour("ts").alias("h")).collect()
    from collections import Counter
    obs = Counter((r["event_type"], r["h"] // 6) for r in rows)
    rt = Counter(); ct = Counter()
    for (et, hq), n in obs.items():
        rt[et] += n; ct[hq] += n
    n = sum(obs.values())
    chi2 = sum(int(np.round((v - rt[et] * ct[hq] / n) ** 2
                            / (rt[et] * ct[hq] / n) * 1e9))
               for (et, hq), v in obs.items())
    assert out["chi2_nano"] == chi2
    assert out["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert out["chi2_nano"] >= 0


def test_spearman_matches_pandas(spark):
    import pandas as pd
    out = {r["grp"]: r["spearman_rho"] for r in
           REGISTRY["spearman_rank_corr"].fn(spark, SF).collect()}
    pdf = load(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    pdf["x"] = (pdf.l_quantity * 100).round().astype("int64")
    pdf["y"] = (pdf.l_extendedprice * 100).round().astype("int64")
    for g, sub in pdf.groupby("l_returnflag"):
        # spearman = pearson over average-tie ranks (scipy-free)
        rx = sub["x"].rank(method="average")
        ry = sub["y"].rank(method="average")
        rho = float(np.corrcoef(rx, ry)[0, 1])
        assert math.isclose(out[g], rho, abs_tol=1e-6)
        assert -1.0 <= out[g] <= 1.0


def test_welch_matches_numpy(spark):
    out = REGISTRY["ab_ttest_welch"].fn(spark, SF).collect()[0]
    a, b = _seg_values(spark, 1_000_000)
    a, b = np.array(a, dtype=float), np.array(b, dtype=float)
    se = math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    t = (a.mean() - b.mean()) / se
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert math.isclose(out["t_stat"], t, abs_tol=1e-6)
    assert math.isclose(out["mean_diff_micro"], a.mean() - b.mean(),
                        abs_tol=1e-3)


def test_target_encoding_excludes_self(spark):
    out = REGISTRY["target_encode_loo"].fn(spark, SF).cache()
    c = load(spark, SF, "customer").collect()
    micro = {r["c_custkey"]: round(r["c_acctbal"] * 1_000_000) for r in c}
    seg_of = {r["c_custkey"]: r["c_mktsegment"] for r in c}
    seg_sum, seg_n = {}, {}
    for k, v in micro.items():
        s = seg_of[k]
        seg_sum[s] = seg_sum.get(s, 0) + v
        seg_n[s] = seg_n.get(s, 0) + 1
    prior = sum(seg_sum.values()) // sum(seg_n.values())
    m = _LOO["m"]
    for r in out.collect():
        k, s = r["customer"], r["seg"]
        want = ((seg_sum[s] - micro[k] + m * prior) //
                (seg_n[s] - 1 + m))
        assert r["encoded_micro"] == want
    # leakage check: perturbing ONE row's target changes that row's
    # encoding denominator-excluded numerator — i.e. the encoding of a
    # row is independent of its own target only through the exclusion;
    # verified structurally above by exact reproduction
    assert out.count() == len(c)


def test_streaming_psi_equals_batch(spark):
    batch = REGISTRY["psi_drift_bins"].fn(spark, SF).collect()[0]
    stream = REGISTRY["streaming_psi_drift"].fn(spark, SF).collect()[0]
    assert stream["psi_nano"] == batch["psi_nano"]
    assert stream["n_bins"] == batch["n_bins"]


def test_k_anonymity_groups_and_completeness(spark):
    from collections import Counter
    from iot_simulator_datalake_spark.queries_drift import _KANON
    out = REGISTRY["k_anonymity_violations"].fn(spark, SF).collect()
    c = load(spark, SF, "customer").collect()
    # Spark `div` and DuckDB `//` both TRUNCATE toward zero on
    # negatives (balances can be < 0); Python // floors — use int()
    groups = Counter(
        (r["c_nationkey"], r["c_mktsegment"],
         int(round(r["c_acctbal"] * 100) / _KANON["bucket"])) for r in c)
    want = {k: v for k, v in groups.items() if v < _KANON["k"]}
    got = {(r["nationkey"], r["seg"], r["bal_bucket"]): r["group_size"]
           for r in out}
    assert got == want
    assert all(v < _KANON["k"] for v in got.values())
