"""Invariant tests for the statistical-mining family (queries_stats.py).

The oracle gate certifies cross-engine equality; these assert the
SEMANTIC invariants: lift/support arithmetic reproduces from raw
counts, Pearson r matches numpy, count-min never under-counts, the
grid join finds exactly the brute-force pair set, and the
point-in-time join never reads a future version.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.queries import REGISTRY, load
from iot_simulator_datalake_spark.queries_stats import _CMS, _GRID

SF = "/root/testdata/sf0.001"


def test_market_basket_metrics_reproduce_from_counts(spark):
    out = REGISTRY["market_basket_lift"].fn(spark, SF).cache()
    rows = out.collect()
    b = (load(spark, SF, "lineitem")
         .select(F.col("l_orderkey").alias("ok"),
                 F.col("l_partkey").alias("pk")).distinct().cache())
    n_orders = b.select("ok").distinct().count()
    item = {r["pk"]: r["n"] for r in
            b.groupBy("pk").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["pair_cnt"] >= 2
        assert r["cnt_a"] == item[r["part_a"]]
        assert r["cnt_b"] == item[r["part_b"]]
        assert r["support_ppm"] == r["pair_cnt"] * 1_000_000 // n_orders
        assert r["confidence_ppm"] == r["pair_cnt"] * 1_000_000 // r["cnt_a"]
        assert (r["lift_ppm"] ==
                n_orders * r["pair_cnt"] * 1_000_000 //
                (r["cnt_a"] * r["cnt_b"]))
    # pair counts themselves: spot-check one pair by brute force
    if rows:
        r0 = rows[0]
        got = (b.alias("x").join(b.alias("y"), "ok")
               .where((F.col("x.pk") == r0["part_a"]) &
                      (F.col("y.pk") == r0["part_b"])).count())
        assert got == r0["pair_cnt"]


def test_corr_regression_matches_numpy(spark):
    import numpy as np
    out = {r["grp"]: r for r in
           REGISTRY["corr_regression_exact"].fn(spark, SF).collect()}
    li = load(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount").collect()
    by = {}
    for r in li:
        by.setdefault(r["l_returnflag"], ([], []))
        by[r["l_returnflag"]][0].append(round(r["l_quantity"] * 1e6))
        by[r["l_returnflag"]][1].append(round(r["l_discount"] * 1e6))
    for g, (xs, ys) in by.items():
        r_np = float(np.corrcoef(xs, ys)[0, 1])
        slope_np, icept_np = np.polyfit(xs, ys, 1)
        assert math.isclose(out[g]["pearson_r"], r_np, abs_tol=1e-6)
        assert math.isclose(out[g]["slope"], slope_np, abs_tol=1e-6)
        assert math.isclose(out[g]["intercept_micro"], icept_np,
                            rel_tol=1e-6, abs_tol=1e-3)
        assert -1.0 <= out[g]["pearson_r"] <= 1.0


def test_countmin_never_undercounts_and_is_tight_here(spark):
    out = {r["part"]: r["est_count"] for r in
           REGISTRY["countmin_freq_estimate"].fn(spark, SF).collect()}
    truth = {r["l_partkey"]: r["n"] for r in
             load(spark, SF, "lineitem")
             .filter(F.col("l_partkey") <= _CMS["probe_max"])
             .groupBy("l_partkey").agg(F.count("*").alias("n")).collect()}
    assert set(out) == set(truth)
    assert all(out[k] >= truth[k] for k in truth)      # CMS one-sided error
    # at this SF (≤200 parts vs 4×512 cells) collisions are rare: the
    # MEDIAN estimate must be exact even if a few keys collide
    exact = sum(1 for k in truth if out[k] == truth[k])
    assert exact >= len(truth) * 0.9


def test_spatial_grid_equals_bruteforce(spark):
    out = REGISTRY["spatial_grid_join"].fn(spark, SF)
    got = {(r["id_a"], r["id_b"]): r["chebyshev"] for r in out.collect()}
    # brute force over the same hashed coordinates
    cust = load(spark, SF, "customer").select("c_custkey").collect()
    import hashlib
    def axis(seed, k):
        h = hashlib.md5(f"{seed}:{k}".encode()).hexdigest()
        return int(h[:15], 16) % _GRID["space"]
    pts = [(r["c_custkey"], axis("lat", r["c_custkey"]),
            axis("lon", r["c_custkey"])) for r in cust]
    want = {}
    for i, (ka, xa, ya) in enumerate(pts):
        for kb, xb, yb in pts[i + 1:]:
            d = max(abs(xa - xb), abs(ya - yb))
            if d <= _GRID["cell"]:
                want[(min(ka, kb), max(ka, kb))] = d
    assert got == want


def test_spatial_grid_plans_as_equi_join(spark):
    import io, contextlib
    df = REGISTRY["spatial_grid_join"].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_point_in_time_never_reads_future(spark):
    out = REGISTRY["scd2_point_in_time_join"].fn(spark, SF).cache()
    e = load(spark, SF, "events")
    versions = e.filter(F.col("event_type") != "error").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts"),
        F.col("event_id").alias("vid"))
    j = out.join(versions, out.version_id == versions.vid, "left")
    # every matched version starts at or before the probe instant
    assert j.filter(F.col("version_id").isNotNull() &
                    (F.col("vts") > F.col("ts"))).count() == 0
    # and it is the LATEST such version: no other version in (vts, ts]
    later = (out.filter(F.col("version_id").isNotNull())
             .join(versions, out.version_id == versions.vid)
             .join(e.filter(F.col("event_type") != "error")
                    .select(F.col("user_id").alias("ou"),
                            F.col("ts").alias("ots"),
                            F.col("event_id").alias("oid")),
                   (F.col("ou") == F.col("user_id")) &
                   (F.col("oid") != F.col("version_id")))
             .filter((F.col("ots") <= F.col("ts")) &
                     # strictly-later start, or same start but later id
                     ((F.col("ots") > F.col("vts")) |
                      ((F.col("ots") == F.col("vts")) &
                       (F.col("oid") > F.col("version_id"))))))
    assert later.count() == 0
    # probes with no prior version exist at this SF edge or not — but
    # every probe row must appear exactly once
    n_probes = e.filter(F.col("event_type") == "error").count()
    assert out.count() == n_probes
    assert out.select("probe_id").distinct().count() == n_probes


def test_ols_two_feature_matches_numpy(spark):
    import numpy as np
    out = {r["grp"]: r for r in
           REGISTRY["ols_two_feature"].fn(spark, SF).collect()}
    li = load(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount",
        "l_extendedprice").collect()
    by = {}
    for r in li:
        by.setdefault(r["l_returnflag"], []).append(
            (round(r["l_quantity"] * 100), round(r["l_discount"] * 1e6),
             round(r["l_extendedprice"] * 100)))
    for g, rows in by.items():
        a = np.array([(x1, x2, 1.0) for x1, x2, _ in rows])
        yv = np.array([y for _, _, y in rows], dtype=float)
        (b1, b2, icept), res, *_ = np.linalg.lstsq(a, yv, rcond=None)
        r = out[g]
        assert abs(r["b1"] - b1) < 1e-5 * max(1, abs(b1))
        assert abs(r["b2"] - b2) < 1e-5 * max(1, abs(b2))
        assert abs(r["intercept"] - icept) < 1e-4 * max(1, abs(icept))
        # R² consistent with residuals
        sst = ((yv - yv.mean()) ** 2).sum()
        r2 = 1 - res[0] / sst
        assert abs(r["r2"] - r2) < 1e-6
        assert r["n"] == len(rows)


def test_skew_profile_reproduces(spark):
    import math as m
    out = REGISTRY["skew_profile"].fn(spark, SF).collect()[0]
    from collections import Counter
    cnt = Counter(r["user_id"] for r in
                  load(spark, SF, "events").select("user_id").collect())
    total = sum(cnt.values())
    assert out["n_keys"] == len(cnt)
    assert out["total"] == total
    assert out["top1"] == max(cnt.values())
    assert out["top1_share_ppm"] == max(cnt.values()) * 1_000_000 // total
    ent = sum(round(-(c / total) * m.log(c / total) * 1e9)
              for c in cnt.values())
    assert out["entropy_nano"] == ent
    # entropy bounded by ln(n_keys)
    assert out["entropy_nano"] <= m.log(len(cnt)) * 1e9 + 1


def test_join_size_estimate_is_exact(spark):
    out = REGISTRY["join_size_estimate"].fn(spark, SF).collect()[0]
    li = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders")
    actual = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert out["exact_join_rows"] == actual
    assert out["nd_a"] == li.select("l_orderkey").distinct().count()
    assert out["nd_b"] == o.select("o_orderkey").distinct().count()
    assert out["max_key_product"] >= 1


def test_next_event_pairs_history_is_correct(spark):
    out = REGISTRY["next_event_training_pairs"].fn(spark, SF).cache()
    e = load(spark, SF, "events")
    rows = e.select("user_id", "event_id", "ts", "event_type").collect()
    rows.sort(key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    want = {}
    hist = []
    prev_user = None
    for r in rows:
        if r["user_id"] != prev_user:
            hist, prev_user = [], r["user_id"]
        if hist:
            want[r["event_id"]] = (",".join(hist[-3:]), r["event_type"])
        hist.append(r["event_type"])
    got = {r["event_id"]: (r["history"], r["label"])
           for r in out.collect()}
    assert got == want


def test_weighted_sample_matches_python_aes(spark):
    import hashlib
    from iot_simulator_datalake_spark.queries_stats import _WSAMP
    out = [(r["order_id"], r["weight_cents"]) for r in
           REGISTRY["weighted_sample_topk"].fn(spark, SF).collect()]
    orders = load(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice").collect()
    mod = _WSAMP["mod"]
    pri = []
    for r in orders:
        w = round(r["o_totalprice"] * 100)
        h = int(hashlib.md5(f"ws:{r['o_orderkey']}".encode())
                .hexdigest()[:10], 16) % mod
        pri.append((((h + 0.5) / mod) ** (1.0 / w), r["o_orderkey"], w))
    pri.sort(key=lambda t: (-t[0], t[1]))
    want = [(k, w) for _, k, w in pri[:_WSAMP["k"]]]
    assert out == want
    # heavier-weighted population is overrepresented: the sample's mean
    # weight exceeds the population mean (inclusion ∝ weight)
    pop_mean = sum(w for _, _, w in pri) / len(pri)
    smp_mean = sum(w for _, w in out) / len(out)
    assert smp_mean > pop_mean


def test_rolling_corr_windows_are_correct(spark):
    import numpy as np
    rows = {r["day"]: r for r in
            REGISTRY["rolling_corr_30d"].fn(spark, SF).collect()}
    li = load(spark, SF, "lineitem").select(
        "l_shipdate", "l_quantity", "l_extendedprice").collect()
    from collections import defaultdict
    daily = defaultdict(lambda: [0, 0])
    epoch = __import__("datetime").date(1970, 1, 1)
    for r in li:
        d = (r["l_shipdate"].date() - epoch).days
        daily[d][0] += round(r["l_quantity"] * 100)
        daily[d][1] += round(r["l_extendedprice"] * 100)
    days = sorted(daily)
    for day, r in list(rows.items())[::37]:  # spot-check a spread
        win = [daily[d] for d in days if day - 29 <= d <= day]
        assert r["n_days"] == len(win) >= 10
        xs = np.array([x for x, _ in win], dtype=float)
        ys = np.array([y for _, y in win], dtype=float)
        want = float(np.corrcoef(xs, ys)[0, 1])
        # rolling_r_nano is floor(r * 1e9); /1e9 reintroduces at most
        # 1 nano-unit of floor bias on top of the float tolerance
        assert abs(r["rolling_r_nano"] / 1e9 - want) < 1e-6 + 1e-9


def test_event_trigrams_reproduce(spark):
    from collections import Counter
    out = [(r["trigram"], r["n"]) for r in
           REGISTRY["event_trigram_patterns"].fn(spark, SF).collect()]
    e = load(spark, SF, "events").select(
        "user_id", "event_id", "ts", "event_type").collect()
    e.sort(key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    cnt = Counter()
    for i in range(len(e) - 2):
        a, b, c = e[i], e[i + 1], e[i + 2]
        if a["user_id"] == b["user_id"] == c["user_id"]:
            cnt[f"{a['event_type']}>{b['event_type']}>{c['event_type']}"] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert out == want


def test_ewma_forecast_is_lagged_level(spark):
    from pyspark.sql import Window as W
    out = REGISTRY["ewma_forecast"].fn(spark, SF).cache()
    w = W.partitionBy("user_id").orderBy("day")
    chk = out.select(
        "user_id", "day", "actual_cents", "level_cents", "forecast_cents",
        F.lag("level_cents").over(w).alias("prev_level"),
        F.row_number().over(w).alias("i"))
    # forecast_t == level_{t-1}; first observation has no forecast and
    # its level equals the actual
    assert chk.filter((F.col("i") > 1) &
                      (F.col("forecast_cents") != F.col("prev_level"))
                      ).count() == 0
    assert chk.filter((F.col("i") == 1) &
                      (F.col("forecast_cents").isNotNull() |
                       (F.col("level_cents") != F.col("actual_cents")))
                      ).count() == 0
    # smoothing: level moves toward actual (between prev level and x,
    # inclusive, modulo the floor)
    bad = chk.filter((F.col("i") > 1) & ~(
        ((F.col("level_cents") >= F.least("prev_level", "actual_cents")
          - 1) & (F.col("level_cents") <=
                  F.greatest("prev_level", "actual_cents"))))).count()
    assert bad == 0


def test_interpolated_median_matches_numpy(spark):
    import numpy as np
    out = {r["grp"]: r for r in
           REGISTRY["median_interpolated"].fn(spark, SF).collect()}
    li = load(spark, SF, "lineitem").select(
        "l_returnflag", "l_extendedprice").collect()
    by = {}
    for r in li:
        by.setdefault(r["l_returnflag"], []).append(
            round(r["l_extendedprice"] * 100))
    for g, vals in by.items():
        med = float(np.median(vals))
        assert out[g]["median_2x_cent"] / 2 == med
        assert out[g]["n"] == len(vals)


def test_mau_hll_envelope_and_window_merge_consistency(spark):
    """r9 envelope form: mau_exact must equal the Python sliding
    distinct, and both gated booleans (±3σ envelope; window-frame vs
    self-join merge-plan equivalence) must hold on every window."""
    from collections import defaultdict
    from datetime import date
    rows = REGISTRY["monthly_active_users_hll"].fn(spark, SF).collect()
    assert rows
    assert all(r["within_envelope"] for r in rows)
    assert all(r["window_merge_consistent"] for r in rows)
    out = {r["window_end"]: r["mau_exact"] for r in rows}
    e = load(spark, SF, "events").select("user_id", "ts").collect()
    epoch = date(1970, 1, 1)
    by_day = defaultdict(set)
    for r in e:
        by_day[(r["ts"].date() - epoch).days].add(r["user_id"])
    assert set(out) == set(by_day)  # observed-day window ends only
    for we, mau in out.items():
        users = set()
        for d in range(we - 29, we + 1):
            users |= by_day.get(d, set())
        assert mau == len(users)


def test_hard_negatives_never_share_label(spark):
    out = REGISTRY["hard_negative_mining"].fn(spark, SF).cache()
    assert out.filter(
        F.col("probe_label") == F.col("neg_label")).count() == 0
    per = out.groupBy("probe_id").count().collect()
    assert all(r["count"] == 5 for r in per)
    # hard negatives score at least as high as the WORST unfiltered
    # neighbor would allow: rank is dense 1..5
    ranks = {(r["probe_id"], r["rank"]) for r in out.collect()}
    for pid in {p for p, _ in ranks}:
        assert {(pid, i) for i in range(1, 6)} <= ranks


def test_label_balance_exact_counts_and_determinism(spark):
    out = REGISTRY["label_balance_resample"].fn(spark, SF).cache()
    src = load(spark, SF, "embeddings").groupBy("label").count().collect()
    target = min(r["count"] for r in src)
    got = out.groupBy("label").count().collect()
    assert len(got) == len(src)
    assert all(r["count"] == target for r in got)
    again = {(r["vec_id"], r["label"]) for r in
             REGISTRY["label_balance_resample"].fn(spark, SF).collect()}
    assert again == {(r["vec_id"], r["label"]) for r in out.collect()}


def test_hysteresis_latch_semantics(spark):
    from iot_simulator_datalake_spark.queries_timeseries import _HYST
    out = REGISTRY["hysteresis_alerts"].fn(spark, SF).cache()
    rows = out.collect()
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"],
                                         r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    n_starts = 0
    for seq in by_user.values():
        state = 0
        for r in seq:
            if r["value_cents"] >= _HYST["hi"]:
                state = 1
            elif r["value_cents"] < _HYST["lo"]:
                state = 0
            assert r["alert_on"] == state
        n_starts += sum(r["alert_started"] for r in seq)
        # a start row is always alert_on
        assert all(r["alert_on"] == 1 for r in seq if r["alert_started"])
    assert n_starts > 0
    # hysteresis: rows INSIDE the band inherit state — both states occur
    from pyspark.sql import functions as F
    band = out.filter((F.col("value_cents") >= _HYST["lo"]) &
                      (F.col("value_cents") < _HYST["hi"]))
    states = {r["alert_on"] for r in band.select("alert_on")
              .distinct().collect()}
    assert states == {0, 1}


def test_gini_matches_python(spark):
    out = REGISTRY["gini_concentration"].fn(spark, SF).collect()[0]
    o = load(spark, SF, "orders").select("o_custkey", "o_totalprice") \
        .collect()
    spend = {}
    for r in o:
        spend[r["o_custkey"]] = (spend.get(r["o_custkey"], 0) +
                                 round(r["o_totalprice"] * 100))
    xs = sorted(spend.values())
    n, tot = len(xs), sum(xs)
    iws = sum((i + 1) * x for i, x in enumerate(xs))
    want = round((2 * float(iws) - (n + 1) * float(tot)) /
                 (n * float(tot)) * 1e6)
    assert out["n_customers"] == n
    assert out["total_cents"] == tot
    assert out["gini_ppm"] == want
    assert 0 <= out["gini_ppm"] < 1_000_000
