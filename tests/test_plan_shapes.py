"""Physical-plan regression tests: the scale-critical plan properties
(broadcasts, pushdown, column pruning, no cartesian products) must
survive refactors.  These assert on ``explain`` output, which is how
the properties were designed in (README 'Design stance')."""

from __future__ import annotations

import io
import contextlib

import pytest

from iot_simulator_datalake_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_broadcasts_dims_no_fact_shuffle(spark):
    plan = plan_of(spark, "fact_avg_by_nation_month")
    assert plan.count("BroadcastHashJoin") >= 2   # customer, nation
    assert "CartesianProduct" not in plan
    # lineitem scan pruned to the two needed columns
    assert "l_orderkey" in plan and "l_comment" not in plan


def test_silver_projection_prunes_columns(spark):
    plan = plan_of(spark, "silver_projection_cast")
    # orders has 6 columns; the query needs 3 — pruning must reach scan
    assert "o_orderkey" in plan
    assert "o_orderpriority" not in plan


def test_theta_join_broadcasts_thresholds(spark):
    plan = plan_of(spark, "threshold_theta_join")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_topk_uses_window_group_limit(spark):
    plan = plan_of(spark, "topk_per_group")
    # Spark 3.5+/4.x pushes rank<=k into WindowGroupLimit: partial
    # per-partition top-K before the shuffle, never a full global sort
    assert "WindowGroupLimit" in plan
    assert "Sort" in plan  # within-partition sorts remain (expected)


def test_global_topn_avoids_full_sort(spark):
    plan = plan_of(spark, "global_topn")
    assert "TakeOrderedAndProject" in plan


def test_minhash_has_no_cartesian(spark):
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_brute_force_topk_broadcasts_probes(spark):
    plan = plan_of(spark, "similarity_topk_bruteforce")
    # the corpus side must not shuffle for the scoring join: the probe
    # set is broadcast (nested-loop is fine — it IS the cross score)
    assert "BroadcastExchange" in plan


def test_q6_pushes_filters_and_prunes(spark):
    plan = plan_of(spark, "tpch_q6_forecast_revenue")
    # all predicates must reach the parquet scan, and only the 4 needed
    # columns may be read
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan
    assert "l_returnflag" not in plan
    assert "Exchange" in plan  # exactly the partial->final agg exchange
    assert "CartesianProduct" not in plan


def test_q18_broadcasts_semi_filter(spark):
    plan = plan_of(spark, "tpch_q18_large_volume")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_running_total_single_shuffle(spark):
    plan = plan_of(spark, "window_running_total")
    # one hashpartitioning exchange on the window key, nothing else
    assert plan.count("hashpartitioning") == 1
    assert "Window" in plan


def test_moving_avg_windows_over_preagg(spark):
    plan = plan_of(spark, "moving_avg_7d")
    # the window must consume the daily aggregate, not raw orders:
    # HashAggregate appears below Window in the plan tree (higher id)
    assert "Window" in plan and "HashAggregate" in plan


def test_argmax_is_pure_hash_agg(spark):
    plan = plan_of(spark, "argmax_latest_event")
    # no window: max_by runs as a two-phase (partial+final) aggregate
    # (SortAggregate — the ordering-key buffer isn't hash-compatible)
    assert "Window" not in plan
    assert plan.count("Aggregate (") >= 2  # partial + final


def test_hash_sample_no_shuffle(spark):
    plan = plan_of(spark, "hash_sample_stratified")
    assert "Exchange" not in plan  # pure narrow filter


def test_q10_pushes_filters_broadcasts_dims(spark):
    plan = plan_of(spark, "tpch_q10_returned_items")
    # quarter + returnflag predicates reach their scans pre-join
    assert "IsNotNull(l_returnflag)" in plan or "l_returnflag" in plan
    assert "PushedFilters: [" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q14_broadcasts_part_lookup(spark):
    plan = plan_of(spark, "tpch_q14_promo_revenue")
    assert "BroadcastHashJoin" in plan
    # part scan pruned to the two lookup columns
    assert "p_partkey" in plan and "p_retailprice" not in plan


def test_pivot_no_discovery_scan(spark):
    plan = plan_of(spark, "pivot_type_counts")
    # explicit value list → pivotfirst aggregate, never a distinct-
    # discovery job: exactly ONE scan of events feeds the whole plan
    assert plan.count("Location: InMemoryFileIndex") == 1
    # both aggregate levels are map-side combinable (partial_* present),
    # and the second shuffle moves only (user × ≤5 types) collapsed rows
    assert "partial_pivotfirst" in plan
    assert plan.count("hashpartitioning") == 2


def test_cube_expands_once(spark):
    plan = plan_of(spark, "cube_status_priority")
    assert "Expand" in plan
    assert plan.count("hashpartitioning") == 1


def test_q13_aggregates_orders_before_join(spark):
    plan = plan_of(spark, "tpch_q13_customer_distribution")
    # orders must collapse to per-customer counts BEFORE the left join:
    # an aggregate exists on the build/right side of the join subtree
    assert "Aggregate" in plan
    assert "CartesianProduct" not in plan


def test_q17_window_over_filtered_join(spark):
    plan = plan_of(spark, "tpch_q17_small_quantity")
    # brand filter broadcasts; the per-part average is a Window over the
    # already-joined subset — exactly two scans (lineitem + part), no
    # self-join of lineitem
    assert plan.count("Location: InMemoryFileIndex") == 2
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan


def test_q22_broadcast_scalar_and_anti_join(spark):
    plan = plan_of(spark, "tpch_q22_dormant_accounts")
    # the global-average row broadcasts (nested-loop of a 1-row side),
    # the dormancy check is a LeftAnti, and the recent-orders side is
    # date-pruned at its scan
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan
    assert "PushedFilters: [" in plan


def test_quantize_int8_is_map_only(spark):
    plan = plan_of(spark, "embedding_quantize_int8")
    # pure column transform: no shuffle anywhere in the plan
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_seq_packing_single_shard_shuffle(spark):
    plan = plan_of(spark, "seq_packing")
    # one hash shuffle on the shard key feeds the cumulative-sum
    # window; the block explode happens after it, map-side
    assert plan.count("hashpartitioning") == 1
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_contamination_broadcasts_eval_side(spark):
    plan = plan_of(spark, "contamination_ngram")
    # the (small) eval shingle set broadcasts: the train side never
    # shuffles for the join — only the final pair-count aggregates
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_length_gate_broadcasts_bounds(spark):
    plan = plan_of(spark, "length_quantile_filter")
    # the 1-row quantile bounds broadcast back over the corpus
    assert "BroadcastNestedLoopJoin" in plan


def test_domain_mix_is_map_only(spark):
    plan = plan_of(spark, "domain_mix_weighted")
    assert "Exchange" not in plan          # pure scan→filter→project
    assert "text" not in plan              # column pruning reaches scan


def test_epoch_upsample_is_map_only(spark):
    plan = plan_of(spark, "epoch_upsample")
    assert "Exchange" not in plan          # explode is map-side
    assert "Generate" in plan
    assert "text" not in plan


def test_curriculum_broadcasts_thresholds(spark):
    plan = plan_of(spark, "curriculum_order")
    # thresholds are a 1-row dim: must broadcast, never shuffle docs
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "text" not in plan              # only doc_id + n_chars read


def test_bpe_pairs_partial_agg_and_topn(spark):
    plan = plan_of(spark, "bpe_pair_stats")
    # partial (map-side) count before the single pair shuffle
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan


def test_funnel_single_event_shuffle(spark):
    plan = plan_of(spark, "funnel_conversion")
    # three chained stage-min windows share ONE user_id exchange; the
    # only later exchanges belong to the global distinct-count aggregate
    body = plan.split("\n\n")[0]           # operator tree only
    assert body.count("Exchange") == 3     # window + distinct-agg pair
    assert body.count("Window") == 3
    assert "CartesianProduct" not in plan
    # pruning: only ts/user_id/event_type leave the scan
    assert "props" not in plan and "value#" not in plan


def test_heavy_hitters_broadcasts_total(spark):
    plan = plan_of(spark, "heavy_hitters_exact")
    # the 1-row total joins via broadcast, not a global window
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 2   # map-side partial counts


def test_transition_matrix_normalizes_post_agg(spark):
    plan = plan_of(spark, "event_transition_matrix")
    # the per-from_type normalizing window runs AFTER the pair-count
    # aggregate (tiny relation), never over the raw pair stream
    body = plan.split("\n\n")[0]
    # printed top-down: the normalizing Window sits ABOVE the aggregate
    assert body.index("Window") < body.index("HashAggregate")
    assert "CartesianProduct" not in plan


def test_gap_fill_co_partitioned_spine_join(spark):
    plan = plan_of(spark, "ts_gap_fill_interpolate")
    assert "CartesianProduct" not in plan
    # props/event_type pruned from the events scan
    assert "props" not in plan


def test_anomaly_zscore_single_exchange(spark):
    plan = plan_of(spark, "anomaly_zscore")
    body = plan.split("\n\n")[0]
    assert body.count("Exchange") == 1     # one user_id shuffle
    assert body.count("Window") == 1       # moment sums share one window


def test_downtime_gaps_single_exchange(spark):
    plan = plan_of(spark, "downtime_gaps")
    body = plan.split("\n\n")[0]
    assert body.count("Exchange") == 1
    assert "props" not in plan and "value#" not in plan


def test_interval_merge_single_exchange(spark):
    # gaps-and-islands: one hash exchange on user_id shared by both
    # window passes and the island aggregate
    plan = plan_of(spark, "interval_merge")
    body = plan.split("\n\n")[0]
    assert body.count("Exchange") == 1
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_is_equi_not_nested_loop(spark):
    # the bucket-grid decomposition must plan as a hash/merge equi
    # join on (user, bucket) — never the nested-loop theta join the
    # raw overlap predicate would force
    plan = plan_of(spark, "interval_overlap_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_triangle_count_broadcasts_edge_list(spark):
    # triangle joins run on the aggregated 25-node edge list — every
    # join in the plan should be broadcastable; no cartesian blow-up
    plan = plan_of(spark, "triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_kmeans_broadcasts_centroids(spark):
    # per-round point⋈centroid join must broadcast the k×d side, and
    # the points scan is pruned to (vec_id, embedding)
    plan = plan_of(spark, "kmeans_lloyd")
    assert "BroadcastHashJoin" in plan
    assert "label" not in plan  # unused column pruned from scan


def test_simhash_pairs_banding_over_distinct_fps(spark):
    # candidate logic must run on the distinct-fingerprint relation and
    # the doc-pair expansion must broadcast the qualifying fp pairs —
    # never a doc-granularity band self-join (quadratic on template
    # corpora; see SCALE.md round-2 section)
    plan = plan_of(spark, "simhash_hamming_pairs")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_point_in_time_is_joinless_single_window(spark):
    # the union-window as-of executes with NO join operator at all:
    # one exchange on user_id, one sort, one window
    plan = plan_of(spark, "scd2_point_in_time_join")
    assert "Join" not in plan
    assert "Window" in plan


def test_market_basket_broadcasts_counts_no_cartesian(spark):
    plan = plan_of(spark, "market_basket_lift")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2   # item counts ×2
    # lineitem scan pruned to the two key columns
    assert "l_orderkey" in plan and "l_extendedprice" not in plan


def test_bm25_and_weighted_sample_use_partial_topk(spark):
    for name in ("bm25_topk", "weighted_sample_topk"):
        plan = plan_of(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name


def test_countmin_broadcasts_sketch(spark):
    plan = plan_of(spark, "countmin_freq_estimate")
    assert "BroadcastHashJoin" in plan
    # sketch build reads only the key column
    assert "l_partkey" in plan and "l_quantity" not in plan


def test_multi_distinct_agg_uses_expand(spark):
    plan = plan_of(spark, "multi_distinct_agg")
    assert "Expand" in plan
    # tree section: one distinct-agg shuffle + final agg shuffle only
    assert plan.count("+- Exchange") <= 2


def test_maybe_broadcast_gates_on_plan_size(spark):
    """SCALE doctrine 3 / VERDICT r2 #1: sf-proportional relations must
    never carry a HARD broadcast hint.  maybe_broadcast hints only when
    Catalyst stats prove the side small; above the gate it returns the
    frame unhinted so AQE decides from measured runtime sizes."""
    from pyspark.sql import functions as F
    from iot_simulator_datalake_spark.operators.hints import (
        maybe_broadcast, plan_size_bytes)

    c = spark.read.parquet(f"{SF}/customer.parquet")
    size = plan_size_bytes(c)
    assert size is not None and size > 0

    # Below the gate: hint applied → logical plan carries ResolvedHint.
    hinted = maybe_broadcast(c, max_bytes=size + 1)
    assert "broadcast" in hinted._jdf.queryExecution().analyzed().toString().lower()

    # Above the gate (probe threshold below the table's size — models
    # customer at 100×): NO hint anywhere in the logical plan.
    unhinted = maybe_broadcast(c, max_bytes=size - 1)
    assert "hint" not in unhinted._jdf.queryExecution().analyzed().toString().lower()

    # End-to-end: a join built through the gated helper at the probe
    # threshold must not contain a broadcast hint pre-AQE; the physical
    # strategy is then AQE/planner's choice, not ours.
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"], "left")
         .join(maybe_broadcast(c, max_bytes=size - 1),
               o["o_custkey"] == c["c_custkey"], "left"))
    assert "unresolvedhint" not in j._jdf.queryExecution().logical().toString().lower()


def test_no_hard_broadcast_of_sf_proportional_tables():
    """Source-level guard: no query module may hard-hint customer /
    supplier / part / orders / lineitem (the sf-proportional tables).
    Bounded relations (nation=25, region=5, calendar dims, 1-row
    aggregates, nation-level graph state) may keep F.broadcast."""
    import pathlib, re
    pkg = pathlib.Path("iot_simulator_datalake_spark")
    # variable names bound to sf-proportional loads across query modules
    banned = re.compile(
        r"F\.broadcast\(\s*(c|s|p|li|o|cust|supp|customer|supplier|part|"
        r"orders|lineitem|big|heavy|eu_supp|nat_supp|bad|pp)\s*[,)\.]")
    offenders = []
    for f in sorted(pkg.glob("queries*.py")):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if banned.search(line):
                offenders.append(f"{f.name}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)


def test_bigram_lm_no_cartesian_model_join_keyed(spark):
    plan = plan_of(spark, "bigram_lm_score")
    # model scoring is an equi-join on (prev, cur); the only nested-loop
    # allowed is the broadcast 1-row |V| scalar
    assert "CartesianProduct" not in plan


def test_quality_classifier_single_shuffle_no_join(spark):
    plan = plan_of(spark, "quality_classifier_score")
    # weight lookup is pure expression (no lookup-table join); the only
    # exchange is the per-doc aggregate
    assert "Join" not in plan
    assert plan.count("hashpartitioning(doc_id") == 1


def test_semdedup_pairs_stay_within_buckets(spark):
    plan = plan_of(spark, "semdedup_prune")
    # pairwise cosine must be bucket-keyed, never all-pairs
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gopher_rules_no_cartesian(spark):
    plan = plan_of(spark, "gopher_quality_rules")
    assert "CartesianProduct" not in plan


def test_pq_adc_serves_from_codes_with_broadcast_table(spark):
    """r9 ADC serving: the probe's distance table (blocks×k rows) must
    broadcast onto the code assignment; query-time work is the code
    lookup join + integer sum + TakeOrderedAndProject — never a
    cartesian, never a re-scan of raw floats per candidate."""
    plan = plan_of(spark, "similarity_topk_pq_adc")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_pq_adc_recall_eval_bounds(spark):
    """recall_ppm must be a true ratio over exactly k rows, and ADC
    must agree with itself run-to-run (deterministic integer ties)."""
    from iot_simulator_datalake_spark.queries import REGISTRY
    SF = "/root/testdata/sf0.001"
    r = REGISTRY["pq_adc_recall_eval"].fn(spark, SF).collect()[0]
    assert r["k"] == 10 and 0 <= r["hits"] <= r["k"]
    assert r["recall_ppm"] == (r["hits"] * 1_000_000) // r["k"]
    a = REGISTRY["similarity_topk_pq_adc"].fn(spark, SF).collect()
    b = REGISTRY["similarity_topk_pq_adc"].fn(spark, SF).collect()
    assert [(x["vec_id"], x["adc2"]) for x in a] == \
        [(x["vec_id"], x["adc2"]) for x in b]


def test_ivfpq_routes_then_scores_from_codes(spark):
    """r9 fused IVF-PQ: coarse assignment is a broadcast of the 8-row
    centroid table; candidate scoring equi-joins on (cluster) and
    (probe_id, blk, cid) — no cartesian beyond the constant-width
    centroid expansion, and top-k per probe is rank-windowed over
    cell-sized relations."""
    plan = plan_of(spark, "similarity_topk_ivfpq")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivfpq_agrees_with_pq_adc_within_probe_cell(spark):
    """Internal consistency: for probe 0, the fused query's scores
    must equal the full-corpus ADC scores restricted to probe 0's
    IVF cell (routing changes WHICH candidates, never their score)."""
    from iot_simulator_datalake_spark.queries import REGISTRY
    SF = "/root/testdata/sf0.001"
    fused = {(r["vec_id"]): r["adc2"]
             for r in REGISTRY["similarity_topk_ivfpq"].fn(spark, SF)
             .filter("probe_id = 0").collect()}
    full = {r["vec_id"]: r["adc2"]
            for r in REGISTRY["similarity_topk_pq_adc"].fn(spark, SF)
            .collect()}
    shared = set(fused) & set(full)
    assert shared, "probe 0's cell should intersect the global top-k"
    assert all(fused[v] == full[v] for v in shared)


def test_ivfpq_residual_matches_true_within_cell_distance(spark):
    """The residual identity — (a−c)−(b−c) = a−b — means residual ADC
    with EXACT codes (a vector's own residual assigned to itself)
    approximates true L2; here we pin the weaker but exact invariant:
    the residual query's scores are reproducible and its top-k per
    probe is rank-dense 1..5."""
    from iot_simulator_datalake_spark.queries import REGISTRY
    SF = "/root/testdata/sf0.001"
    rows = REGISTRY["similarity_topk_ivfpq_residual"].fn(spark, SF) \
        .collect()
    per = {}
    for r in rows:
        per.setdefault(r["probe_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per.values())
    again = REGISTRY["similarity_topk_ivfpq_residual"].fn(spark, SF) \
        .collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
