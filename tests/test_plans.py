"""Physical-plan assertions: the 100 TB posture rules hold in the actual
plans, not just in docstrings (SURVEY.md §4.2)."""

from __future__ import annotations

import pytest

from machinelearningalgomapreduce_spark import registry
from machinelearningalgomapreduce_spark.plans import inspect as P


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir, queries):
    assert P.has_pushed_filters(queries["q_filter_pred"](spark, sf_dir))
    assert P.has_pushed_filters(queries["q_filter_agg"](spark, sf_dir))


def test_column_pruning_scan_project(spark, sf_dir, queries):
    [cols] = P.scan_read_columns(queries["q_scan_project"](spark, sf_dir))
    # part has 6 columns; the query touches exactly 4.
    assert sorted(cols) == ["p_name", "p_partkey", "p_retailprice", "p_type"]


def test_dimension_joins_broadcast(spark, sf_dir, queries):
    assert P.count_broadcast_joins(queries["q_join_broadcast"](spark, sf_dir)) >= 2
    assert P.count_broadcast_joins(queries["q_join5_region"](spark, sf_dir)) >= 3


def test_topk_plans_take_ordered(spark, sf_dir, queries):
    assert P.uses_take_ordered(queries["q_sort_limit"](spark, sf_dir))
    assert P.uses_take_ordered(queries["q_join3_topk"](spark, sf_dir))


def test_whole_stage_codegen_on_hot_paths(spark, sf_dir, queries):
    for name in ("q_pricing_summary", "q_filter_agg", "q_wordcount"):
        assert P.has_whole_stage_codegen(queries[name](spark, sf_dir)), name


def test_sessionize_single_shuffle(spark, sf_dir, queries):
    # One hash-partitioning exchange on user_id; lag + running sum reuse it.
    assert P.count_exchanges(queries["q_sessionize"](spark, sf_dir)) <= 1


def test_kmeans_assign_no_fact_shuffle(spark, sf_dir, queries):
    # Centroids are broadcast; the embeddings side must not shuffle for the
    # assignment itself (exchanges only inside the tiny centroid aggregate).
    plan = P.formatted_plan(queries["q_kmeans_assign"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_decontaminate_broadcasts_probe_side(spark, sf_dir, queries):
    # The probe n-gram set must be the broadcast side — the corpus is never
    # shuffled for the membership test.
    plan = P.formatted_plan(queries["q_decontaminate"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "BroadcastHashJoin" in plan


def test_repetition_filter_partial_aggregates(spark, sf_dir, queries):
    # Both aggregates must be partial+final hash aggregates (map-side
    # combine) — shuffled bytes bounded by distinct bigrams.
    plan = P.formatted_plan(queries["q_repetition_filter"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 4  # 2 aggs x partial+final


def test_ngram_jaccard_compound_equijoin_key(spark, sf_dir, queries):
    # The size band must be part of the EQUI-join key (it spreads a hot
    # block's shuffle partitions), not a post-join filter.
    plan = P.formatted_plan(queries["q_dedup_ngram_jaccard"](spark, sf_dir))
    import re
    m = re.search(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin).*", plan)
    assert m is not None
    # Join keys line lists both block and band on each side.
    keys = re.findall(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
    assert any("block" in k and "band" in k for k in keys), keys


def test_pii_scrub_no_shuffle(spark, sf_dir, queries):
    # Pure per-row regex work: the plan must contain no exchange at all.
    assert P.count_exchanges(queries["q_pii_scrub"](spark, sf_dir)) == 0


def test_anomaly_zscore_broadcasts_model(spark, sf_dir, queries):
    # The O(types) moment model is broadcast back onto the scan; the fact
    # table must not shuffle for the flagging join.
    plan = P.formatted_plan(queries["q_anomaly_zscore"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_cooccur_pairs_join_copartitioned(spark, sf_dir, queries):
    # Pair generation must be an EQUI-join keyed on doc_id (co-partitioned
    # self join; broadcast-hash at fixture scale is fine), never a
    # cartesian product over the corpus. The only nested-loop allowed is
    # the intentional 1-row crossJoin(broadcast(n_docs)).
    import re

    plan = P.formatted_plan(queries["q_cooccur_pmi"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    keys = re.findall(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
    assert any("doc_id" in k for k in keys), keys


def test_cov_matrix_single_row_aggregate(spark, sf_dir, queries):
    # One global aggregate: one partial+final pair around a single 1-row
    # exchange — no join, no second shuffle.
    plan = P.formatted_plan(queries["q_cov_matrix"](spark, sf_dir))
    assert "Join" not in plan
    assert P.count_exchanges(queries["q_cov_matrix"](spark, sf_dir)) == 1


def test_markov_chain_single_user_shuffle(spark, sf_dir, queries):
    # Lag window + transition aggregate: the events scan shuffles once on
    # user_id; the per-prev totals come back as a broadcast join.
    plan = P.formatted_plan(queries["q_markov_chain"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_ema_single_user_shuffle(spark, sf_dir, queries):
    # The fold happens inside one user_id aggregate: exactly one exchange.
    assert P.count_exchanges(queries["q_ema"](spark, sf_dir)) <= 1


def test_ab_test_single_aggregate_no_join(spark, sf_dir, queries):
    # Welch sufficient statistics in ONE conditional aggregate: one
    # partial+final pair around a 1-row exchange — no join, no user rollup.
    plan = P.formatted_plan(queries["q_ab_test"](spark, sf_dir))
    assert "Join" not in plan
    assert P.count_exchanges(queries["q_ab_test"](spark, sf_dir)) == 1


def test_chi2_marginal_joins_broadcast(spark, sf_dir, queries):
    # Marginals/grand total are O(cells) frames joined back by broadcast;
    # the fact table shuffles only for the contingency aggregate.
    plan = P.formatted_plan(queries["q_chi2"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_outlier_iqr_fences_broadcast(spark, sf_dir, queries):
    # The O(types) fence model is broadcast back onto the scan, exactly
    # like q_anomaly_zscore: the fact table never shuffles for the flag.
    plan = P.formatted_plan(queries["q_outlier_iqr"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_ks_test_window_input_is_distinct_values(spark, sf_dir, queries):
    # The cumulative window must run over the per-distinct-value aggregate
    # (bounded domain), not the raw events — exchanges: value groupBy +
    # the single-partition window + 1-row rollup.
    plan = P.formatted_plan(queries["q_ks_test"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2  # partial+final on value


def test_shard_assign_scan_side_no_join(spark, sf_dir, queries):
    # Shard id is computed on the scan; one 16-key aggregate, no join.
    plan = P.formatted_plan(queries["q_shard_assign"](spark, sf_dir))
    assert "Join" not in plan


def test_vocab_coverage_broadcast_membership(spark, sf_dir, queries):
    # The top-k vocabulary joins back as a broadcast membership table —
    # the corpus-token frame is never shuffled for the OOV flag.
    plan = P.formatted_plan(queries["q_vocab_coverage"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_banded_equijoin(spark, sf_dir, queries):
    # Candidate generation must be an EQUI-join on the length-band probe
    # key — never a cartesian product over distinct names.
    import re

    plan = P.formatted_plan(queries["q_fuzzy_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    keys = re.findall(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
    assert any("g" in k for k in keys), keys


def test_seq_pack_single_source_shuffle(spark, sf_dir, queries):
    # Cumulative offsets inside one source-partitioned window; the
    # aggregate reuses the same partitioning — at most the window exchange
    # plus the final (source, win) aggregate exchange.
    assert P.count_exchanges(queries["q_seq_pack"](spark, sf_dir)) <= 2


def test_topk_terms_doc_partitioned_window(spark, sf_dir, queries):
    # The rank window is partitioned by doc_id (parallel), not a global
    # sort; N joins back as a 1-row broadcast.
    plan = P.formatted_plan(queries["q_topk_terms"](spark, sf_dir))
    assert "BroadcastExchange" in plan


def test_keyed_layout_elides_group_and_window_exchanges(spark, sf_dir):
    """The CACHE_KEYS claim (sources/catalog.py): hashpartitioning(k)
    satisfies any grouping/window clustering whose key SET contains k, so
    a frame keyed by user_id adds ZERO exchanges for the per-(type, user)
    pre-aggregate, the two-level rollup's FIRST hop, and a per-user
    window — only the keying repartition itself shuffles. This is the
    mechanism behind the round-4 bench drop and the bucketed-storage
    story at 100 TB."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    ev = load_tables(spark, sf_dir).events.repartition(8, "user_id")

    pre_agg = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    assert P.count_exchanges(pre_agg) == 1  # the repartition, nothing else

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(w))
    assert P.count_exchanges(lagged) == 1

    # Control: the same aggregate on an UNKEYED frame needs its own shuffle.
    ev_rr = load_tables(spark, sf_dir).events.repartition(8)
    control = ev_rr.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    assert P.count_exchanges(control) == 2


def test_rolling_median_single_user_shuffle(spark, sf_dir, queries):
    # Frame-capable percentile over a per-user window: exactly one
    # user_id exchange, no join anywhere.
    plan = P.formatted_plan(queries["q_rolling_median"](spark, sf_dir))
    assert "Join" not in plan
    assert P.count_exchanges(queries["q_rolling_median"](spark, sf_dir)) <= 1


def test_sim_recall_brute_side_broadcasts_queries(spark, sf_dir, queries):
    # Ground truth = broadcast(query sample) x corpus: the corpus must not
    # shuffle for the brute scoring; broadcasts carry the query side.
    plan = P.formatted_plan(queries["q_sim_recall"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_common_neighbors_no_cartesian(spark, sf_dir, queries):
    # Wedge generation is an equi-join on the shared neighbor, candidate
    # filtering an equi-anti-join — a cartesian product would be the
    # all-pairs scale bug this operator exists to avoid.
    plan = P.formatted_plan(queries["q_common_neighbors"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_mannwhitney_window_input_is_distinct_values(spark, sf_dir, queries):
    # The cumulative window runs over the per-distinct-value frame (the
    # q_ks_test envelope), after a value-keyed aggregate — never over raw
    # events.
    plan = P.formatted_plan(queries["q_mannwhitney"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan


def test_headline_exchange_budget_snapshot(spark, sf_dir, queries):
    """Plan-shape regression guard for the bench set (VERDICT r4 item 9):
    every headline query's shuffle-exchange count is snapshot here so a
    future rewrite cannot silently re-add a stage barrier. The budgets are
    the MEASURED counts of the round-5 plans (bench tier: the two-level
    aggregations collapse to one exchange via pre_partition_small_tier;
    q_kmeans_assign's 3 are inside the k-row centroid aggregate, not on
    the embeddings side).

    r15: q_knn/q_kmeans_assign gained ONE RoundRobin exchange each — the
    DELIBERATE joins.py::fan_out rescue of the 1-partition single-file
    scan feeding their pairwise kernels (this uncached pytest session
    triggers it; the bench's 16-partition cached inputs do not, so the
    bench-tier plans keep the old counts). A rescue repartition of the
    narrow streamed side is not a stage-barrier regression; any OTHER
    new exchange still trips this snapshot."""
    budget = {
        "q_pricing_summary": 1,
        "q_join3_topk": 1,
        "q_join5_region": 1,
        "q_filter_agg": 1,
        "q_window_rank": 1,
        "q_events_tumbling": 1,
        "q_distinct_users": 1,
        "q_wordcount": 1,
        "q_dedup_exact": 1,
        "q_sessionize": 1,
        "q_knn": 2,
        "q_kmeans_assign": 4,
    }
    over = {}
    for name, allowed in budget.items():
        got = P.count_exchanges(queries[name](spark, sf_dir))
        if got > allowed:
            over[name] = (got, allowed)
    assert not over, f"exchange budget exceeded (got, allowed): {over}"


def test_tpch_semi_reductions_broadcast(spark, sf_dir, queries):
    """VERDICT r5 item 8: the round-5 TPC-H subquery rewrites must probe
    broadcast hash tables on the fact side — the lineitem scan never
    shuffles for a dim or a subquery-derived relation at the smoke tier
    (above the size gates the same plans go declarative for AQE)."""
    expected_min_broadcasts = {
        "q_returned_items": 1,   # customer⋈nation⋈orders dims
        "q_volume_shipping": 2,  # supplier-nation + customer-orders-nation
        "q_market_share": 3,     # econ parts + asia orders + supplier nation
        "q_top_supplier": 2,     # max-revenue scalar + supplier dim
        "q_promo_revenue": 1,    # part
        "q_small_qty_revenue": 2,  # brand parts + per-part thresholds
        "q_large_orders": 1,     # filtered aggregate of big orders
        "q_disjunctive_pred": 1,  # part
    }
    for name, want in expected_min_broadcasts.items():
        got = P.count_broadcast_joins(queries[name](spark, sf_dir))
        assert got >= want, f"{name}: {got} broadcast joins < {want}"


# ---- round-6 deferred-window additions: the scale claims in their
# docstrings, asserted against the actual physical plans.


def test_jl_project_zero_shuffle(spark, sf_dir, queries):
    # A pure per-row projection the scan carries: NO exchange at all.
    assert P.count_exchanges(queries["q_jl_project"](spark, sf_dir)) == 0


def test_cm_cells_single_aggregate_shuffle(spark, sf_dir, queries):
    # Sketch build = one posexplode + one (row, col) aggregate: exactly
    # one shuffle regardless of input size.
    assert P.count_exchanges(queries["q_cm_cells"](spark, sf_dir)) == 1


def test_hmm_score_single_user_shuffle(spark, sf_dir, queries):
    # ONE groupBy(user) exchange; the forward fold is a narrow map stage.
    assert P.count_exchanges(queries["q_hmm_score"](spark, sf_dir)) <= 1


def test_rendezvous_no_explode_no_join(spark, sf_dir, queries):
    # argmax over a literal struct array per row + one bounded aggregate:
    # one exchange, no join operator in the plan.
    df = queries["q_rendezvous"](spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "Join" not in plan
    assert P.count_exchanges(df) == 1


def test_dedup_snm_windows_stay_in_blocks(spark, sf_dir, queries):
    # The SNM sort must be per-block (partitioned window), never a global
    # single-partition sort of the corpus.
    plan = P.formatted_plan(queries["q_dedup_snm"](spark, sf_dir))
    assert "SinglePartition" not in plan


def test_modularity_broadcasts_labels(spark, sf_dir, queries):
    # Brand labels join broadcast; only the community rollup shuffles.
    plan = P.formatted_plan(queries["q_modularity"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_isotonic_bins_bounded_frame_joins(spark, sf_dir, queries):
    # The O(bins³) minimax runs on ≤20-row frames — every join in the
    # plan must be a broadcast, never a shuffled join of raw rows.
    plan = P.formatted_plan(queries["q_isotonic_bins"](spark, sf_dir))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def _join_conditions(plan: str) -> list[str]:
    return [
        line.strip() for line in plan.splitlines()
        if line.strip().startswith("Join condition:")
    ]


def test_dedup_embedding_pushdown_barrier_holds(spark, sf_dir, queries):
    """ADVICE r15: the when(spark_partition_id() >= 0, cos) barrier keeps
    the cosine threshold OUT of the nested-loop join condition (a join
    condition cannot codegen-split, so the O(n²) loop would run
    interpreted — the 80 s r15 regression). Pin the plan shape so a
    Catalyst change that re-folds the predicate fails loudly here."""
    plan = P.formatted_plan(queries["q_dedup_embedding"](spark, sf_dir))
    conds = _join_conditions(plan)
    assert conds, "expected a join in the q_dedup_embedding plan"
    for c in conds:
        # The join may keep only the cheap id ordering; the 64-term dot
        # fold (aggregate lambda) must never appear inside a condition.
        assert "aggregate(" not in c, f"heavy predicate folded into join: {c[:200]}"
    # The threshold must survive as a standalone Filter above the join.
    assert "Filter" in plan


def test_canopy_pushdown_barrier_holds(spark, sf_dir, queries):
    """Same pin for q_canopy's T1 distance filter (ml.py barrier)."""
    plan = P.formatted_plan(queries["q_canopy"](spark, sf_dir))
    for c in _join_conditions(plan):
        assert "aggregate(" not in c, f"heavy predicate folded into join: {c[:200]}"
    assert "Filter" in plan
