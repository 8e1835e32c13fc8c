"""Invariant + plan-shape tests for the round-8 TPC-H adaptations
(operators/tpch.py: Q2/Q11/Q12/Q16/Q20 shapes). The bit-exact oracle
differential lives in tools/check.py; these assert semantics a hash
comparison can't express, plus the scale-posture plan shapes."""

from __future__ import annotations

import pyspark.sql.functions as F

from machinelearningalgomapreduce_spark.operators import tpch
from machinelearningalgomapreduce_spark.plans import inspect as P
from machinelearningalgomapreduce_spark.sources.catalog import load_tables


# ------------------------------------------------------------- semantics


def test_min_cost_supplier_attains_the_per_part_minimum(spark, sf_dir):
    rows = tpch.q_min_cost_supplier(spark, sf_dir).collect()
    assert rows, "fixture has STANDARD parts with size <= 5"
    t = load_tables(spark, sf_dir)
    # Recompute each part's true minimum unit cost over EUROPE suppliers
    # and require every output row to sit exactly at it.
    unit = F.floor(F.lit(100.0) * F.col("l_extendedprice") / F.col("l_quantity")).cast("bigint")
    eur = (
        t.supplier.join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t.region.filter(F.col("r_name") == "EUROPE"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    best = {
        r["l_partkey"]: r["m"]
        for r in t.lineitem.join(eur, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey").agg(F.min(unit).alias("m")).collect()
    }
    for r in rows:
        assert r.cost_cents == best[r.p_partkey]
    bals = [(-r.s_acctbal, r.n_name, r.s_name, r.p_partkey) for r in rows]
    assert bals == sorted(bals)


def test_important_parts_clear_the_global_share_bar(spark, sf_dir):
    rows = tpch.q_important_parts(spark, sf_dir).collect()
    assert rows, "some part must exceed 0.1% of NATION_15 revenue"
    t = load_tables(spark, sf_dir)
    cents = F.floor(
        F.lit(100.0) * F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("bigint")
    nat = (
        t.supplier.join(t.nation.filter(F.col("n_name") == "NATION_15"),
                        F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    total = (
        t.lineitem.join(nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .agg(F.sum(cents)).collect()[0][0]
    )
    for r in rows:
        assert r.value_cents * 1000 > total
    vals = [(-r.value_cents, r.p_partkey) for r in rows]
    assert vals == sorted(vals)


def test_shipmode_priority_partitions_the_late_lines(spark, sf_dir):
    rows = tpch.q_shipmode_priority(spark, sf_dir).collect()
    assert rows, "1996 has >90-day ship lags"
    t = load_tables(spark, sf_dir)
    late_total = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.datediff(F.col("l_shipdate").cast("date"),
                           F.col("o_orderdate").cast("date")) > 90)
        .count()
    )
    # high + low partitions the late-line set exactly (a CASE-sum pair
    # can silently double- or zero-count; the total pins it).
    assert sum(r.high_line_count + r.low_line_count for r in rows) == late_total
    assert all(r.high_line_count >= 0 and r.low_line_count >= 0 for r in rows)
    flags = [r.l_returnflag for r in rows]
    assert flags == sorted(flags)


def test_supplier_cnt_never_counts_a_complainer(spark, sf_dir):
    rows = tpch.q_supplier_cnt(spark, sf_dir).collect()
    assert rows
    t = load_tables(spark, sf_dir)
    n_neg = t.supplier.filter(F.col("s_acctbal") < 0.0).count()
    n_supp = t.supplier.count()
    # Every class's count is bounded by the non-excluded supplier population.
    assert all(0 < r.supplier_cnt <= n_supp - n_neg for r in rows)
    keys = [(-r.supplier_cnt, r.p_brand, r.p_type, r.p_size) for r in rows]
    assert keys == sorted(keys)
    assert all(r.p_brand != "Brand#45" and r.p_type != "PROMO" for r in rows)


def test_dominant_suppliers_exceed_twice_fair_share(spark, sf_dir):
    rows = tpch.q_dominant_suppliers(spark, sf_dir).collect()
    assert rows, "fixture has dominant bolt shippers at every tier"
    t = load_tables(spark, sf_dir)
    qty = F.col("l_quantity").cast("bigint")
    per_ps = (
        t.lineitem.join(
            t.part.filter(F.col("p_name").like("%bolt%")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey").agg(F.sum(qty).alias("q")).collect()
    )
    totals: dict[int, tuple[int, int]] = {}
    for r in per_ps:
        tq, n = totals.get(r["l_partkey"], (0, 0))
        totals[r["l_partkey"]] = (tq + r["q"], n + 1)
    dominant_keys = {
        r["l_suppkey"]
        for r in per_ps
        if totals[r["l_partkey"]][1] >= 2
        and r["q"] * totals[r["l_partkey"]][1] > 2 * totals[r["l_partkey"]][0]
    }
    names = {
        r["s_name"]
        for r in t.supplier.filter(F.col("s_suppkey").isin(list(dominant_keys)))
        .select("s_name").collect()
    }
    assert {r.s_name for r in rows} == names
    out_names = [r.s_name for r in rows]
    assert out_names == sorted(out_names)


# ------------------------------------------------------------ plan shape


def test_round8_fact_probes_broadcast_their_dims(spark, sf_dir):
    for q in (tpch.q_min_cost_supplier, tpch.q_important_parts,
              tpch.q_shipmode_priority, tpch.q_supplier_cnt,
              tpch.q_dominant_suppliers):
        df = q(spark, sf_dir)
        assert P.count_broadcast_joins(df) >= 1, q.__name__
        assert "CartesianProduct" not in P.formatted_plan(df), q.__name__


def test_round8_topk_queries_plan_take_ordered(spark, sf_dir):
    assert P.uses_take_ordered(tpch.q_min_cost_supplier(spark, sf_dir))
    assert P.uses_take_ordered(tpch.q_important_parts(spark, sf_dir))


def test_round8_exchange_budgets(spark, sf_dir):
    # Measured shapes at the fixture tier; a regression that re-adds a
    # stage barrier (e.g. losing a broadcast to a sort-merge join) trips
    # these budgets. The static counts include the derived-aggregate
    # branch's copy of the shared subtree (cost→best, per_ps→per_part,
    # per_part→total); test_round8_shared_subtrees_reuse_exchanges below
    # proves that copy resolves to a ReusedExchange at runtime, so the
    # fact table is scanned once.
    budget = {
        "q_min_cost_supplier": 3,   # cost agg + per-part-min branch copy
        "q_important_parts": 3,     # per-part agg + 1-row total branch copy
        "q_shipmode_priority": 1,   # broadcast orders probe + tiny agg
        "q_supplier_cnt": 3,        # bridge dedup + class agg + count-distinct expand
        "q_dominant_suppliers": 4,  # per-(part,supp) agg + rollup copy + dedup
    }
    over = {}
    for name, allowed in budget.items():
        got = P.count_exchanges(tpch.QUERIES[name](spark, sf_dir))
        if got > allowed:
            over[name] = (got, allowed)
    assert not over, f"exchange budget exceeded (got, allowed): {over}"


def test_round8_shared_subtrees_reuse_exchanges(spark, sf_dir):
    # The Q2/Q11/Q20 decorrelations derive a second aggregate from the
    # first's output; at 100 TB the plan is only honest if that branch
    # reuses the materialized exchange instead of re-scanning the fact
    # table. Runtime exchange reuse (spark.sql.exchange.reuse) resolves
    # the duplicate subtree — the same posture q_late_shippers pins.
    for q in (tpch.q_min_cost_supplier, tpch.q_important_parts,
              tpch.q_dominant_suppliers):
        assert "ReusedExchange" in P.executed_plan(q(spark, sf_dir)), q.__name__


def test_round8_pushdown_reaches_the_scans(spark, sf_dir):
    # Q12's ship-date window is a scan-column conjunct; Q16/Q2's part
    # attribute filters push to the part scan.
    assert P.has_pushed_filters(tpch.q_shipmode_priority(spark, sf_dir))
    assert P.has_pushed_filters(tpch.q_supplier_cnt(spark, sf_dir))
    assert P.has_pushed_filters(tpch.q_min_cost_supplier(spark, sf_dir))
