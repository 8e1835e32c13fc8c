"""Invariant + plan-shape tests for the round-5 classic-benchmark module
(operators/tpch.py). The bit-exact oracle differential lives in
tools/check.py; these assert semantics a hash comparison can't express,
plus the scale-posture plan shapes (broadcast semi-reductions, TakeOrdered,
no cartesian products)."""

from __future__ import annotations

import pytest

from machinelearningalgomapreduce_spark.operators import tpch
from machinelearningalgomapreduce_spark.plans import inspect as P
from machinelearningalgomapreduce_spark.sources.catalog import load_tables


# ------------------------------------------------------------- semantics


def test_custdist_accounts_for_every_customer(spark, sf_dir):
    rows = tpch.q_custdist(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    assert sum(r.custdist for r in rows) == t.customer.count()
    # Left join: customers whose only orders are urgent must land in c_count=0
    # or low buckets, but no bucket may be negative and the distribution is
    # sorted by custdist desc (ties by c_count desc).
    assert all(r.c_count >= 0 for r in rows)
    keys = [(r.custdist, r.c_count) for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_large_orders_all_clear_the_quantity_bar(spark, sf_dir):
    rows = tpch.q_large_orders(spark, sf_dir).collect()
    assert rows, "sf0.001 has 25 qualifying orders"
    assert all(r.sum_qty > 250.0 for r in rows)
    prices = [(-r.o_totalprice, r.o_orderkey) for r in rows]
    assert prices == sorted(prices)


def test_top_supplier_is_the_argmax_of_recomputed_revenue(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = tpch.q_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    t = load_tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("r"))
        .agg(F.max("r"))
        .collect()[0][0]
    )
    assert all(r.total_revenue == rev for r in rows)


def test_idle_customers_have_no_recent_order(spark, sf_dir):
    import pyspark.sql.functions as F

    out = tpch.q_idle_customers(spark, sf_dir).collect()
    assert out, "sf0.001 has 2 idle nations"
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t.customer.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal")).collect()[0][0]
    )
    recent = {
        r.o_custkey
        for r in t.orders.filter(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
        ).select("o_custkey").distinct().collect()
    }
    idle = {
        r.c_custkey
        for r in t.customer.filter(F.col("c_acctbal") > avg_bal).collect()
        if r.c_custkey not in recent
    }
    assert sum(r.numcust for r in out) == len(idle)


def test_volume_shipping_excludes_intra_nation_trade(spark, sf_dir):
    rows = tpch.q_volume_shipping(spark, sf_dir).collect()
    assert rows
    allowed = {"NATION_1", "NATION_2", "NATION_3", "NATION_4"}
    for r in rows:
        assert r.supp_nation in allowed and r.cust_nation in allowed
        assert r.supp_nation != r.cust_nation


def test_ratio_queries_are_bounded(spark, sf_dir):
    share = tpch.q_market_share(spark, sf_dir).collect()
    assert share and all(0.0 <= r.mkt_share <= 1.0 for r in share)
    promo = tpch.q_promo_revenue(spark, sf_dir).collect()
    assert len(promo) == 1 and 0.0 <= promo[0].promo_share <= 100.0


def test_small_qty_threshold_is_per_part(spark, sf_dir):
    # The decorrelated threshold must vary by part: a single global 0.2*avg
    # would be Q6, not Q17. Recompute one part's bar and check membership.
    import pyspark.sql.functions as F

    t = load_tables(spark, sf_dir)
    fact = t.lineitem.join(
        t.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey"),
        t.lineitem.l_partkey == F.col("p_partkey"),
    )
    bars = (
        fact.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("bar")).collect()
    )
    assert len({round(r.bar, 6) for r in bars}) > 1, "thresholds must differ per part"
    out = tpch.q_small_qty_revenue(spark, sf_dir).collect()
    assert len(out) == 1 and out[0].avg_yearly >= 0.0


# ------------------------------------------------------------ plan shape


def test_fact_probe_queries_broadcast_their_dims(spark, sf_dir):
    # Semi-reduction posture: the fact scan probes broadcast hash tables at
    # fixture tiers; no shuffle on the lineitem side.
    for q in (tpch.q_returned_items, tpch.q_volume_shipping, tpch.q_market_share):
        df = q(spark, sf_dir)
        assert P.count_broadcast_joins(df) >= 1, q.__name__
        assert "CartesianProduct" not in P.formatted_plan(df), q.__name__


def test_topk_queries_plan_take_ordered(spark, sf_dir):
    assert P.uses_take_ordered(tpch.q_large_orders(spark, sf_dir))
    assert P.uses_take_ordered(tpch.q_returned_items(spark, sf_dir))


def test_exchange_budgets(spark, sf_dir):
    # Measured round-5 shapes at the fixture tier; a regression that re-adds
    # a stage barrier (e.g. losing a broadcast to a sort-merge join) trips
    # these budgets.
    budget = {
        "q_custdist": 3,        # left-join shuffle + two aggregates
        "q_large_orders": 2,    # lineitem agg + broadcast-probe, TakeOrdered
        "q_promo_revenue": 1,   # broadcast part + single global agg
        "q_disjunctive_pred": 1,
        "q_returned_items": 2,  # dim chain reduce + fact agg (TakeOrdered free)
        "q_volume_shipping": 3,
        "q_market_share": 3,
        "q_idle_customers": 3,  # scalar agg + anti-join + nation agg
        "q_top_supplier": 3,
        "q_small_qty_revenue": 2,
    }
    over = {}
    for name, allowed in budget.items():
        got = P.count_exchanges(tpch.QUERIES[name](spark, sf_dir))
        if got > allowed:
            over[name] = (got, allowed)
    assert not over, f"exchange budget exceeded (got, allowed): {over}"


def test_pushdown_reaches_the_lineitem_scan(spark, sf_dir):
    # Q10's returnflag filter is a scan-column conjunct: it must appear as a
    # pushed filter, not a post-join Filter only.
    assert P.has_pushed_filters(tpch.q_returned_items(spark, sf_dir))
    assert P.has_pushed_filters(tpch.q_top_supplier(spark, sf_dir))
