"""One-off stage decomposition of q_join3_topk at the bench tier.

Times, under the exact bench session conf, interleaved round-robin so
every variant samples the same host weather:
  A. the dims sub-plan alone (orders(date) left-semi customer(BUILDING))
  B. dims + an explicit broadcast build (what the probe stage waits on)
  C. the full query (registry plan: broadcast dims → fact probe → agg →
     TakeOrdered)
  D. pre-agg-then-probe: revenue per l_orderkey aggregated BEFORE the
     dims join (zero-exchange on the co-partitioned cache)
  E. single-job one-sided SHJ: dims shuffled onto the fact's existing
     l_orderkey layout instead of broadcast (no driver collect)
so C - B isolates the fact-probe+agg+topk stage and B - A the broadcast
collect/build. Diagnostic tool, not part of the bench contract.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark import registry
from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark
from machinelearningalgomapreduce_spark.sources.catalog import load_tables

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile_join3", extra_conf={
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.broadcast.compress": "false",
    "spark.rdd.compress": "false",
    "spark.locality.wait": "0",
})
ensure_query_conf(spark)
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.conf.set("spark.sql.shuffle.partitions", "4")

t = load_tables(spark, sf_dir, cached=True, cache_partitions=16)
for name in t.names():
    t[name].count()

cutoff = F.lit("1998-06-01").cast("timestamp")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def best(fn, n=5, warm=2):
    for _ in range(warm):
        fn()
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return min(out) * 1e3


def interleaved(variants: dict, n=9, warm=2):
    """Round-robin the variants so every one samples the same host weather;
    report per-variant best and median."""
    for fn in variants.values():
        for _ in range(warm):
            fn()
    samples = {k: [] for k in variants}
    for _ in range(n):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            samples[k].append(time.perf_counter() - t0)
    out = {}
    for k, ts in samples.items():
        ts = sorted(ts)
        out[k] = (ts[0] * 1e3, ts[len(ts) // 2] * 1e3)
    return out


def dims_df():
    cust_f = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey").hint("shuffle_hash")
    return (t.orders.filter(F.col("o_orderdate") < cutoff)
            .join(cust_f, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
            .select("o_orderkey", "o_orderdate", "o_orderpriority"))


q = registry.queries()["q_join3_topk"]

# D: pre-reduced fact — aggregate revenue per l_orderkey FIRST (zero-exchange,
# co-partitioned on l_orderkey), then probe dims.
def pre_agg():
    fact = (t.lineitem.filter(F.col("l_shipdate") > cutoff)
            .groupBy("l_orderkey")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))
    return (fact.join(F.broadcast(dims_df()), F.col("l_orderkey") == F.col("o_orderkey"))
            .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey").limit(10))


# E: single-job SHJ — dims shuffles to the fact's existing l_orderkey
# layout (29k rows move, fact side zero-exchange), no driver collect.
def shj_dims():
    fact = t.lineitem.filter(F.col("l_shipdate") > cutoff)
    rev = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    ).alias("revenue")
    joined = fact.join(dims_df().hint("shuffle_hash"),
                       F.col("l_orderkey") == F.col("o_orderkey"))
    return (joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(rev)
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey").limit(10))


res = interleaved({
    "floor_1task": lambda: noop(t.region.select("r_regionkey")),
    "floor_16task": lambda: noop(t.lineitem.select("l_orderkey").limit(0)),
    "A_dims_only": lambda: noop(dims_df()),
    "B_dims_bcast": lambda: noop(t.lineitem.limit(0).select("l_orderkey").join(
        F.broadcast(dims_df()), F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi")),
    "C_full_query": lambda: noop(q(spark, sf_dir)),
    "D_preagg_probe": lambda: noop(pre_agg()),
    "E_shj_dims": lambda: noop(shj_dims()),
})
for k, (lo, med) in res.items():
    print(f"{k:16s} best={lo:7.1f} ms  median={med:7.1f} ms")
cb = res["C_full_query"][0] - res["B_dims_bcast"][0]
ba = res["B_dims_bcast"][0] - res["A_dims_only"][0]
print(f"C-B fact probe+agg+topk (best)  {cb:7.1f} ms")
print(f"B-A broadcast collect   (best)  {ba:7.1f} ms")
