"""Dump .explain('formatted') for round-15 touched queries into plans/r15/.

Usage: python tools/dump_r15_plans.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt for each query (default: the r15
optimization set). Plans are captured AFTER one executed noop write so AQE
final plans and codegen ids are visible (PLANS.md methodology), at the
bench tier and bench conf so they match what bench.py times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q_pricing_summary", "q_join3_topk", "q_join5_region", "q_filter_agg",
    "q_window_rank", "q_events_tumbling", "q_distinct_users", "q_wordcount",
    "q_dedup_exact", "q_sessionize", "q_knn", "q_kmeans_assign",
    "q_sim_topk", "q_sim_ann",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from machinelearningalgomapreduce_spark import registry
    from machinelearningalgomapreduce_spark.plans import inspect as P
    from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark

    spark = get_spark(app_name="dump_r15_plans")
    ensure_query_conf(spark)
    # bench conf (bench.py): AQE off + few partitions at the tiny tier so the
    # captured plan is the one the driver's bench actually executes
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions",
                   os.environ.get("SPARK_BENCH_PARTITIONS", "4"))
    # bench.py also pre-caches the base tables hash-partitioned on their
    # CACHE_KEYS — several headline plans lose an Exchange only under that
    # layout, so plan capture must see the same tables the bench times
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    n_cache = int(os.environ.get("SPARK_BENCH_CACHE_PARTITIONS", "16"))
    tables = load_tables(spark, sf_dir, cached=True, cache_partitions=n_cache)
    for tname in tables.names():
        tables[tname].count()
    qs = registry.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # execute → final plan
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(P.formatted_plan(df))
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
