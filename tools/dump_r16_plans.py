"""Dump .explain('formatted') for round-16 touched queries into plans/r16/.

Usage: python tools/dump_r16_plans.py <suffix> [--bench] [query ...]

Default mode captures plans under the ENGINE-DEFAULT session (AQE on,
uncached scans — the conditions tools/fleet_time.py measures and the r16
optimizations target); ``--bench`` switches to the bench conf + cached
tables (AQE off, 4 partitions) for headline queries, matching
tools/dump_r15_plans.py. Plans are captured AFTER one executed noop write
so AQE final plans and codegen ids are visible (PLANS.md methodology).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q_triangle_count", "q_edge_support", "q_degree_dist", "q_pagerank",
    "q_dedup_minhash", "q_dedup_ngram_jaccard", "q_dedup_containment",
    "q_dedup_clusters", "q_repetition_filter", "q_ngram_lm", "q_sim_ann",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    bench_mode = "--bench" in args
    if bench_mode:
        args.remove("--bench")
    suffix = args[0]
    names = args[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from machinelearningalgomapreduce_spark import registry
    from machinelearningalgomapreduce_spark.plans import inspect as P
    from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark

    spark = get_spark(app_name="dump_r16_plans")
    ensure_query_conf(spark)
    if bench_mode:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions",
                       os.environ.get("SPARK_BENCH_PARTITIONS", "4"))
        from machinelearningalgomapreduce_spark.sources.catalog import load_tables

        n_cache = int(os.environ.get("SPARK_BENCH_CACHE_PARTITIONS", "16"))
        tables = load_tables(spark, sf_dir, cached=True, cache_partitions=n_cache)
        for tname in tables.names():
            tables[tname].count()
    qs = registry.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r16")
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
