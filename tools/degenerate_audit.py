"""Degenerate-input crash audit: every registered query against a
single-cohort fixture (events = clicks only, all other tables intact).

Spark 4 runs ANSI mode by default, so an unguarded division whose
denominator collapses on degenerate data (one cohort absent, one group,
zero variance) THROWS DIVIDE_BY_ZERO instead of returning NULL — and
DuckDB would return inf on the same input, so the engines diverge
exactly when a production monitor is looking at broken data. Round 9
closed every such site found by this audit (the two-sample family +
q_anova; tests/test_round9_ops.py pins cross-engine NULL parity for
the family). Run per round: a NEW query with an unguarded division
shows up here before the degenerate data shows up in production.

Usage: python tools/degenerate_audit.py   (exit 1 on any crash)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from machinelearningalgomapreduce_spark import registry
    from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark
    from machinelearningalgomapreduce_spark.sources.catalog import TABLES, load_tables

    spark = get_spark(app_name="degenerate_audit")
    ensure_query_conf(spark)
    src = load_tables(spark, "/root/testdata/sf0.001")
    out = tempfile.mkdtemp(prefix="one_cohort_")
    for name in TABLES:
        df = src[name]
        if name == "events":
            df = df.filter("event_type = 'click'")
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    crashes = []
    for name, fn in registry.queries().items():
        try:
            fn(spark, out).collect()
        except Exception as exc:  # noqa: BLE001
            kind = (
                "DIVIDE_BY_ZERO"
                if "DIVIDE_BY_ZERO" in str(exc)
                else type(exc).__name__
            )
            crashes.append((name, kind, str(exc).splitlines()[0][:120]))
            print(f"CRASH {name}: {kind}")
    print(f"\n{len(crashes)} crashes / {len(registry.queries())} queries")
    sys.exit(1 if crashes else 0)


if __name__ == "__main__":
    main()
