"""Pipeline counters via `Dataset.observe` — the Spark-native form of the
reference's MapReduce Counters (SURVEY.md §2A): metrics accumulate on the
executors DURING the pass (zero extra scans, zero extra shuffles) and
surface on the driver after the action, exactly like counters surfaced
after job completion.

Use for data-quality tallies a pipeline wants "for free" alongside its
real output: row counts, null counts, basic ranges. NOT for control flow —
convergence checks stay explicit aggregates (operators/dedup.py,
operators/graph.py) because observe values are only defined after an
action ran.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_counters(
    df: DataFrame, *null_checked_cols: str
) -> tuple[DataFrame, Observation]:
    """Attach free-riding quality counters to a DataFrame pass: total rows
    plus a null tally per requested column. Returns (df, observation);
    read `observation.get` AFTER an action on the returned df.

    At 100 TB this replaces a separate COUNT pass per quality metric —
    the counters ride the scan the query was already doing."""
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("bigint")).alias(f"n_null_{c}")
        for c in null_checked_cols
    ]
    return df.observe(obs, *metrics), obs
