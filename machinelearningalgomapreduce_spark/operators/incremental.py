"""Incremental-aggregation pattern (SURVEY.md §2B tier): maintain a rolled-up
materialized view by MERGING partial aggregate states instead of
recomputing from scratch — the batch analog of a streaming state store and
the core trick behind every incremental pipeline at 100 TB (only the new
partition is scanned; the base rollup is re-aggregated, not re-derived).

The checked query proves the merge algebra is exact: base (history) and
delta (new data) are aggregated separately and their partial states merged;
the oracle is the equivalent ONE-PASS aggregate. They can only hash-match
because every merged statistic is either an integer or a DECIMAL-exact sum
(order-independent) — merging double partial sums would drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.sources.catalog import load_tables

CUTOFF = "1998-01-01"


def partial_pricing_state(lineitem: DataFrame) -> DataFrame:
    """Mergeable partial state for the pricing rollup: exact DECIMAL sums +
    counts + min/max per (returnflag, linestatus). sum/count/min/max are
    all associative-commutative, so states merge by re-aggregation."""
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


def merge_pricing_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial states into the final rollup (the
    re-aggregation an incremental refresh runs on [old state ∪ delta
    state]). Derived columns (avg) come from the merged sums only."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    out = merged.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_qty").alias("sum_qty"),
        F.sum("sum_price").alias("sum_price"),
        F.min("min_ship").alias("min_ship"),
        F.max("max_ship").alias("max_ship"),
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("sum_price").cast("double"), 2).alias("sum_price"),
        # Divide as doubles: decimal-division result scales differ between
        # engines; the exact sum casts to double identically (< 2^53).
        F.round(F.col("sum_price").cast("double") / F.col("n_rows"), 6).alias("avg_price"),
        "min_ship",
        "max_ship",
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: the pricing rollup computed
    as merge(partial(history), partial(delta)) where the delta is every
    lineitem shipped on/after the cutoff. The oracle recomputes the same
    rollup in ONE pass — hash-matching proves the merge algebra is exact,
    i.e. the incremental refresh can replace the full recompute.

    Scale shape: at 100 TB the history side is the STORED O(groups) state
    (never rescanned); here both sides derive from the fixture so the
    oracle can check the algebra end-to-end. Each partial aggregate is one
    map-side-combined shuffle; the merge shuffles O(groups) rows."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit(CUTOFF).cast("timestamp")
    base = partial_pricing_state(t.lineitem.filter(F.col("l_shipdate") < cutoff))
    delta = partial_pricing_state(t.lineitem.filter(F.col("l_shipdate") >= cutoff))
    return merge_pricing_states(base, delta)


DELTA_MOD = 10  # every DELTA_MOD-th doc plays the "newly arrived batch"


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup admission: a new document batch checked against
    the EXISTING corpus fingerprint index plus itself — the decision an
    ingest pipeline makes per batch (admit / drop-as-known / drop-as
    -within-batch-dup) without ever rescanning the corpus.

    Base = docs with id % DELTA_MOD ≠ 0 (the standing index), delta = the
    rest (the batch). Output per delta doc: the base survivor it collides
    with (if any), whether it duplicates the base or an earlier batch
    doc, and the final admit flag.

    Scale shape: the base index is the STORED O(distinct-hash) state
    (content_hash → min doc_id), bucketed by hash at 100 TB so the probe
    join is co-located; the delta-only window is batch-sized. The corpus
    is never rescanned — exactly the q_incremental_agg argument applied
    to dedup."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    hashed = t.documents.select("doc_id", F.md5("text").alias("content_hash"))
    is_delta = F.pmod(F.col("doc_id"), F.lit(DELTA_MOD)) == 0
    index = (
        hashed.filter(~is_delta)
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("base_keep"))
    )
    w = W.partitionBy("content_hash").orderBy("doc_id")
    return (
        hashed.filter(is_delta)
        .join(index, "content_hash", "left")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "content_hash",
            "base_keep",
            F.col("base_keep").isNotNull().alias("dup_of_base"),
            (F.col("rk") > 1).alias("dup_within_delta"),
            (F.col("base_keep").isNull() & (F.col("rk") == 1)).alias("admit"),
        )
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Slowly-Changing-Dimension type 2 merge (warehouse incremental tier).

    ``dim`` carries (key, *tracked, valid_from, valid_to) with
    valid_to IS NULL marking the open version; ``updates`` carries
    (key, *tracked, ts) — at most one row per key (enforce upstream with
    max_by(ts) if needed). Semantics:

    - open row whose tracked columns DIFFER from the update AND whose
      valid_from predates the update ts → closed (valid_to = update ts)
      and a new open version inserted;
    - identical update → no-op (re-applying a batch is idempotent);
    - STALE update (ts ≤ the open row's valid_from — out-of-order
      delivery) → ignored: the newer version stays open and no inverted
      validity interval can be produced;
    - brand-new key → new open version;
    - historical (already-closed) rows pass through untouched.

    Scale shape: one hash join dim⋈updates on the key plus unions — the
    exact shape a MERGE INTO compiles to, no window functions, no driver
    state. NULL-safe column comparison via eqNullSafe.
    """
    upd = updates.select(
        F.col(key), *[F.col(c) for c in tracked], F.col(ts_col).alias("__ts")
    )
    is_open = F.col("valid_to").isNull()
    open_rows = dim.filter(is_open)
    closed_rows = dim.filter(~is_open)
    u = upd.select(
        F.col(key).alias("__k"),
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
        "__ts",
    )
    joined = open_rows.join(u, F.col(key) == F.col("__k"), "left")
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    fresh = F.col("__ts") > F.col("valid_from")
    changed = F.col("__k").isNotNull() & ~same & fresh
    dim_cols = [key, *tracked, "valid_from", "valid_to"]
    # Open rows: close the fresh-changed ones, keep the rest verbatim
    # (identical OR stale updates leave the open row untouched).
    kept_open = joined.select(
        *[F.col(c) for c in [key, *tracked, "valid_from"]],
        F.when(changed, F.col("__ts")).otherwise(F.col("valid_to")).alias("valid_to"),
    )
    # New versions: updates that fresh-changed an open row or created a
    # key. Blocked = keys whose open row absorbs the update (identical)
    # or outruns it (stale).
    blocked = u.join(
        open_rows.join(u, F.col(key) == F.col("__k"), "inner")
        .filter(same | ~fresh)
        .select("__k"),
        "__k",
        "left_semi",
    )
    new_versions = u.join(blocked, "__k", "left_anti").select(
        F.col("__k").alias(key),
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
        F.col("__ts").alias("valid_from"),
        F.lit(None).cast(open_rows.schema["valid_to"].dataType).alias("valid_to"),
    )
    return (
        closed_rows.select(*dim_cols)
        .unionByName(kept_open.select(*dim_cols))
        .unionByName(new_versions.select(*dim_cols))
    )


QUERIES = {
    "q_incremental_agg": q_incremental_agg,
    "q_incremental_dedup": q_incremental_dedup,
}

ORACLES = {
    "q_incremental_dedup": f"""
        WITH hashed AS (
            SELECT doc_id, md5(text) AS content_hash FROM documents
        ), idx AS (
            SELECT content_hash, min(doc_id) AS base_keep
            FROM hashed WHERE doc_id % {DELTA_MOD} <> 0
            GROUP BY content_hash
        ), delta AS (
            SELECT d.doc_id, d.content_hash, i.base_keep,
                   row_number() OVER (PARTITION BY d.content_hash
                                      ORDER BY d.doc_id) AS rk
            FROM (SELECT * FROM hashed WHERE doc_id % {DELTA_MOD} = 0) d
            LEFT JOIN idx i USING (content_hash)
        )
        SELECT doc_id, content_hash, base_keep,
               base_keep IS NOT NULL AS dup_of_base,
               rk > 1 AS dup_within_delta,
               base_keep IS NULL AND rk = 1 AS admit
        FROM delta
    """,
    "q_incremental_agg": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                          AS DOUBLE), 2) AS sum_price,
               round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                          AS DOUBLE) / count(*), 6) AS avg_price,
               min(l_shipdate) AS min_ship,
               max(l_shipdate) AS max_ship
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
}
