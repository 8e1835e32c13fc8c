"""Relational core operators (SURVEY.md §2B).

Every query here is declarative DataFrame API — Catalyst handles predicate
pushdown, column pruning, partial aggregation (the reference's hand-written
Combiners), broadcast joins (the reference's DistributedCache map-side joins),
and join reordering. See SURVEY.md §4.1 for the idiom-by-idiom mapping.

Float-determinism policy (SURVEY.md §5.2.3):
- per-row scalar arithmetic is bit-identical across engines → no rounding;
- multi-row double aggregates are summation-order dependent → both the Spark
  query and the DuckDB oracle round to a fixed precision (money: 2, ratios: 6);
- integer-valued doubles (l_quantity) and int counts are exact → no rounding.

Scale notes (100 TB posture): filters precede joins so pushdown reaches the
Parquet scan; dimension tables (region/nation/supplier/part/customer) are
broadcast — at TPC-H-like ratios they stay O(GB) while fact tables grow;
top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject (no global
sort materialization); all aggregates are hash-based with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from machinelearningalgomapreduce_spark.functions import money
from machinelearningalgomapreduce_spark.functions.joins import (
    broadcast_if_small,
    pre_partition_small_tier,
    sf_of,
)
from machinelearningalgomapreduce_spark.sources.catalog import cache_partition_key, load_tables


def tiny_sorted(df: DataFrame, *cols) -> DataFrame:
    """Globally order a provably tiny result — an aggregate whose key domain
    is bounded by a handful of values (returnflag×linestatus ≤ 6 rows,
    nations ≤ 25) — without a range-partitioning exchange. ``orderBy`` on
    such a result plans Exchange(rangepartitioning), whose boundary SAMPLING
    pass re-executes the child: measured +65 ms per query at the bench tier
    for a 6-row sort. Coalescing to one partition and sorting within it is
    the right physical plan at EVERY scale factor, because the cardinality
    bound comes from the key domain, not the data size. Only valid when the
    sort keys are unique per row (full grouping key), so the order is total
    and deterministic."""
    return df.coalesce(1).sortWithinPartitions(*cols)


# ---------------------------------------------------------------- scan/filter

def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + projection with per-row scalar expressions.

    Column pruning: only 4 of part's 6 columns reach the scan (ReadSchema).
    """
    t = load_tables(spark, sf_dir)
    return t.part.select(
        F.col("p_partkey"),
        F.upper(F.col("p_name")).alias("name_upper"),
        (F.col("p_retailprice") * 1.1).alias("price_infl"),
        F.length("p_type").alias("type_len"),
    )


def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicates: AND/OR/IN/BETWEEN/LIKE — all pushdown-eligible."""
    t = load_tables(spark, sf_dir)
    return t.orders.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_totalprice").between(1000.0, 200000.0) | (F.col("o_custkey") < 10))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


def q_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: range + BETWEEN predicates → one global sum."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money.money_sum_2dp(
            # exact 1e-4-dollar units: price_cents · disc_pct (r15,
            # functions/money.py — the half-boundary class)
            money.units("l_extendedprice") * money.units("l_discount"),
            d=100).alias("revenue"))
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: 2-key grouped multi-aggregate.

    Catalyst plans this as partial+final HashAggregate — the reference's
    hand-written Combiner for free (SURVEY.md §2A).

    Every money/avg output is EXACT fixed-point (r15, the half-boundary
    class — functions/money.py): BIGINT units per row (cents /
    1e-4-dollars / 1e-6-dollars for price / disc_price / charge), integer
    sums, half-away-from-zero identity rounding. sum_charge uses the r15
    SPLIT-SUM wide path (wide=True, functions/money.py): two codegen'd
    BIGINT sums of (u >> 20) and (u & 0xFFFFF) recombined in DECIMAL(38,0)
    once per group — exact past the BIGINT cliff (its 1e-6-unit sum is
    ~5.7e16 at the 10x tier; BIGINT would still hold to 100x, the split
    removes the cliff without per-row Decimal128 accumulation); the avgs
    use the same identity at 6dp, closing the order-dependent
    round(avg(double), 6) variant of the class too.
    """
    t = load_tables(spark, sf_dir)
    price_u = money.units("l_extendedprice")
    disc_pct = money.units("l_discount")
    disc_price_u = price_u * (F.lit(100) - disc_pct)
    charge_u = disc_price_u * (F.lit(100) + money.units("l_tax"))
    agg = (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
            # wide=True on base/disc/avg_price too (r16 bounds audit,
            # functions/money.py table): the returnflag x linestatus group
            # domain is FIXED (6), so these per-group sums absorb all data
            # growth - extrapolated 2.9e18 / 2.7e20 at a true 100 TB.
            money.money_sum_2dp(price_u, wide=True).alias("sum_base_price"),
            money.money_sum_2dp(disc_price_u, d=100, wide=True).alias("sum_disc_price"),
            money.money_sum_2dp(charge_u, d=10000, wide=True).alias("sum_charge"),
            money.exact_avg(money.units("l_quantity", 1), per_unit=1).alias("avg_qty"),
            money.exact_avg(price_u, wide=True).alias("avg_price"),
            money.exact_avg(disc_pct).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
    return tiny_sorted(agg, "l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------- joins

def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi hash join customer⋈orders; grouped to keep output compact."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey, "inner")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            money.money_sum_2dp(money.units("o_totalprice")).alias("total_spent"),
        )
    )


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side join: the reference ships small tables via DistributedCache
    (SURVEY.md §2A); Spark's equivalent is an explicit broadcast hint.
    part/supplier stay small relative to lineitem at any scale factor."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.join(F.broadcast(t.part), t.lineitem.l_partkey == t.part.p_partkey)
        .join(F.broadcast(t.supplier), t.lineitem.l_suppkey == t.supplier.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


def q_join3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.

    Semi-reduction shape: customer(BUILDING) ⋈ orders(date) is pre-joined
    to a compact (orderkey → date, priority) relation before lineitem
    touches it, so the fact scan probes ONE hash table instead of two and
    never shuffles (measured 229 → 175 ms at the bench tier). The
    broadcast hint is size-gated per tier (functions/joins.py); above the
    bound the same plan stays declarative for Catalyst/AQE.

    Tie-break on l_orderkey makes LIMIT deterministic across engines
    (SURVEY.md §5.2.2). Spark plans TakeOrderedAndProject — no global sort.

    Small-tier BROADCAST-SEMI-REDUCED shape (VERDICT r7 item 4): the
    date-filtered orders keep ~96% of the table (~144k rows at sf0.1) —
    collecting and hashing that relation dominated the flattened r5 shape.
    Semi-reducing it by the BUILDING customer keys FIRST (a broadcast
    left-semi against a 1-column ~3k-row leaf) shrinks the fact-side
    broadcast 5× to ~29k rows before it is ever collected; the fact scan
    then probes ONE small hash table and — because the lineitem cache is
    hash-partitioned on l_orderkey (catalog.CACHE_KEYS) — aggregates with
    NO exchange straight into TakeOrderedAndProject. Measured interleaved
    best-of-5 × 3 rounds: 118/105/90 ms vs 152/106/95 ms flattened.

    The semi itself is layout-driven (catalog.cache_partition_key, the
    bucketing-metadata analogue): when orders and customer are cached
    co-partitioned on custkey, the left-semi runs as a ZERO-exchange
    shuffled-hash join inside the dims build — one job instead of the
    cust-leaf-broadcast → dims chain (measured 103/87/85 ms vs
    122/106/97 ms with the leaf broadcast). Unbucketed layouts (the
    correctness gate's uncached reads) keep the broadcast-leaf plan —
    forcing SHJ there would shuffle 150k orders to avoid a 3k-row
    broadcast. Above sf0.5 neither side is provably broadcastable and
    the semi-reduced dims shape below stays the declarative plan for
    Catalyst/AQE.
    """
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-06-01").cast("timestamp")
    agg_cols = ("l_orderkey", "o_orderdate", "o_orderpriority")
    rev = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    ).alias("revenue")
    fact = t.lineitem.filter(F.col("l_shipdate") > cutoff)
    if sf_of(sf_dir) <= 0.5:
        cust_f = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        colocated = (
            cache_partition_key(spark, sf_dir, "orders") == "o_custkey"
            and cache_partition_key(spark, sf_dir, "customer") == "c_custkey"
        )
        cust_f = cust_f.hint("shuffle_hash") if colocated else F.broadcast(cust_f)
        dims = (
            t.orders.filter(F.col("o_orderdate") < cutoff)
            .join(cust_f, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
            .select("o_orderkey", "o_orderdate", "o_orderpriority")
        )
        joined = fact.join(F.broadcast(dims), F.col("l_orderkey") == F.col("o_orderkey"))
    else:
        dims = (
            t.customer.filter(F.col("c_mktsegment") == "BUILDING")
            .join(t.orders.filter(F.col("o_orderdate") < cutoff),
                  t.customer.c_custkey == t.orders.o_custkey)
            .select("o_orderkey", "o_orderdate", "o_orderpriority")
        )
        joined = fact.join(dims, F.col("l_orderkey") == dims.o_orderkey)
    return (
        joined.groupBy(*agg_cols)
        .agg(rev)
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q_join5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join over the full FK chain, grouped by nation.

    The flagship query (wired into entry()). Semi-reduction shape: the
    whole region→nation→customer→orders(date) chain pre-joins down to a
    compact (orderkey → nationkey, nation name) relation — region filter
    applied first, dims broadcast by Catalyst — and lineitem then probes
    just that and supplier (measured 369 → 222 ms at the bench tier vs
    streaming lineitem through four separate dim probes). The reduced-dim
    broadcast hint is size-gated per tier (functions/joins.py): above
    sf1 it drops away and Catalyst/AQE plan the fact-side join from
    runtime stats — at 100 TB that is a shuffle on orderkey, exactly what
    the unreduced form would also do.

    Small-tier FLATTENED shape (VERDICT r5 item 5): the nested
    region→nation→customer→orders pre-join broadcasts serialize 4 job
    levels deep before the fact scan can start, each level paying the
    bench tier's ~15-25 ms scheduling floor. Broadcasting the
    date-filtered orders (leaf), the region-filtered customer map
    (depth 2: customer probing the tiny nation/region leaf broadcasts)
    and supplier (leaf) lets the builds overlap — critical path 3 levels
    instead of 5; measured 153 → ~122 ms interleaved best-of-6. Above
    sf0.5 the filtered orders side stops being provably broadcastable
    and the semi-reduced dims shape keeps the declarative 100 TB plan.

    When the catalog layout co-partitions orders and customer on custkey
    (catalog.cache_partition_key — the bucketing-metadata analogue), the
    orders⋈cust_map probe instead runs as a ZERO-exchange shuffled-hash
    join inside ONE dims build (~8.6k-row (orderkey → nationkey, name)
    broadcast), replacing the fat 43k-row orders_f broadcast and one
    fact-side probe; measured 132/131/111 ms vs 141/142/110 ms
    flattened. Unbucketed layouts keep the flattened broadcast plan.
    """
    t = load_tables(spark, sf_dir)
    date_lo = F.lit("1996-01-01").cast("timestamp")
    date_hi = F.lit("1998-01-01").cast("timestamp")
    rev = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    ).alias("revenue")
    if sf_of(sf_dir) <= 0.5:
        cust_map = (
            t.customer
            .join(F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey)
            .join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("c_custkey", "c_nationkey", "n_name")
        )
        orders_f = t.orders.filter(
            (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
        ).select("o_orderkey", "o_custkey")
        colocated = (
            cache_partition_key(spark, sf_dir, "orders") == "o_custkey"
            and cache_partition_key(spark, sf_dir, "customer") == "c_custkey"
        )
        if colocated:
            dims = (
                orders_f.join(cust_map.hint("shuffle_hash"),
                              F.col("o_custkey") == F.col("c_custkey"))
                .select("o_orderkey", "c_nationkey", "n_name")
            )
            fact = t.lineitem.join(
                F.broadcast(dims), t.lineitem.l_orderkey == F.col("o_orderkey")
            )
        else:
            fact = (
                t.lineitem
                .join(F.broadcast(orders_f), t.lineitem.l_orderkey == F.col("o_orderkey"))
                .join(F.broadcast(cust_map), F.col("o_custkey") == F.col("c_custkey"))
            )
        agg = (
            fact
            .join(F.broadcast(t.supplier), (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .groupBy("n_name")
            .agg(rev)
        )
    else:
        dims = (
            t.region.filter(F.col("r_name") == "ASIA")
            .join(t.nation, t.region.r_regionkey == t.nation.n_regionkey)
            .join(t.customer, t.nation.n_nationkey == t.customer.c_nationkey)
            .join(t.orders.filter(
                (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)),
                t.customer.c_custkey == t.orders.o_custkey)
            .select("o_orderkey", "c_nationkey", "n_name")
        )
        agg = (
            t.lineitem.join(dims, t.lineitem.l_orderkey == dims.o_orderkey)
            .join(t.supplier, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .groupBy("n_name")
            .agg(rev)
        )
    # ≤25 nations: single-partition sort, never a range exchange (tiny_sorted).
    return tiny_sorted(agg, F.desc("revenue"), "n_name")


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer, with 0 for the order-less."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers that placed an urgent order."""
    t = load_tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t.customer.join(urgent, t.customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no open ('P') order."""
    t = load_tables(spark, sf_dir)
    pending = t.orders.filter(F.col("o_orderstatus") == "P")
    return (
        t.customer.join(pending, t.customer.c_custkey == pending.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (non-equi): for each purchase event, the latest prior
    'click' of the same user. Spark lacks a native as-of join; expressed as a
    single ordered window pass (last non-null carried value) — one shuffle on
    user_id, no range cross-product, scales linearly (SURVEY.md §2B
    q_join_asof_theta).
    """
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        t.events.withColumn("prior_click_id", F.last(click_id, ignorenulls=True).over(w))
        .withColumn("prior_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "prior_click_id", "prior_click_ts")
    )


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-day order counts vs per-day event counts —
    dates exist on each side the other lacks, exercising null fill-in on
    BOTH sides (the one outer-join shape §2B's left/semi/anti rows miss)."""
    t = load_tables(spark, sf_dir)
    orders_daily = t.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    events_daily = t.events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    return (
        orders_daily.join(events_daily, "day", "full")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucket (ntile), percent_rank
    and cume_dist of order totals within each priority class."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation join (functions/joins.py::salted_join) as an
    oracle-checked query: orders ⋈ customer with the fact side salted over
    8 buckets, rolled up per market segment. Result must be identical to
    the plain join — the salt only changes the shuffle layout."""
    from machinelearningalgomapreduce_spark.functions.joins import salted_join

    t = load_tables(spark, sf_dir)
    big = t.orders.withColumnRenamed("o_custkey", "c_custkey")
    return (
        salted_join(big, t.customer, "c_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            money.money_sum_2dp(money.units("o_totalprice")).alias("total_price"),
        )
    )


PIVOT_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event counts, one column per event type.
    The value list is FIXED (deterministic schema; a dynamic pivot would
    need a driver-side distinct scan first)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy("user_id")
        .pivot("event_type", PIVOT_EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, PIVOT_EVENT_TYPES)
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): melt part's numeric columns into
    (attribute, value) rows — `DataFrame.unpivot`, Catalyst's Expand."""
    t = load_tables(spark, sf_dir)
    return t.part.unpivot(
        "p_partkey",
        [F.col("p_size").cast("double").alias("p_size"), "p_retailprice"],
        "attribute",
        "value",
    )


RANGE_JOIN_WINDOW_US = 10 * 60 * 1_000_000  # 10 minutes


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: for each 'error' event, the count and most
    recent of the same user's 'click' events in the preceding 10 minutes.

    Scale-safe shape: instead of a naive theta-join (which Spark would plan
    as a broadcast nested loop), both sides are bucketed to the 10-minute
    grid and equi-joined on (user_id, bucket) — each error probes exactly 2
    buckets — then the exact range predicate filters within the bucket
    matches. Candidate generation is linear in events, never a
    cross-product; this is the standard interval-join decomposition.
    """
    t = load_tables(spark, sf_dir)
    ev = t.events.select(
        "event_id", "user_id", "event_type", "ts", F.unix_micros("ts").alias("us")
    )
    bucket = (F.col("us") / RANGE_JOIN_WINDOW_US).cast("bigint")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("c_us"), bucket.alias("bucket")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "us"
    )
    cand = errors.select(
        "event_id", "user_id", "us", F.explode(F.array(bucket - 1, bucket)).alias("bucket")
    )
    matched = (
        cand.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("c_us") >= F.col("us") - RANGE_JOIN_WINDOW_US) & (F.col("c_us") < F.col("us"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n_prior_clicks"), F.max("c_us").alias("last_c_us"))
    )
    return errors.join(matched, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("n_prior_clicks"), F.lit(0)).alias("n_prior_clicks"),
        F.timestamp_micros(F.col("last_c_us")).alias("last_click_ts"),
    )


# --------------------------------------------------------- distinct/grouping

def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group via two-level aggregation (distinct
    keys pre-aggregated, then counted) — avoids the distinct-agg Expand
    that doubles rows before the first shuffle; same exact results.
    Small tiers pre-partition on event_type so both levels share ONE
    exchange (functions/joins.py::pre_partition_small_tier)."""
    t = load_tables(spark, sf_dir)
    ev = pre_partition_small_tier(t.events, sf_dir, ["event_type"])
    per_user = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    return per_user.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum("n").alias("n_events"),
    )


def q_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct would shuffle every key.

    Sketch values differ across engines by design, so the checked output is
    an accuracy ASSERTION: the exact count plus a boolean that the HLL
    estimate landed within tolerance (or ±2 absolute). The oracle emits the
    same exact count with a literal TRUE — the hash matches iff the sketch
    is actually close. Tolerance is 8× the configured rsd (0.01): HLL++
    error at rsd=0.01 is ~1% 1-sigma, so 8% keeps the assertion meaningful
    while immune to fixture-scale or Spark-version estimate drift.
    """
    t = load_tables(spark, sf_dir)
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.01)
    return (
        t.events.groupBy("event_type")
        .agg(exact.alias("n_users_exact"), approx.alias("_approx"))
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("_approx") - F.col("n_users_exact"))
                <= F.greatest(F.lit(2.0), F.col("n_users_exact") * 0.08)
            ).alias("approx_ok"),
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): multi-granularity aggregates in
    one pass (Catalyst Expand operator) instead of the reference's one job
    per granularity."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
    )


# -------------------------------------------------------------------- windows

def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping_id — all four
    granularities in one Expand pass, each row tagged with which keys are
    aggregated away."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


def q_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery via the spark.sql entry path (TPC-H Q4
    shape): Catalyst decorrelates it into a semi join — same ANSI text runs
    on both engines, demonstrating SQL-API parity with the DataFrame API."""
    t = load_tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    t.lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — the reference's 'secondary sort'
    idiom (SURVEY.md §2A) as a ranking window."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t.orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: lag/lead + running sum with an explicit row frame.

    Running measure is l_quantity (integral) so the cumulative sum is exact
    across engines regardless of aggregation tree shape.
    """
    t = load_tables(spark, sf_dir)
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures; the full
    # (linenumber, partkey, suppkey) triple is — required for deterministic
    # lag/lead/running values (SURVEY.md §5.2.2).
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_quantity",
        F.lag("l_quantity", 1).over(w).alias("prev_qty"),
        F.lead("l_quantity", 1).over(w).alias("next_qty"),
        F.sum("l_quantity").over(wrun).alias("running_qty"),
        F.row_number().over(w).alias("line_seq"),
    )


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject (per-partition top-k +
    merge on driver), never a full global sort. Tie-break on the key."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------- setops

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-key sets from two years."""
    t = load_tables(spark, sf_dir)
    y95 = (
        t.orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    )
    y96 = (
        t.orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    )
    both = y95.intersect(y96).withColumn("set_kind", F.lit("both"))
    only95 = y95.exceptAll(y96).withColumn("set_kind", F.lit("only_1995"))
    only96 = y96.exceptAll(y95).withColumn("set_kind", F.lit("only_1996"))
    return both.unionByName(only95).unionByName(only96)


# ------------------------------------------------------------------- scalars

def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar expression surface: string/date/math/conditional, all JVM-side
    (whole-stage codegen) — per-row arithmetic is bit-identical to DuckDB so
    only log() (libm vs Math.log ulp drift) is rounded."""
    t = load_tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias("days_to_2002"),
        F.round(F.col("o_totalprice"), 0).alias("price_round"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dev"),
        F.round(F.log(F.col("o_totalprice")), 6).alias("price_ln"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON path extraction from a string column."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t.events.select("event_id", k.alias("k_val"))
        .filter(F.col("k_val").isNotNull())
        .groupBy("k_val")
        .agg(F.count("*").alias("n"))
    )


def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-orphan audit across the star schema — the validation gate every
    pipeline runs before trusting a snapshot for joins/exports: per
    relationship, child rows whose FK finds no parent.

    Each relationship is ONE anti-join count (exact integers); parents
    are dimension-sized and broadcast by Catalyst. The six 1-row counts
    union into a bounded result — at 100 TB each check is a single
    fact-scan + broadcast probe, embarrassingly parallelizable across
    relationships."""
    t = load_tables(spark, sf_dir)
    rels = [
        ("lineitem.l_orderkey->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey"),
        ("lineitem.l_partkey->part", t.lineitem, "l_partkey", t.part, "p_partkey"),
        ("lineitem.l_suppkey->supplier", t.lineitem, "l_suppkey", t.supplier, "s_suppkey"),
        ("orders.o_custkey->customer", t.orders, "o_custkey", t.customer, "c_custkey"),
        ("customer.c_nationkey->nation", t.customer, "c_nationkey", t.nation, "n_nationkey"),
        ("supplier.s_nationkey->nation", t.supplier, "s_nationkey", t.nation, "n_nationkey"),
    ]
    out = None
    for name, child, fk, parent, pk in rels:
        orphans = child.select(F.col(fk).alias("k")).join(
            parent.select(F.col(pk).alias("k")), "k", "left_anti"
        )
        row = child.agg(F.count("*").alias("n_child")).crossJoin(
            F.broadcast(orphans.agg(F.count("*").alias("n_orphans")))
        ).select(F.lit(name).alias("relationship"), "n_child", "n_orphans")
        out = row if out is None else out.unionByName(row)
    return tiny_sorted(out, "relationship")


def q_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: per table, row count vs distinct key
    count and how many key values repeat — the sibling of
    q_referential_integrity (an export with duplicated keys silently
    double-counts in every downstream join).

    One count + countDistinct + duplicate-key aggregate per table, all
    exact integers, unioned into a bounded result."""
    t = load_tables(spark, sf_dir)
    keys = [
        ("orders", t.orders, "o_orderkey"),
        ("customer", t.customer, "c_custkey"),
        ("part", t.part, "p_partkey"),
        ("supplier", t.supplier, "s_suppkey"),
        ("events", t.events, "event_id"),
        ("documents", t.documents, "doc_id"),
        ("embeddings", t.embeddings, "vec_id"),
    ]
    out = None
    for name, df, key in keys:
        per_key = df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("c"))
        row = per_key.agg(
            F.lit(name).alias("table_name"),
            F.sum("c").alias("n_rows"),
            F.count("*").alias("n_distinct_keys"),
            F.sum((F.col("c") > 1).cast("bigint")).alias("n_dup_keys"),
        )
        out = row if out is None else out.unionByName(row)
    return tiny_sorted(out, "table_name")


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embeddings: size / element_at /
    slice / transform / aggregate / zip_with. Folds run sequentially over
    the array in both engines → bit-identical doubles, no rounding."""
    t = load_tables(spark, sf_dir)
    emb = F.col("embedding")
    as_dbl = F.transform(emb, lambda x: x.cast("double"))
    return t.embeddings.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_coord"),
        F.aggregate(as_dbl, F.lit(0.0), lambda acc, x: acc + x).alias("coord_sum"),
        F.aggregate(
            F.zip_with(as_dbl, as_dbl, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sq_norm"),
        F.aggregate(
            F.transform(F.slice(emb, 1, 8), lambda x: x.cast("double") * 2.0),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("head8_doubled_sum"),
    )


def q_running_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue share by nation (Pareto/ABC analysis): nations
    ordered by revenue desc, each row carrying its cumulative share of
    the total — the "which 20% of markets carry 80% of revenue" query.
    Revenue is exact floor-cents BIGINTs; the running sum is an integer
    prefix over the 25-row nation domain; shares are identical single
    divisions rounded to 6.

    Scale shape: fact table aggregates once to the nation domain
    (map-side partials, broadcast dim join); the window runs over ≤25
    rows."""
    t = load_tables(spark, sf_dir)
    rev = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            t.orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_cents"))
        .join(F.broadcast(t.nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = W.orderBy(F.desc("rev_cents"), "n_name").rowsBetween(W.unboundedPreceding, 0)
    tot = W.partitionBy()
    return rev.select(
        "n_name",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("cum_cents"),
        F.round(
            F.sum("rev_cents").over(w).cast("double")
            / F.sum("rev_cents").over(tot).cast("double"),
            6,
        ).alias("cum_share"),
    )


def q_order_gap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer median inter-order gap (reorder cadence): day gaps
    between consecutive orders via lag over (date, orderkey), per-customer
    median emitted as 2×median BIGINT (the interpolated median of
    integers has denominator ≤2, so 2× is exact — the q_levene
    discipline). Top-20 most-frequent reorderers for a bounded result.

    Scale shape: one customer-partitioned window over orders (fact-only,
    no joins) + one per-customer percentile aggregate."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = t.orders.select(
        "o_custkey",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    per = gaps.groupBy("o_custkey").agg(
        F.count("*").alias("n_gaps"),
        (2 * F.percentile(F.col("gap_days"), F.lit(0.5))).cast("bigint").alias("med2_gap_days"),
    )
    return (
        per.filter(F.col("n_gaps") >= 12)
        .orderBy(F.desc("n_gaps"), F.asc("med2_gap_days"), F.asc("o_custkey"))
        .limit(20)
    )


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-optimal) parts: minimize retail price, maximize
    size — no other part is at-least-as-good on both and strictly better
    on one. Computed the scale-correct way: the candidate set first
    collapses to ONE row per size (the per-size min price — only those
    can be in the skyline), dominance runs on that ≤|size-domain| frame,
    and the winners join back to every part matching (size, best price).
    Prices compare as exact floor-cents integers.

    Scale shape: one size-keyed aggregate over part, an O(sizes²)
    bounded anti-join, one broadcast join back — never an O(n²)
    all-pairs pass over the raw table."""
    t = load_tables(spark, sf_dir)
    cents = F.floor(F.col("p_retailprice") * 100).cast("bigint")
    parts = t.part.select("p_partkey", "p_size", cents.alias("price_cents"))
    cand = parts.groupBy("p_size").agg(F.min("price_cents").alias("best_cents"))
    c1, c2 = cand.alias("c1"), cand.alias("c2")
    surviving = c1.join(
        c2,
        (F.col("c2.p_size") > F.col("c1.p_size"))
        & (F.col("c2.best_cents") <= F.col("c1.best_cents")),
        "left_anti",
    ).select(
        F.col("c1.p_size").alias("s_size"),
        F.col("c1.best_cents").alias("s_best"),
    )
    return parts.join(
        F.broadcast(surviving),
        (parts.p_size == F.col("s_size"))
        & (parts.price_cents == F.col("s_best")),
        "left_semi",
    )


QUERIES = {
    "q_running_share": q_running_share,
    "q_order_gap_median": q_order_gap_median,
    "q_skyline": q_skyline,
    "q_scan_project": q_scan_project,
    "q_filter_pred": q_filter_pred,
    "q_filter_agg": q_filter_agg,
    "q_pricing_summary": q_pricing_summary,
    "q_join_inner": q_join_inner,
    "q_join_broadcast": q_join_broadcast,
    "q_join3_topk": q_join3_topk,
    "q_join5_region": q_join5_region,
    "q_join_left": q_join_left,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_asof": q_join_asof,
    "q_range_join": q_range_join,
    "q_join_salted": q_join_salted,
    "q_join_full": q_join_full,
    "q_window_dist": q_window_dist,
    "q_pivot": q_pivot,
    "q_unpivot": q_unpivot,
    "q_distinct_users": q_distinct_users,
    "q_distinct_users_approx": q_distinct_users_approx,
    "q_grouping_sets": q_grouping_sets,
    "q_cube": q_cube,
    "q_sql_exists": q_sql_exists,
    "q_window_rank": q_window_rank,
    "q_window_analytic": q_window_analytic,
    "q_sort_limit": q_sort_limit,
    "q_set_ops": q_set_ops,
    "q_scalar_funcs": q_scalar_funcs,
    "q_json_extract": q_json_extract,
    "q_array_ops": q_array_ops,
    "q_referential_integrity": q_referential_integrity,
    "q_key_uniqueness": q_key_uniqueness,
}

ORACLES = {
    "q_running_share": """
        WITH rev AS (
            SELECT n.n_name,
                   CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS rev_cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        )
        SELECT n_name, rev_cents,
               CAST(sum(rev_cents) OVER w AS BIGINT) AS cum_cents,
               round(CAST(sum(rev_cents) OVER w AS DOUBLE)
                     / CAST(sum(rev_cents) OVER () AS DOUBLE), 6) AS cum_share
        FROM rev
        WINDOW w AS (ORDER BY rev_cents DESC, n_name
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "q_skyline": """
        WITH parts AS (
            SELECT p_partkey, p_size,
                   CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents
            FROM part
        ),
        cand AS (
            SELECT p_size, CAST(min(price_cents) AS BIGINT) AS best_cents
            FROM parts GROUP BY p_size
        ),
        surviving AS (
            SELECT c1.p_size, c1.best_cents
            FROM cand c1
            WHERE NOT EXISTS (
                SELECT 1 FROM cand c2
                WHERE c2.p_size > c1.p_size AND c2.best_cents <= c1.best_cents
            )
        )
        SELECT p.p_partkey, p.p_size, p.price_cents
        FROM parts p
        JOIN surviving s
          ON p.p_size = s.p_size AND p.price_cents = s.best_cents
    """,
    "q_order_gap_median": """
        WITH gaps AS (
            SELECT o_custkey,
                   CAST(datediff('day',
                                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                        ORDER BY o_orderdate, o_orderkey),
                                 o_orderdate) AS BIGINT) AS gap_days
            FROM orders
        ),
        per AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(2 * quantile_cont(gap_days, 0.5) AS BIGINT) AS med2_gap_days
            FROM gaps WHERE gap_days IS NOT NULL
            GROUP BY o_custkey
        )
        SELECT o_custkey, n_gaps, med2_gap_days
        FROM per WHERE n_gaps >= 12
        ORDER BY n_gaps DESC, med2_gap_days, o_custkey
        LIMIT 20
    """,
    "q_referential_integrity": """
        WITH checks AS (
            SELECT 'lineitem.l_orderkey->orders' AS relationship,
                   (SELECT count(*) FROM lineitem) AS n_child,
                   (SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
            UNION ALL
            SELECT 'lineitem.l_partkey->part',
                   (SELECT count(*) FROM lineitem),
                   (SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM part p
                                      WHERE p.p_partkey = l.l_partkey))
            UNION ALL
            SELECT 'lineitem.l_suppkey->supplier',
                   (SELECT count(*) FROM lineitem),
                   (SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                      WHERE s.s_suppkey = l.l_suppkey))
            UNION ALL
            SELECT 'orders.o_custkey->customer',
                   (SELECT count(*) FROM orders),
                   (SELECT count(*) FROM orders o
                    WHERE NOT EXISTS (SELECT 1 FROM customer c
                                      WHERE c.c_custkey = o.o_custkey))
            UNION ALL
            SELECT 'customer.c_nationkey->nation',
                   (SELECT count(*) FROM customer),
                   (SELECT count(*) FROM customer c
                    WHERE NOT EXISTS (SELECT 1 FROM nation n
                                      WHERE n.n_nationkey = c.c_nationkey))
            UNION ALL
            SELECT 'supplier.s_nationkey->nation',
                   (SELECT count(*) FROM supplier),
                   (SELECT count(*) FROM supplier s
                    WHERE NOT EXISTS (SELECT 1 FROM nation n
                                      WHERE n.n_nationkey = s.s_nationkey))
        )
        SELECT relationship, n_child, n_orphans FROM checks
        ORDER BY relationship
    """,
    "q_key_uniqueness": """
        WITH audits AS (
            SELECT 'orders' AS table_name, count(*) AS n_rows,
                   count(DISTINCT o_orderkey) AS n_distinct_keys,
                   (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                          GROUP BY 1 HAVING count(*) > 1)) AS n_dup_keys
            FROM orders
            UNION ALL
            SELECT 'customer', count(*), count(DISTINCT c_custkey),
                   (SELECT count(*) FROM (SELECT c_custkey FROM customer
                                          GROUP BY 1 HAVING count(*) > 1))
            FROM customer
            UNION ALL
            SELECT 'part', count(*), count(DISTINCT p_partkey),
                   (SELECT count(*) FROM (SELECT p_partkey FROM part
                                          GROUP BY 1 HAVING count(*) > 1))
            FROM part
            UNION ALL
            SELECT 'supplier', count(*), count(DISTINCT s_suppkey),
                   (SELECT count(*) FROM (SELECT s_suppkey FROM supplier
                                          GROUP BY 1 HAVING count(*) > 1))
            FROM supplier
            UNION ALL
            SELECT 'events', count(*), count(DISTINCT event_id),
                   (SELECT count(*) FROM (SELECT event_id FROM events
                                          GROUP BY 1 HAVING count(*) > 1))
            FROM events
            UNION ALL
            SELECT 'documents', count(*), count(DISTINCT doc_id),
                   (SELECT count(*) FROM (SELECT doc_id FROM documents
                                          GROUP BY 1 HAVING count(*) > 1))
            FROM documents
            UNION ALL
            SELECT 'embeddings', count(*), count(DISTINCT vec_id),
                   (SELECT count(*) FROM (SELECT vec_id FROM embeddings
                                          GROUP BY 1 HAVING count(*) > 1))
            FROM embeddings
        )
        SELECT table_name, n_rows, n_distinct_keys, n_dup_keys FROM audits
        ORDER BY table_name
    """,
    "q_scan_project": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               p_retailprice * 1.1 AS price_infl,
               CAST(length(p_type) AS INTEGER) AS type_len
        FROM part
    """,
    "q_filter_pred": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus = 'O'
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND (o_totalprice BETWEEN 1000.0 AND 200000.0 OR o_custkey < 10)
    """,
    "q_filter_agg": """
        SELECT CAST((CASE WHEN sum((CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((l_discount) * 100) AS BIGINT))) < 0 THEN -((2 * (-(sum((CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((l_discount) * 100) AS BIGINT))))) + 100) // (2 * 100)) ELSE ((2 * (sum((CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((l_discount) * 100) AS BIGINT)))) + 100) // (2 * 100)) END) AS DOUBLE) / 100 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
               CAST((CASE WHEN sum((CAST(round((l_extendedprice) * 100) AS BIGINT) * (100 - CAST(round((l_discount) * 100) AS BIGINT)))) < 0 THEN -((2 * (-(sum((CAST(round((l_extendedprice) * 100) AS BIGINT) * (100 - CAST(round((l_discount) * 100) AS BIGINT)))))) + 100) // (2 * 100)) ELSE ((2 * (sum((CAST(round((l_extendedprice) * 100) AS BIGINT) * (100 - CAST(round((l_discount) * 100) AS BIGINT))))) + 100) // (2 * 100)) END) AS DOUBLE) / 100 AS sum_disc_price,
               CAST((CASE WHEN sum(((CAST(round((l_extendedprice) * 100) AS BIGINT) * (100 - CAST(round((l_discount) * 100) AS BIGINT))) * (100 + CAST(round((l_tax) * 100) AS BIGINT)))) < 0 THEN -((2 * (-(sum(((CAST(round((l_extendedprice) * 100) AS BIGINT) * (100 - CAST(round((l_discount) * 100) AS BIGINT))) * (100 + CAST(round((l_tax) * 100) AS BIGINT)))))) + 10000) // (2 * 10000)) ELSE ((2 * (sum(((CAST(round((l_extendedprice) * 100) AS BIGINT) * (100 - CAST(round((l_discount) * 100) AS BIGINT))) * (100 + CAST(round((l_tax) * 100) AS BIGINT))))) + 10000) // (2 * 10000)) END) AS DOUBLE) / 100 AS sum_charge,
               CAST((CASE WHEN (sum(CAST(round((l_quantity) * 1) AS BIGINT)) * 1000000) < 0 THEN -((2 * (-((sum(CAST(round((l_quantity) * 1) AS BIGINT)) * 1000000))) + (1 * count(*))) // (2 * (1 * count(*)))) ELSE ((2 * ((sum(CAST(round((l_quantity) * 1) AS BIGINT)) * 1000000)) + (1 * count(*))) // (2 * (1 * count(*)))) END) AS DOUBLE) / 1000000 AS avg_qty,
               CAST((CASE WHEN (sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) * 1000000) < 0 THEN -((2 * (-((sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) * 1000000))) + (100 * count(*))) // (2 * (100 * count(*)))) ELSE ((2 * ((sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) * 1000000)) + (100 * count(*))) // (2 * (100 * count(*)))) END) AS DOUBLE) / 1000000 AS avg_price,
               CAST((CASE WHEN (sum(CAST(round((l_discount) * 100) AS BIGINT)) * 1000000) < 0 THEN -((2 * (-((sum(CAST(round((l_discount) * 100) AS BIGINT)) * 1000000))) + (100 * count(*))) // (2 * (100 * count(*)))) ELSE ((2 * ((sum(CAST(round((l_discount) * 100) AS BIGINT)) * 1000000)) + (100 * count(*))) // (2 * (100 * count(*)))) END) AS DOUBLE) / 1000000 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q_join_inner": """
        SELECT c_custkey, c_name,
               count(*) AS n_orders,
               CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_spent
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "q_join_broadcast": """
        SELECT p_brand,
               count(*) AS n_items,
               sum(l_quantity) AS sum_qty,
               count(DISTINCT s_suppkey) AS n_suppliers
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY p_brand
    """,
    "q_join3_topk": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate  > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q_join5_region": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM region
        JOIN nation   ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q_join_left": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "q_join_semi": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    "q_join_anti": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    "q_join_full": """
        WITH od AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        ), ed AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   count(*) AS n_events
            FROM events GROUP BY 1
        )
        SELECT coalesce(od.day, ed.day) AS day,
               coalesce(od.n_orders, 0) AS n_orders,
               coalesce(ed.n_events, 0) AS n_events
        FROM od FULL OUTER JOIN ed ON od.day = ed.day
    """,
    "q_window_dist": """
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    "q_join_salted": """
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(round((o.o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "q_pivot": """
        SELECT user_id,
               count(*) FILTER (event_type = 'click')    AS click,
               count(*) FILTER (event_type = 'view')     AS view,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup')   AS signup,
               count(*) FILTER (event_type = 'error')    AS error
        FROM events
        GROUP BY user_id
    """,
    "q_unpivot": """
        SELECT p_partkey, 'p_size' AS attribute, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS attribute, p_retailprice AS value
        FROM part
    """,
    "q_range_join": """
        WITH clicks AS (
            SELECT user_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'
        ), errors AS (
            SELECT event_id, user_id, ts, epoch_us(ts) AS us
            FROM events WHERE event_type = 'error'
        ), matched AS (
            SELECT e.event_id,
                   count(c.c_us) AS n_prior_clicks,
                   max(c.c_us) AS last_c_us
            FROM errors e LEFT JOIN clicks c
              ON c.user_id = e.user_id
             AND c.c_us >= e.us - 600000000
             AND c.c_us < e.us
            GROUP BY e.event_id
        )
        SELECT e.event_id, e.user_id, e.ts,
               m.n_prior_clicks,
               CAST(make_timestamp(m.last_c_us) AS TIMESTAMP) AS last_click_ts
        FROM errors e JOIN matched m USING (event_id)
    """,
    "q_join_asof": """
        SELECT event_id, user_id, ts, prior_click_id, prior_click_ts
        FROM (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_id,
                   last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_ts
            FROM events
        )
        WHERE event_type = 'purchase'
    """,
    "q_distinct_users": """
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    "q_distinct_users_approx": """
        SELECT event_type,
               count(DISTINCT user_id) AS n_users_exact,
               TRUE AS approx_ok
        FROM events
        GROUP BY event_type
    """,
    "q_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_cube": """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid,
               count(*) AS n_rows,
               sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_sql_exists": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    "q_window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    "q_window_analytic": """
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
               lag(l_quantity, 1)  OVER w AS prev_qty,
               lead(l_quantity, 1) OVER w AS next_qty,
               sum(l_quantity) OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
               CAST(row_number() OVER w AS INTEGER) AS line_seq
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey)
    """,
    "q_sort_limit": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
    "q_set_ops": """
        WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
             y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        SELECT o_custkey, 'both' AS set_kind FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
        UNION ALL
        SELECT o_custkey, 'only_1995' AS set_kind FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
        UNION ALL
        SELECT o_custkey, 'only_1996' AS set_kind FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
    """,
    "q_scalar_funcs": """
        SELECT o_orderkey,
               substring(o_orderpriority, 1, 1) AS prio_code,
               lower(o_orderstatus) AS status_lower,
               concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS order_quarter,
               CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002,
               round(o_totalprice, 0) AS price_round,
               abs(o_totalprice - 100000.0) AS price_dev,
               round(ln(o_totalprice), 6) AS price_ln,
               sqrt(o_totalprice) AS price_sqrt,
               CASE WHEN o_totalprice > 150000 THEN 'high'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'low' END AS price_band
        FROM orders
    """,
    "q_json_extract": """
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
               count(*) AS n
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY 1
    """,
    "q_array_ops": """
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_coord,
               list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS coord_sum,
               list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq_norm,
               list_sum(list_transform(list_slice(embedding, 1, 8), x -> CAST(x AS DOUBLE) * 2.0)) AS head8_doubled_sum
        FROM embeddings
    """,
}
