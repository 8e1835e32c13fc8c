"""SparkSession factory with the engine's default tuning.

Defaults are chosen for correctness-vs-DuckDB (UTC session timezone, ANSI on)
and for scale (AQE on, skew-join handling on). ``shuffle_partitions`` is a
local-mode knob only — on a real cluster AQE coalescing makes the initial
number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mlmr_spark_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """`extra_conf` lets a caller set CORE (SparkConf-time) settings that
    cannot be flipped at runtime — bench.py uses it for bench-tier-only
    knobs (shuffle/broadcast compression off at MB scale). Engine defaults
    stay scale-safe."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Whole-stage codegen emits ONE consume() method per stage; vector
        # kernels (64-term dot/sq_dist chains over array columns) push that
        # method past HotSpot's HugeMethodLimit (8000 bytecodes), and WSCG
        # cannot split expressions that read stage-local variables — so the
        # stage silently runs in the BYTECODE INTERPRETER. Letting the JIT
        # compile huge methods is the documented remedy and is scale-free
        # (it is about generated-code size, not data size): q_dedup_embedding
        # 41.6 s → 6.8 s, q_sim_topk/q_knn same kernel (r15, guide §1/§4 —
        # measured at the bench tier, plan unchanged). Applied to executors
        # too for non-local deployments; code-cache headroom raised so the
        # extra compiled code never evicts hot methods.
        .config("spark.driver.extraJavaOptions",
                "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m")
        .config("spark.executor.extraJavaOptions",
                "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_query_conf(spark: SparkSession) -> None:
    """Runtime-settable confs the oracle comparison depends on.

    Safe to call on a driver-provided session: only touches runtime SQL confs.
    UTC pins timestamp rendering so wall-clock values match DuckDB's naive
    timestamps (guide: 'Spark timestamps are session-TZ'). nanosAsLong is a
    session invariant the scan layer depends on (fixture parquet stores
    TIMESTAMP(NANOS)); re-asserted here so driver-side execution self-heals
    if anything flipped it between load and action.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # A driver-provided session at Spark's 200-partition default would run
    # every small-SF shuffle as 200 near-empty tasks; right-size it for
    # local fixtures. Only overrides the untouched default — a deliberate
    # caller choice (like bench's 4) is respected.
    try:
        if int(spark.conf.get("spark.sql.shuffle.partitions")) >= 200:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:  # noqa: BLE001 - conf introspection must never fail a query
        pass
