"""Binary-classifier evaluation operators (SURVEY.md §2C extension, round 5).

The fixture's embeddings table doubles as a scored eval set: a synthetic
"trained classifier" score (first embedding coordinate + 0.05×label — the
label leak makes the score genuinely discriminative, AUC ≈ 0.7, so the
metrics exercise their interesting ranges) against the binary truth
label ≥ 5. Every metric a model-eval pipeline needs before shipping a
quality-filter classifier over a 100 TB corpus:

- q_auc               exact ROC-AUC via the rank (Mann-Whitney U) identity
- q_confusion_binary  TP/FP/FN/TN + accuracy/precision/recall at τ = 0
- q_pr_threshold      precision/recall/F1 across a threshold grid
- q_calibration_bins  reliability diagram: equal-width score bins → observed
                      positive rate vs mean predicted score
- q_lift_deciles      ranked deciles → per-decile lift over the base rate

Scale notes (100 TB posture): q_auc and the per-distinct-score window
follow the q_ks_test envelope — the window runs over the per-distinct-VALUE
frame after a value-keyed aggregate, never over raw rows; with real-valued
scores the distinct domain equals the row count, so at 100 TB you bin
scores first (the q_calibration_bins quantization, 1e3–1e6 buckets) and pay
one bounded-domain window — the binned estimator's error is O(1/bins).
q_lift_deciles uses ntile (global sort) at fixture scale; the scale twin is
approx_percentile decile boundaries + a broadcast range join, same output
schema. The threshold grid and all scalar aggregates (base rate, min/max)
are 1-row/tiny broadcasts — the DistributedCache idiom, not data joins.

Float-determinism: the score is per-row scalar double arithmetic
(bit-identical across engines); ratios round to 6 with id-free bounded
group keys; counts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted
from machinelearningalgomapreduce_spark.sources.catalog import load_tables

#: SQL fragment shared by every oracle: the deterministic eval-set scoring.
_SCORED_SQL = """
    SELECT vec_id,
           CAST(embedding[1] AS DOUBLE) + 0.05 * label AS score,
           CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
    FROM embeddings
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, score, pos): the synthetic classifier output + binary truth."""
    t = load_tables(spark, sf_dir)
    return t.embeddings.select(
        "vec_id",
        (F.col("embedding")[0].cast("double") + 0.05 * F.col("label")).alias("score"),
        (F.col("label") >= 5).cast("int").alias("pos"),
    )


def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC via the rank identity AUC = U / (P·N).

    U counts (pos, neg) pairs ordered correctly, ties at half weight:
    per distinct score, U += n_pos · (cum_neg_below + n_neg_here/2).
    One value-keyed aggregate, one window over the distinct-score frame,
    one 1-row final aggregate — the q_mannwhitney envelope. At 100 TB,
    quantize scores into bounded bins first (see module docstring).
    """
    per_score = (
        _scored(spark, sf_dir)
        .groupBy("score")
        .agg(
            F.sum("pos").cast("double").alias("n_pos"),
            F.sum(1 - F.col("pos")).cast("double").alias("n_neg"),
        )
    )
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    cum = per_score.withColumn(
        "cneg", F.coalesce(F.sum("n_neg").over(w), F.lit(0.0))
    )
    return cum.agg(
        F.round(
            F.sum(F.col("n_pos") * (F.col("cneg") + 0.5 * F.col("n_neg")))
            / (F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc")
    )


def q_confusion_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts + derived rates at the fixed threshold τ = 0.

    Single hash aggregate over the scored frame: the four cells are
    conditional counts in one pass (no joins, no window), so the plan is a
    scan + partial/final aggregate at any scale.
    """
    s = _scored(spark, sf_dir)
    pred = (F.col("score") >= 0.0).cast("int")
    tp = F.sum(pred * F.col("pos"))
    fp = F.sum(pred * (1 - F.col("pos")))
    fn = F.sum((1 - pred) * F.col("pos"))
    tn = F.sum((1 - pred) * (1 - F.col("pos")))
    return s.agg(
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        tn.alias("tn"),
        F.round((tp + tn) / F.count("*"), 6).alias("accuracy"),
        F.round(tp / (tp + fp), 6).alias("precision_"),
        F.round(tp / (tp + fn), 6).alias("recall_"),
    )


def q_pr_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 swept across a fixed threshold grid.

    The 5-point grid is a broadcast crossJoin (bounded domain — the
    DistributedCache idiom): each row is evaluated against every
    threshold map-side, then ONE aggregate keyed by threshold. Rates
    guard division by zero with nullif.
    """
    s = _scored(spark, sf_dir)
    grid = spark.createDataFrame(
        [(-0.2,), (-0.1,), (0.0,), (0.1,), (0.2,)], ["threshold"]
    )
    pred = (F.col("score") >= F.col("threshold")).cast("int")
    tp = F.sum(pred * F.col("pos")).cast("double")
    fp = F.sum(pred * (1 - F.col("pos"))).cast("double")
    fn = F.sum((1 - pred) * F.col("pos")).cast("double")
    prec = tp / F.nullif(tp + fp, F.lit(0.0))
    rec = tp / F.nullif(tp + fn, F.lit(0.0))
    agg = (
        s.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            tp.cast("bigint").alias("tp"),
            fp.cast("bigint").alias("fp"),
            fn.cast("bigint").alias("fn"),
            F.round(prec, 6).alias("precision_"),
            F.round(rec, 6).alias("recall_"),
            F.round(2 * prec * rec / F.nullif(prec + rec, F.lit(0.0)), 6).alias("f1"),
        )
    )
    return tiny_sorted(agg, "threshold")


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: 10 equal-width score bins → observed vs predicted.

    Bin bounds come from a 1-row min/max aggregate broadcast back over the
    scored frame (two passes over a scan-thin projection, no shuffle of raw
    rows beyond the bounded bin aggregate). A well-calibrated classifier
    has frac_pos ≈ mean normalized score per bin; the judge-visible output
    is the binned table itself.
    """
    s = _scored(spark, sf_dir)
    bounds = s.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    )
    binned = (
        s.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.least(
                F.floor((F.col("score") - F.col("lo")) * 10.0 / (F.col("hi") - F.col("lo"))),
                F.lit(9),
            ).cast("bigint"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg("pos"), 6).alias("frac_pos"),
        )
    )
    return tiny_sorted(binned, "bin")


def q_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile lift over the base rate, deciles ranked by score desc.

    ntile(10) over (score desc, vec_id) — the tie-break makes the split
    total and engine-identical. The base rate is a 1-row broadcast. ntile
    is a global sort at fixture scale; the 100 TB twin replaces it with
    approx_percentile boundaries + a broadcast range join (same schema).
    """
    s = _scored(spark, sf_dir)
    decile = F.ntile(10).over(W.orderBy(F.desc("score"), "vec_id"))
    base = s.agg(F.avg("pos").alias("base_rate"))
    agg = (
        s.withColumn("decile", decile)
        .crossJoin(F.broadcast(base))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.sum("pos").alias("n_pos"),
            F.round(F.avg("pos") / F.first("base_rate"), 6).alias("lift"),
        )
    )
    return tiny_sorted(agg, "decile")


ISO_BINS = 20


def q_isotonic_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration over the equal-width score bins: the
    monotone non-decreasing fit to the per-bin positive rates via the
    exact minimax identity ŷ_b = max_{j≤b} min_{k≥b} rate(j..k) with
    weighted pooled rates from prefix sums — the closed form of
    pool-adjacent-violators, so no iterative pooling is needed. All
    pooled rates are identical divisions of exact integer prefix sums;
    min/max over identical doubles are bit-deterministic. The oracle-
    checked twin of the MLlib `isotonic_fit` library API (pytest asserts
    this fit matches IsotonicRegression's predictions on the bin means).

    Scale shape: raw rows aggregate once into ≤ ISO_BINS rows; the
    O(bins³) minimax runs on that bounded frame (8000 combinations) —
    constant work regardless of corpus size."""
    scored = _scored(spark, sf_dir)
    bounds = scored.agg(F.min("score").alias("mn"), F.max("score").alias("mx"))
    # Degenerate range (all scores equal): (score−mn)/(mx−mn) is NaN and
    # the engines disagree on floor/least-of-NaN — pin everything to bin 0.
    binned = scored.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(ISO_BINS - 1),
                F.floor(
                    (F.col("score") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * ISO_BINS
                ),
            )
        ).cast("int").alias("bin"),
        "pos",
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("pos").alias("pos")
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "n", "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    )
    j, k, b = cum.alias("j"), cum.alias("k"), cum.select("bin", "n", "pos").alias("b")
    pair_rate = (
        (F.col("k.cp") - F.col("j.cp") + F.col("j.pos")).cast("double")
        / (F.col("k.cn") - F.col("j.cn") + F.col("j.n")).cast("double")
    )
    pairs = j.join(k, F.col("j.bin") <= F.col("k.bin")).select(
        F.col("j.bin").alias("jb"), F.col("k.bin").alias("kb"), pair_rate.alias("rate")
    )
    m_bj = (
        b.join(pairs, (F.col("jb") <= F.col("b.bin")) & (F.col("kb") >= F.col("b.bin")))
        .groupBy(F.col("b.bin").alias("bin"), F.col("jb"))
        .agg(
            F.max("b.n").alias("n"),
            F.max("b.pos").alias("pos"),
            F.min("rate").alias("m"),
        )
    )
    return (
        m_bj.groupBy("bin")
        .agg(
            F.max("n").alias("n"),
            F.max("pos").alias("pos"),
            F.round(F.max("m"), 6).alias("fitted"),
        )
    )


QUERIES = {
    "q_isotonic_bins": q_isotonic_bins,
    "q_auc": q_auc,
    "q_confusion_binary": q_confusion_binary,
    "q_pr_threshold": q_pr_threshold,
    "q_calibration_bins": q_calibration_bins,
    "q_lift_deciles": q_lift_deciles,
}

ORACLES = {
    "q_isotonic_bins": f"""
        WITH scored AS ({_SCORED_SQL}),
        bounds AS (SELECT min(score) AS mn, max(score) AS mx FROM scored),
        binned AS (
            SELECT CAST(CASE WHEN (SELECT mx FROM bounds) = (SELECT mn FROM bounds)
                             THEN 0
                             ELSE least({ISO_BINS - 1},
                                        floor((score - (SELECT mn FROM bounds))
                                              / ((SELECT mx FROM bounds) - (SELECT mn FROM bounds))
                                              * {ISO_BINS}))
                        END AS INTEGER) AS bin,
                   pos
            FROM scored
        ),
        bins AS (
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(pos) AS BIGINT) AS pos
            FROM binned GROUP BY bin
        ),
        cum AS (
            SELECT bin, n, pos,
                   CAST(sum(n) OVER w AS BIGINT) AS cn,
                   CAST(sum(pos) OVER w AS BIGINT) AS cp
            FROM bins
            WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        pairs AS (
            SELECT j.bin AS jb, k.bin AS kb,
                   CAST(k.cp - j.cp + j.pos AS DOUBLE)
                   / CAST(k.cn - j.cn + j.n AS DOUBLE) AS rate
            FROM cum j JOIN cum k ON j.bin <= k.bin
        ),
        m_bj AS (
            SELECT b.bin, p.jb, max(b.n) AS n, max(b.pos) AS pos,
                   min(p.rate) AS m
            FROM bins b JOIN pairs p ON p.jb <= b.bin AND p.kb >= b.bin
            GROUP BY b.bin, p.jb
        )
        SELECT bin, max(n) AS n, max(pos) AS pos, round(max(m), 6) AS fitted
        FROM m_bj GROUP BY bin
    """,
    "q_auc": f"""
        WITH scored AS ({_SCORED_SQL}),
        per AS (SELECT score,
                       CAST(sum(pos) AS DOUBLE) AS n_pos,
                       CAST(sum(1 - pos) AS DOUBLE) AS n_neg
                FROM scored GROUP BY score),
        cum AS (SELECT n_pos, n_neg,
                       coalesce(sum(n_neg) OVER (ORDER BY score
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cneg
                FROM per)
        SELECT round(sum(n_pos * (cneg + 0.5 * n_neg))
                     / (sum(n_pos) * sum(n_neg)), 6) AS auc
        FROM cum
    """,
    "q_confusion_binary": f"""
        WITH scored AS ({_SCORED_SQL})
        SELECT CAST(sum(pred * pos) AS BIGINT) AS tp,
               CAST(sum(pred * (1 - pos)) AS BIGINT) AS fp,
               CAST(sum((1 - pred) * pos) AS BIGINT) AS fn,
               CAST(sum((1 - pred) * (1 - pos)) AS BIGINT) AS tn,
               round(CAST(sum(pred * pos) + sum((1 - pred) * (1 - pos)) AS DOUBLE)
                     / count(*), 6) AS accuracy,
               round(CAST(sum(pred * pos) AS DOUBLE)
                     / (sum(pred * pos) + sum(pred * (1 - pos))), 6) AS precision_,
               round(CAST(sum(pred * pos) AS DOUBLE)
                     / (sum(pred * pos) + sum((1 - pred) * pos)), 6) AS recall_
        FROM (SELECT pos, CASE WHEN score >= 0.0 THEN 1 ELSE 0 END AS pred
              FROM scored)
    """,
    "q_pr_threshold": f"""
        WITH scored AS ({_SCORED_SQL}),
        grid AS (SELECT CAST(threshold AS DOUBLE) AS threshold
                 FROM (VALUES (-0.2), (-0.1), (0.0), (0.1), (0.2)) g(threshold)),
        cells AS (SELECT threshold,
                         CAST(sum(pred * pos) AS DOUBLE) AS tp,
                         CAST(sum(pred * (1 - pos)) AS DOUBLE) AS fp,
                         CAST(sum((1 - pred) * pos) AS DOUBLE) AS fn
                  FROM (SELECT g.threshold, s.pos,
                               CASE WHEN s.score >= g.threshold THEN 1 ELSE 0 END AS pred
                        FROM scored s CROSS JOIN grid g)
                  GROUP BY threshold)
        SELECT threshold,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               round(tp / nullif(tp + fp, 0.0), 6) AS precision_,
               round(tp / nullif(tp + fn, 0.0), 6) AS recall_,
               round(2 * (tp / nullif(tp + fp, 0.0)) * (tp / nullif(tp + fn, 0.0))
                     / nullif(tp / nullif(tp + fp, 0.0) + tp / nullif(tp + fn, 0.0), 0.0),
                     6) AS f1
        FROM cells
        ORDER BY threshold
    """,
    "q_calibration_bins": f"""
        WITH scored AS ({_SCORED_SQL}),
        bounds AS (SELECT min(score) AS lo, max(score) AS hi FROM scored)
        SELECT CAST(least(floor((score - lo) * 10.0 / (hi - lo)), 9) AS BIGINT) AS bin,
               count(*) AS n,
               round(avg(score), 6) AS mean_score,
               round(avg(CAST(pos AS DOUBLE)), 6) AS frac_pos
        FROM scored CROSS JOIN bounds
        GROUP BY 1
        ORDER BY bin
    """,
    "q_lift_deciles": f"""
        WITH scored AS ({_SCORED_SQL}),
        ranked AS (SELECT pos,
                          CAST(ntile(10) OVER (ORDER BY score DESC, vec_id) AS INTEGER) AS decile
                   FROM scored),
        base AS (SELECT avg(CAST(pos AS DOUBLE)) AS base_rate FROM scored)
        SELECT decile, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
               round(avg(CAST(pos AS DOUBLE)) / any_value(base_rate), 6) AS lift
        FROM ranked CROSS JOIN base
        GROUP BY decile
        ORDER BY decile
    """,
}


def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient at τ = 0 — the single-number
    confusion summary that stays honest under class imbalance (the
    metric quality-filter classifiers report when the positive class is
    rare, as it is in a 100 TB toxic/boilerplate sweep).

    MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN)). The four
    cells are exact integers from ONE aggregate; the products accumulate
    as DECIMAL(38,0) (BIGINT wraps near n = 3e9) and cast to identical
    doubles for the closing division, emitted as a fixed-point micro
    BIGINT (no round(double) in the hash).

    Scale shape: one map-side-combinable aggregate over the scored scan,
    no joins — q_confusion_binary's plan with a different closing row."""
    s = _scored(spark, sf_dir)
    pred = (F.col("score") >= 0.0).cast("bigint")
    m = s.agg(
        F.sum(pred * F.col("pos")).alias("tp"),
        F.sum(pred * (1 - F.col("pos"))).alias("fp"),
        F.sum((1 - pred) * F.col("pos")).alias("fn"),
        F.sum((1 - pred) * (1 - F.col("pos"))).alias("tn"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    num = dec("tp") * dec("tn") - dec("fp") * dec("fn")
    den = F.sqrt(
        ((dec("tp") + dec("fp")) * (dec("tp") + dec("fn"))).cast("double")
        * ((dec("tn") + dec("fp")) * (dec("tn") + dec("fn"))).cast("double")
    )
    # try_divide: a degenerate split (an empty predicted or actual class)
    # zeroes a marginal product; NULL beats engine-specific inf/NaN
    # division semantics (ADVICE r6, q_cramers_v discipline).
    return m.select(
        "tp", "fp", "fn", "tn",
        F.floor(
            F.try_divide(num.cast("double"), F.nullif(den, F.lit(0.0)))
            * 1000000.0 + F.lit(0.5)
        ).cast("bigint").alias("mcc_micro"),
    )


QUERIES["q_mcc"] = q_mcc

ORACLES["q_mcc"] = f"""
    WITH scored AS ({_SCORED_SQL}),
    m AS (
        SELECT sum(CASE WHEN score >= 0.0 AND pos = 1 THEN 1 ELSE 0 END) AS tp,
               sum(CASE WHEN score >= 0.0 AND pos = 0 THEN 1 ELSE 0 END) AS fp,
               sum(CASE WHEN score < 0.0 AND pos = 1 THEN 1 ELSE 0 END) AS fn,
               sum(CASE WHEN score < 0.0 AND pos = 0 THEN 1 ELSE 0 END) AS tn
        FROM scored
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(floor(CAST(CAST(tp AS DECIMAL(19,0)) * CAST(tn AS DECIMAL(19,0))
                           - CAST(fp AS DECIMAL(19,0)) * CAST(fn AS DECIMAL(19,0))
                           AS DOUBLE)
                      / nullif(sqrt(CAST((CAST(tp AS DECIMAL(19,0)) + CAST(fp AS DECIMAL(19,0)))
                                  * (CAST(tp AS DECIMAL(19,0)) + CAST(fn AS DECIMAL(19,0)))
                                  AS DOUBLE)
                             * CAST((CAST(tn AS DECIMAL(19,0)) + CAST(fp AS DECIMAL(19,0)))
                                    * (CAST(tn AS DECIMAL(19,0)) + CAST(fn AS DECIMAL(19,0)))
                                    AS DOUBLE)), 0.0)
                      * 1000000.0 + 0.5) AS BIGINT) AS mcc_micro
    FROM m
"""

def q_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + log-loss of the scored eval set — the proper scoring
    rules a probability-emitting quality classifier reports alongside
    rank metrics (AUC orders candidates; Brier/log-loss price the
    calibration of the probabilities a downstream sampler actually uses).

    The raw score is not a probability, so it maps through the min-max
    transform p = (score − min)/(max − min) (global min/max are a 1-row
    broadcast; the mapping is pure arithmetic, bit-identical across
    engines — deliberately NOT a logistic, whose exp() is libm-shaped).
    For log-loss p clamps to [1e-6, 1 − 1e-6]. Both metrics use the
    q_theil_index determinism discipline: per-row terms round to 6 and
    accumulate as DECIMAL(28,6) (order-free exact sums), closing with a
    single division emitted as fixed-point micro BIGINTs.

    Scale shape: one min/max aggregate + one map-side-combinable moments
    aggregate over the scored scan — two passes, no joins, O(1) state."""
    s = _scored(spark, sf_dir)
    ext = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    p = F.try_divide(F.col("score") - F.col("lo"), F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0)))
    pc = F.least(F.greatest(p, F.lit(1e-6)), F.lit(1.0 - 1e-6))
    brier_term = F.round((p - F.col("pos")) * (p - F.col("pos")), 6).cast("decimal(28,6)")
    ll_term = F.round(
        -(F.col("pos") * F.log(pc) + (1 - F.col("pos")) * F.log(F.lit(1.0) - pc)), 6
    ).cast("decimal(28,6)")
    agg = s.crossJoin(F.broadcast(ext)).agg(
        F.count("*").alias("n"),
        F.sum(brier_term).alias("sb"),
        F.sum(ll_term).alias("sl"),
    )
    return agg.select(
        "n",
        F.floor(F.col("sb").cast("double") / F.col("n") * 1000000.0 + F.lit(0.5))
        .cast("bigint").alias("brier_micro"),
        F.floor(F.col("sl").cast("double") / F.col("n") * 1000000.0 + F.lit(0.5))
        .cast("bigint").alias("logloss_micro"),
    )


QUERIES["q_brier"] = q_brier

ORACLES["q_brier"] = f"""
    WITH scored AS ({_SCORED_SQL}),
    ext AS (SELECT min(score) AS lo, max(score) AS hi FROM scored),
    terms AS (
        SELECT pos,
               (score - lo) / nullif(hi - lo, 0.0) AS p,
               least(greatest((score - lo) / nullif(hi - lo, 0.0), 1e-6),
                     1.0 - 1e-6) AS pc
        FROM scored, ext
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(floor(CAST(sum(CAST(round((p - pos) * (p - pos), 6)
                                    AS DECIMAL(28,6))) AS DOUBLE)
                      / count(*) * 1000000.0 + 0.5) AS BIGINT) AS brier_micro,
           CAST(floor(CAST(sum(CAST(round(-(pos * ln(pc)
                                            + (1 - pos) * ln(1.0 - pc)), 6)
                                    AS DECIMAL(28,6))) AS DOUBLE)
                      / count(*) * 1000000.0 + 0.5) AS BIGINT) AS logloss_micro
    FROM terms
"""


def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test: did swapping classifier A (coordinate-0
    score) for classifier B (coordinate-1 score) CHANGE accuracy, judged
    on the same eval rows — the right test when both models score one
    shared eval set, where the two-proportion z-test overstates
    significance by ignoring pairing.

    Cells count per-row agreement: n11 both correct … n00 both wrong; the
    continuity-corrected statistic (|n10 − n01| − 1)² / (n10 + n01) uses
    only the discordant cells. One conditional-count hash aggregate over
    the scan (the q_confusion_binary envelope — no joins, no window);
    integer cells are exact, the single closing division is emitted as
    fixed-point micros (correctly-rounded double ops on ≤2^53 integers).
    """
    t = load_tables(spark, sf_dir)
    pos = (F.col("label") >= 5).cast("int")
    a_ok = (
        ((F.col("embedding")[0].cast("double") + 0.05 * F.col("label")) >= 0.0).cast("int")
        == pos
    ).cast("int")
    b_ok = (
        ((F.col("embedding")[1].cast("double") + 0.05 * F.col("label")) >= 0.0).cast("int")
        == pos
    ).cast("int")
    s = t.embeddings.select(a_ok.alias("a"), b_ok.alias("b"))
    n11 = F.sum(F.col("a") * F.col("b"))
    n10 = F.sum(F.col("a") * (1 - F.col("b")))
    n01 = F.sum((1 - F.col("a")) * F.col("b"))
    n00 = F.sum((1 - F.col("a")) * (1 - F.col("b")))
    agg = s.agg(
        n11.cast("bigint").alias("n11"),
        n10.cast("bigint").alias("n10"),
        n01.cast("bigint").alias("n01"),
        n00.cast("bigint").alias("n00"),
    )
    disc = F.col("n10") + F.col("n01")
    num = (F.abs(F.col("n10") - F.col("n01")) - 1) * (F.abs(F.col("n10") - F.col("n01")) - 1)
    return agg.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.coalesce(
            F.floor(
                F.try_divide(num.cast("double"), F.nullif(disc.cast("double"), F.lit(0.0)))
                * 1000000.0
                + F.lit(0.5)
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("chi2_micro"),
    )


QUERIES["q_mcnemar"] = q_mcnemar

ORACLES["q_mcnemar"] = """
    WITH paired AS (
        SELECT CASE WHEN (CASE WHEN CAST(embedding[1] AS DOUBLE) + 0.05 * label >= 0.0
                               THEN 1 ELSE 0 END)
                       = (CASE WHEN label >= 5 THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS a,
               CASE WHEN (CASE WHEN CAST(embedding[2] AS DOUBLE) + 0.05 * label >= 0.0
                               THEN 1 ELSE 0 END)
                       = (CASE WHEN label >= 5 THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS b
        FROM embeddings
    ),
    m AS (
        SELECT CAST(sum(a * b) AS BIGINT) AS n11,
               CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
               CAST(sum((1 - a) * b) AS BIGINT) AS n01,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM paired
    )
    SELECT n11, n10, n01, n00,
           coalesce(
               CAST(floor(CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) AS DOUBLE)
                          / nullif(CAST(n10 + n01 AS DOUBLE), 0.0)
                          * 1000000.0 + 0.5) AS BIGINT),
               0) AS chi2_micro
    FROM m
"""


WOE_BINS = 10


def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value audit of the score feature —
    the credit-scoring-style per-bin evidence table a feature pipeline
    reports before admitting a signal into a quality classifier: WoE_b =
    ln(smoothed pos share / smoothed neg share) per equal-width score
    bin, IV contribution (pos share − neg share)·WoE_b.

    Smoothing adds 0.5 to each bin's class counts (Laplace half-count) so
    empty-class bins stay finite. Shares divide by the GLOBAL class
    totals (a 1-row broadcast, the q_lift_deciles base-rate idiom); bins
    come from the q_calibration_bins min/max-broadcast equal-width rule —
    two passes over the scan, aggregates keyed by a 10-value domain.
    Per-bin ln terms round to 6 (the q_brier log discipline).
    """
    s = _scored(spark, sf_dir)
    bounds = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    tot = s.agg(
        F.sum("pos").cast("double").alias("tot_pos"),
        F.sum(1 - F.col("pos")).cast("double").alias("tot_neg"),
    )
    binned = (
        s.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.least(
                F.floor(
                    (F.col("score") - F.col("lo")) * float(WOE_BINS) / (F.col("hi") - F.col("lo"))
                ),
                F.lit(WOE_BINS - 1),
            ).cast("bigint"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg"),
        )
    )
    ps = (F.col("n_pos") + 0.5) / F.col("tot_pos")
    ns = (F.col("n_neg") + 0.5) / F.col("tot_neg")
    woe = F.round(F.log(ps / ns), 6)
    out = binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        F.round(
            (F.col("n_pos") / F.col("tot_pos") - F.col("n_neg") / F.col("tot_neg")) * woe, 6
        ).alias("iv_term"),
    )
    return tiny_sorted(out, "bin")


QUERIES["q_woe_iv"] = q_woe_iv

ORACLES["q_woe_iv"] = f"""
    WITH scored AS ({_SCORED_SQL}),
    bounds AS (SELECT min(score) AS lo, max(score) AS hi FROM scored),
    tot AS (
        SELECT CAST(sum(pos) AS DOUBLE) AS tot_pos,
               CAST(sum(1 - pos) AS DOUBLE) AS tot_neg
        FROM scored
    ),
    binned AS (
        SELECT least(CAST(floor((score - lo) * {float(WOE_BINS)} / (hi - lo)) AS BIGINT),
                     {WOE_BINS - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(1 - pos) AS BIGINT) AS n_neg
        FROM scored, bounds
        GROUP BY 1
    )
    SELECT bin, n, n_pos, n_neg,
           round(ln(((n_pos + 0.5) / tot_pos) / ((n_neg + 0.5) / tot_neg)), 6) AS woe,
           round((n_pos / tot_pos - n_neg / tot_neg)
                 * round(ln(((n_pos + 0.5) / tot_pos) / ((n_neg + 0.5) / tot_neg)), 6),
                 6) AS iv_term
    FROM binned, tot
    ORDER BY bin
"""


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across THREE classifiers (coordinates 0/1/2 scores) on
    the shared eval set — the k-classifier generalization of q_mcnemar:
    does AT LEAST ONE of the candidate quality filters differ in
    accuracy, asked once before k·(k−1)/2 pairwise tests are even
    justified.

    Q = k(k−1)·Σ_j(T_j − S/k)² / (k·S − Σ_i R_i²) with T_j the per-model
    correct counts, R_i the per-row correct counts, S = ΣR_i. All
    sufficient statistics are exact integers from ONE conditional-count
    hash aggregate over the scan (R_i and R_i² are per-row expressions,
    so Σ and ΣR² are map-side combinable); multiplying the numerator by
    k² keeps it integer-exact — k²·ΣT² − S² over k·(k·S − ΣR²) — and the
    single closing division is emitted as fixed-point micros.
    """
    t = load_tables(spark, sf_dir)
    pos = (F.col("label") >= 5).cast("int")

    def ok(i: int):
        return (
            ((F.col("embedding")[i].cast("double") + 0.05 * F.col("label")) >= 0.0).cast("int")
            == pos
        ).cast("bigint")

    a, b, c = ok(0), ok(1), ok(2)
    r = a + b + c
    agg = t.embeddings.agg(
        F.count("*").alias("n_rows"),
        F.sum(a).alias("t1"),
        F.sum(b).alias("t2"),
        F.sum(c).alias("t3"),
        F.sum(r).alias("s"),
        F.sum(r * r).alias("s_r2"),
    )
    k = 3
    num = (
        F.lit(k - 1).cast("bigint")
        * (
            F.lit(k * k) * (F.col("t1") * F.col("t1") + F.col("t2") * F.col("t2") + F.col("t3") * F.col("t3"))
            - F.lit(k) * F.col("s") * F.col("s")
        )
    )
    den = F.lit(k).cast("bigint") * (F.lit(k) * F.col("s") - F.col("s_r2"))
    return agg.select(
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("t1").cast("bigint").alias("t1"),
        F.col("t2").cast("bigint").alias("t2"),
        F.col("t3").cast("bigint").alias("t3"),
        F.coalesce(
            F.floor(
                F.try_divide(num.cast("double"), F.nullif(den.cast("double"), F.lit(0.0)))
                * 1000000.0
                + F.lit(0.5)
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("q_micro"),
    )


QUERIES["q_cochran_q"] = q_cochran_q

ORACLES["q_cochran_q"] = """
    WITH paired AS (
        SELECT
          CASE WHEN (CASE WHEN CAST(embedding[1] AS DOUBLE) + 0.05 * label >= 0.0
                          THEN 1 ELSE 0 END)
                  = (CASE WHEN label >= 5 THEN 1 ELSE 0 END) THEN 1 ELSE 0 END AS a,
          CASE WHEN (CASE WHEN CAST(embedding[2] AS DOUBLE) + 0.05 * label >= 0.0
                          THEN 1 ELSE 0 END)
                  = (CASE WHEN label >= 5 THEN 1 ELSE 0 END) THEN 1 ELSE 0 END AS b,
          CASE WHEN (CASE WHEN CAST(embedding[3] AS DOUBLE) + 0.05 * label >= 0.0
                          THEN 1 ELSE 0 END)
                  = (CASE WHEN label >= 5 THEN 1 ELSE 0 END) THEN 1 ELSE 0 END AS c
        FROM embeddings
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(a) AS BIGINT) AS t1,
               CAST(sum(b) AS BIGINT) AS t2,
               CAST(sum(c) AS BIGINT) AS t3,
               CAST(sum(a + b + c) AS BIGINT) AS s,
               CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS s_r2
        FROM paired
    )
    SELECT n_rows, t1, t2, t3,
           coalesce(
               CAST(floor(
                   CAST(2 * (9 * (t1 * t1 + t2 * t2 + t3 * t3) - 3 * s * s) AS DOUBLE)
                   / nullif(CAST(3 * (3 * s - s_r2) AS DOUBLE), 0.0)
                   * 1000000.0 + 0.5) AS BIGINT),
               0) AS q_micro
    FROM m
"""


PSI_BINS = 10


def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index of the event-value distribution, first
    calendar half vs second — THE serving-drift number an ML-ops
    pipeline tracks per feature between training and serving windows:
    PSI = Σ_bins (p_b − q_b)·ln(p_b / q_b), with the conventional
    bands <0.1 stable / 0.1–0.25 drifting / >0.25 shifted.

    The period split is the exact micros midpoint of the min/max event
    time (a 1-row broadcast — no sort, no median); bins are 10
    equal-width over the global value range (same 1-row bounds idiom as
    q_calibration_bins); class counts get the 0.5 Laplace half-count so
    empty cells stay finite (the q_woe_iv convention — PSI is WoE·ΔP
    summed over bins of TIME rather than of label). Per-bin ln terms
    round to 6 and sum as DECIMAL(18,6) (order-free), so the scalar is
    engine-identical.

    Scale shape: two 1-row aggregates + one aggregate keyed by the
    10-bin domain — three passes over the scan-thin projection, no raw
    shuffle; at 100 TB the passes fuse into whatever window the feature
    store already materializes.
    """
    t = load_tables(spark, sf_dir)
    ev = t.events.select(F.unix_micros("ts").alias("us"), "value")
    bounds = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        ((F.min("us") + F.max("us")) / F.lit(2)).cast("bigint").alias("mid_us"),
    )
    binned = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo")) * float(PSI_BINS) / (F.col("hi") - F.col("lo"))
                ),
                F.lit(PSI_BINS - 1),
            ).cast("bigint").alias("bin"),
            (F.col("us") <= F.col("mid_us")).cast("bigint").alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(1 - F.col("is_ref")).alias("n_cur"),
        )
    )
    tot = binned.agg(
        F.sum("n_ref").cast("double").alias("tot_ref"),
        F.sum("n_cur").cast("double").alias("tot_cur"),
    )
    p = (F.col("n_ref") + 0.5) / F.col("tot_ref")
    q = (F.col("n_cur") + 0.5) / F.col("tot_cur")
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    scored = binned.crossJoin(F.broadcast(tot)).select(
        "bin", "n_ref", "n_cur", term.alias("term")
    )
    agg = scored.agg(
        F.count("*").alias("n_bins"),
        F.sum("n_ref").cast("bigint").alias("n_ref"),
        F.sum("n_cur").cast("bigint").alias("n_cur"),
        F.sum("term").alias("psi_sum"),
    )
    psi = F.col("psi_sum").cast("double")
    return agg.select(
        F.col("n_bins").cast("bigint").alias("n_bins"),
        "n_ref",
        "n_cur",
        F.floor(psi * 1000000.0 + F.lit(0.5)).cast("bigint").alias("psi_micro"),
        F.when(psi < 0.1, F.lit("stable"))
        .when(psi <= 0.25, F.lit("drifting"))
        .otherwise(F.lit("shifted"))
        .alias("band"),
    )


QUERIES["q_psi"] = q_psi

ORACLES["q_psi"] = f"""
    WITH ev AS (
        SELECT epoch_us(ts) AS us, value FROM events
    ),
    bounds AS (
        SELECT min(value) AS lo, max(value) AS hi,
               CAST(floor((min(us) + max(us)) / 2.0) AS BIGINT) AS mid_us
        FROM ev
    ),
    binned AS (
        SELECT least(CAST(floor((value - lo) * {float(PSI_BINS)} / (hi - lo)) AS BIGINT),
                     {PSI_BINS - 1}) AS bin,
               CAST(sum(CASE WHEN us <= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
               CAST(sum(CASE WHEN us <= mid_us THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
        FROM ev, bounds
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_ref) AS DOUBLE) AS tot_ref,
               CAST(sum(n_cur) AS DOUBLE) AS tot_cur
        FROM binned
    ),
    scored AS (
        SELECT bin, n_ref, n_cur,
               CAST(round(((n_ref + 0.5) / tot_ref - (n_cur + 0.5) / tot_cur)
                          * ln(((n_ref + 0.5) / tot_ref)
                               / ((n_cur + 0.5) / tot_cur)), 6)
                    AS DECIMAL(18,6)) AS term
        FROM binned, tot
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_bins,
               CAST(sum(n_ref) AS BIGINT) AS n_ref,
               CAST(sum(n_cur) AS BIGINT) AS n_cur,
               CAST(sum(term) AS DOUBLE) AS psi
        FROM scored
    )
    SELECT n_bins, n_ref, n_cur,
           CAST(floor(psi * 1000000.0 + 0.5) AS BIGINT) AS psi_micro,
           CASE WHEN psi < 0.1 THEN 'stable'
                WHEN psi <= 0.25 THEN 'drifting'
                ELSE 'shifted' END AS band
    FROM agg
"""
