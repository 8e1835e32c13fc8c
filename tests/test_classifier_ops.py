"""Invariant tests for the classifier-evaluation module
(operators/classifier.py). Bit-exact oracle parity lives in tools/check.py;
these check the metric identities and the plan shapes."""

from __future__ import annotations

from machinelearningalgomapreduce_spark.operators import classifier as C
from machinelearningalgomapreduce_spark.plans import inspect as P


def _python_auc(rows) -> float:
    pos = sorted(r.score for r in rows if r.pos == 1)
    neg = sorted(r.score for r in rows if r.pos == 0)
    import bisect

    u = 0.0
    for s in pos:
        lo = bisect.bisect_left(neg, s)
        hi = bisect.bisect_right(neg, s)
        u += lo + 0.5 * (hi - lo)
    return u / (len(pos) * len(neg))


def test_auc_matches_pairwise_recompute(spark, sf_dir):
    rows = C._scored(spark, sf_dir).collect()
    expected = round(_python_auc(rows), 6)
    got = C.q_auc(spark, sf_dir).collect()[0].auc
    assert got == expected
    # The 0.05·label leak makes the score genuinely discriminative.
    assert got > 0.6


def test_confusion_cells_partition_the_eval_set(spark, sf_dir):
    r = C.q_confusion_binary(spark, sf_dir).collect()[0]
    n = C._scored(spark, sf_dir).count()
    assert r.tp + r.fp + r.fn + r.tn == n
    assert abs(r.accuracy - (r.tp + r.tn) / n) < 1e-6


def test_recall_is_monotone_in_threshold(spark, sf_dir):
    rows = sorted(C.q_pr_threshold(spark, sf_dir).collect(), key=lambda r: r.threshold)
    recalls = [r.recall_ for r in rows]
    assert all(a >= b for a, b in zip(recalls, recalls[1:])), recalls
    for r in rows:
        if r.precision_ is not None and r.recall_ is not None and r.f1 is not None:
            assert 0.0 <= r.precision_ <= 1.0 and 0.0 <= r.recall_ <= 1.0
            assert min(r.precision_, r.recall_) - 1e-6 <= r.f1 <= max(r.precision_, r.recall_) + 1e-6


def test_calibration_bins_cover_every_row(spark, sf_dir):
    rows = C.q_calibration_bins(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == C._scored(spark, sf_dir).count()
    assert all(0 <= r.bin <= 9 for r in rows)
    assert all(0.0 <= r.frac_pos <= 1.0 for r in rows)
    # Mean scores must increase with the bin index (equal-width bins).
    means = [r.mean_score for r in sorted(rows, key=lambda r: r.bin)]
    assert means == sorted(means)


def test_lift_deciles_front_loads_the_positives(spark, sf_dir):
    rows = sorted(C.q_lift_deciles(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert len(rows) == 10
    assert sum(r.n for r in rows) == C._scored(spark, sf_dir).count()
    # Discriminative score: the top decile beats the bottom decile.
    assert rows[0].lift > rows[-1].lift
    # Lifts average (weighted) to ~1 by construction.
    total = sum(r.n for r in rows)
    assert abs(sum(r.lift * r.n for r in rows) / total - 1.0) < 0.01


def test_plan_shapes(spark, sf_dir):
    # Single-pass confusion: scan + one 1-row aggregate, no shuffle of rows.
    assert P.count_exchanges(C.q_confusion_binary(spark, sf_dir)) == 1
    # Threshold sweep: the grid crossJoin must be a broadcast, never a
    # cartesian of data × data.
    plan = P.formatted_plan(C.q_pr_threshold(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # AUC window runs over the per-distinct-score frame, after an aggregate.
    plan = P.formatted_plan(C.q_auc(spark, sf_dir))
    assert "Window" in plan and plan.count("HashAggregate") >= 2
