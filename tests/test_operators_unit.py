"""Per-operator unit tests on tiny hand-computed inputs (SURVEY.md §5.2.4):
edge cases the fixtures don't exercise — empty groups, ties, degenerate
windows, single-token docs."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


# --------------------------------------------------------------- sessionize

def test_sessionize_gap_boundaries(spark):
    from machinelearningalgomapreduce_spark.operators.events import sessionize

    events = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=ts(0), value=1.0),
            Row(event_id=2, user_id=1, ts=ts(30), value=1.0),   # exactly gap → same session
            Row(event_id=3, user_id=1, ts=ts(0) + datetime.timedelta(minutes=61), value=1.0),
            Row(event_id=4, user_id=2, ts=ts(5), value=1.0),    # other user independent
        ]
    )
    got = {r.event_id: r.session_seq for r in sessionize(events, 30).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_single_event_user(spark):
    from machinelearningalgomapreduce_spark.operators.events import sessionize

    events = spark.createDataFrame([Row(event_id=1, user_id=9, ts=ts(0), value=0.0)])
    [r] = sessionize(events).collect()
    assert (r.session_seq, r.is_new_session) == (1, 0)


# -------------------------------------------------------------------- hashing

def test_shingles_short_doc(spark):
    from machinelearningalgomapreduce_spark.functions.hashing import shingles

    df = spark.createDataFrame([("a b", 1), ("a b c d", 2)], ["text", "id"])
    got = {r.id: r.sh for r in df.select("id", shingles(F.col("text")).alias("sh")).collect()}
    assert got[1] == ["a b"]           # shorter than k → single truncated shingle
    assert got[2] == ["a b c", "b c d"]


def test_minhash_identical_docs_same_signature(spark):
    from machinelearningalgomapreduce_spark.functions.hashing import minhash_sig, shingles

    df = spark.createDataFrame([("x y z w", 1), ("x y z w", 2)], ["text", "id"])
    sig = df.select("id", minhash_sig(shingles(F.col("text")), seed=0).alias("s")).collect()
    assert sig[0].s == sig[1].s


# ---------------------------------------------------------------------- ml

def test_assign_nearest_tie_breaks_on_smaller_cluster_id(spark):
    from machinelearningalgomapreduce_spark.operators.ml import assign_nearest

    emb = spark.createDataFrame([Row(vec_id=1, label=0, embedding=[0.0, 0.0])])
    cents = spark.createDataFrame(
        [Row(label=5, centroid=[1.0, 0.0]), Row(label=3, centroid=[0.0, 1.0])]
    )
    [r] = assign_nearest(emb, cents).collect()
    assert r.cluster == 3  # equidistant → smaller cluster id wins


def test_linreg_recovers_exact_line(spark):
    from machinelearningalgomapreduce_spark.operators import ml

    # y = 3x + 2 exactly; grouped path via a fake lineitem-shaped frame
    rows = [Row(l_returnflag="A", l_quantity=float(x), l_extendedprice=3.0 * x + 2.0)
            for x in range(1, 6)]
    df = spark.createDataFrame(rows)
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    stats = df.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    [r] = stats.select(slope.alias("m"), ((sy - slope * sx) / n).alias("b")).collect()
    assert math.isclose(r.m, 3.0) and math.isclose(r.b, 2.0)


def test_label_centroids_orders_dimensions(spark):
    from machinelearningalgomapreduce_spark.operators.ml import label_centroids

    emb = spark.createDataFrame(
        [Row(vec_id=1, label=0, embedding=[1.0, 2.0, 3.0]),
         Row(vec_id=2, label=0, embedding=[3.0, 4.0, 5.0])]
    )
    [r] = label_centroids(emb).collect()
    assert r.centroid == [2.0, 3.0, 4.0]


# ------------------------------------------------------------------- pagerank

def test_pagerank_conserves_rank_on_cycle(spark, monkeypatch):
    from machinelearningalgomapreduce_spark.operators import graph

    # 2-cycle a→b→a: uniform ranks are the fixed point; one iteration must
    # return exactly 1/N ranks (within rounding).
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    monkeypatch.setattr(graph, "_edges", lambda s, d: edges)
    ranks = {r.node: r["rank"] for r in graph.q_pagerank(spark, "unused").collect()}
    assert ranks == {"a": 0.5, "b": 0.5}


# ------------------------------------------------------------------ quality

def test_quality_and_lang_id_single_token_doc(spark, monkeypatch, sf_dir):
    from machinelearningalgomapreduce_spark.operators import text as text_ops
    from machinelearningalgomapreduce_spark.sources import catalog

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the", lang="en", source="s", n_chars=3),
         Row(doc_id=2, text="zz", lang="en", source="s", n_chars=2)]
    )

    class FakeCat:
        documents = docs

    monkeypatch.setattr(text_ops, "load_tables", lambda s, d: FakeCat)
    q = {r.doc_id: r for r in text_ops.q_quality_score(spark, "unused").collect()}
    assert q[1].n_tokens == 1 and q[1].diversity == 1.0 and q[1].stop_frac == 1.0
    assert q[2].stop_frac == 0.0
    lang = {r.doc_id: r.lang_pred for r in text_ops.q_lang_id(spark, "unused").collect()}
    assert lang == {1: "en", 2: "unk"}


# -------------------------------------------------------------------- matmul

def test_matmul_tiny_coo(spark):
    # C = A·B for A=[[1,2]], B=[[3],[4]] in COO form → C[0,0] = 11
    a = spark.createDataFrame([(0, 0, 1.0), (0, 1, 2.0)], ["i", "k", "va"])
    b = spark.createDataFrame([(0, 0, 3.0), (1, 0, 4.0)], ["k", "j", "vb"])
    out = (
        a.join(b, "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("c_val"))
        .collect()
    )
    assert out == [Row(i=0, j=0, c_val=11.0)]


# ---------------------------------------------------------------- mllib fits

def test_kmeans_fit_runs(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.ml import kmeans_fit

    model, cost = kmeans_fit(spark, sf_dir, k=3)
    assert len(model.clusterCenters()) == 3
    assert cost > 0


def test_fpgrowth_fit_runs(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.graph import fpgrowth_fit

    model = fpgrowth_fit(spark, sf_dir, min_support=0.2)
    assert model.freqItemsets.count() > 0


def test_inverted_index_arrays_matches_string_form(spark, sf_dir):
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.text import (
        inverted_index_arrays,
        q_inverted_index,
    )

    typed = {
        r.token: (list(r.postings), r.df)
        for r in inverted_index_arrays(spark, sf_dir).collect()
    }
    checked = {
        r.token: (r.postings, r.df) for r in q_inverted_index(spark, sf_dir).collect()
    }
    assert set(typed) == set(checked)
    for token, (arr, df) in typed.items():
        s_post, s_df = checked[token]
        assert s_df == df
        assert ",".join(str(x) for x in arr) == s_post
