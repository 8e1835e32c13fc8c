"""Property-based differential testing (SURVEY.md §5.2.5): hypothesis
generates filter/aggregate predicates from a small ANSI-portable grammar;
each runs on Spark (spark.sql over the fixture view) AND DuckDB — counts
and checksums must agree. This fuzzes exactly the surface the hand-written
oracles cover pointwise."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engines(spark):
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    load_tables(spark, SF_DIR).orders.createOrReplaceTempView("orders_pv")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders_pv AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    return spark, con


_atoms = st.one_of(
    st.tuples(
        st.sampled_from(["<", ">=", "<=", ">"]),
        st.integers(min_value=0, max_value=500_000),
    ).map(lambda t: f"o_totalprice {t[0]} {t[1]}"),
    st.sampled_from(["'P'", "'O'", "'F'"]).map(lambda v: f"o_orderstatus = {v}"),
    st.tuples(
        st.integers(min_value=2, max_value=13), st.integers(min_value=0, max_value=12)
    ).map(lambda t: f"o_custkey % {t[0]} = {t[1] % t[0]}"),
    st.sampled_from(
        ["o_orderpriority IN ('1-URGENT', '2-HIGH')", "o_orderpriority NOT IN ('5-LOW')"]
    ),
)


@st.composite
def predicates(draw) -> str:
    n = draw(st.integers(min_value=1, max_value=3))
    parts = [draw(_atoms) for _ in range(n)]
    ops = [draw(st.sampled_from(["AND", "OR"])) for _ in range(n - 1)]
    out = parts[0]
    for op, p in zip(ops, parts[1:]):
        out = f"({out}) {op} ({p})"
    return out


@given(pred=predicates())
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_filter_counts_match_duckdb(engines, pred):
    spark, con = engines
    sql = (
        "SELECT count(*) AS n, round(coalesce(sum(o_totalprice), 0), 2) AS s "
        f"FROM orders_pv WHERE {pred}"
    )
    s_row = spark.sql(sql).first()
    d_row = con.execute(sql).fetchone()
    assert (s_row.n, s_row.s) == (d_row[0], d_row[1]), pred


@given(
    key=st.sampled_from(["o_orderstatus", "o_orderpriority"]),
    pred=predicates(),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_grouped_aggregates_match_duckdb(engines, key, pred):
    spark, con = engines
    sql = (
        f"SELECT {key} AS k, count(*) AS n, round(avg(o_totalprice), 6) AS a "
        f"FROM orders_pv WHERE {pred} GROUP BY {key}"
    )
    s = {r.k: (r.n, r.a) for r in spark.sql(sql).collect()}
    d = {row[0]: (row[1], row[2]) for row in con.execute(sql).fetchall()}
    assert set(s) == set(d), pred
    for k, (n, a) in s.items():
        dn, da = d[k]
        assert n == dn, (pred, k)
        # avg over an arbitrary predicate slice can land within one float
        # ulp of a round-6 grid boundary (sum-order drift), making the two
        # engines round to ADJACENT grid points — allow exactly one step.
        # (Hand-written oracles avoid this class by rounding ratios of
        # bounded magnitude or using decimal-exact sums.)
        assert a == pytest.approx(da, abs=1.1e-6), (pred, k)


# --- Text-surface differential: random tiny corpora (empty docs, single
# tokens, repeated tokens) through the SAME tokenize/shingle expressions the
# text/dedup oracles rely on pointwise.

_words = st.sampled_from(["a", "b", "ab", "x", "a"])
_doc = st.lists(_words, min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@given(texts=_corpus)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_wordcount_matches_duckdb_on_random_corpora(engines, texts):
    import pandas as pd
    from pyspark.sql import functions as F

    spark, con = engines
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    got = {
        (r.token, r.n, r.d)
        for r in sdf.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    con.register("wc_pv", pdf)
    want = set(
        map(
            tuple,
            con.execute(
                "SELECT token, count(*) AS n, count(DISTINCT doc_id) AS d "
                "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM wc_pv) "
                "GROUP BY token"
            ).fetchall(),
        )
    )
    assert got == want, texts


@given(texts=_corpus)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bigram_shingles_match_duckdb_on_random_corpora(engines, texts):
    import pandas as pd
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.functions.hashing import shingles

    spark, con = engines
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    # Set comparison: DuckDB's list_distinct does not preserve occurrence
    # order (the production oracles only ever use shingle arrays in set
    # operations — list_filter/list_contains — so order never matters there).
    got = {
        (r.doc_id, frozenset(r.ng))
        for r in sdf.select(
            "doc_id", F.array_distinct(shingles(F.col("text"), k=2)).alias("ng")
        ).collect()
    }
    con.register("sh_pv", pdf)
    want = {
        (row[0], frozenset(row[1]))
        for row in con.execute(
            """SELECT doc_id,
                      list_distinct(list_transform(
                          range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
                          i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS ng
               FROM sh_pv"""
        ).fetchall()
    }
    assert got == want, texts


# --- Timestamp-semantics differential: random microsecond epochs through
# the ns→µs/date_trunc/bucketing expressions the events oracles rely on.

_epochs = st.lists(
    st.integers(min_value=1_500_000_000_000_000, max_value=1_800_000_000_000_000),
    min_size=1,
    max_size=40,
)


@given(micros=_epochs)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hour_bucketing_matches_duckdb_on_random_timestamps(engines, micros):
    import pandas as pd
    from pyspark.sql import functions as F

    spark, con = engines
    sdf = spark.createDataFrame([(m,) for m in micros], "us long").select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    got = sorted(
        (r.h, r.n)
        for r in sdf.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    pdf = pd.DataFrame({"us": micros})
    con.register("ts_pv", pdf)
    want = sorted(
        map(
            tuple,
            con.execute(
                "SELECT CAST(date_trunc('hour', make_timestamp(us)) AS TIMESTAMP) AS h, "
                "count(*) AS n FROM ts_pv GROUP BY 1"
            ).fetchall(),
        )
    )
    assert got == want, micros[:5]


_ema_lists = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    min_size=1,
    max_size=60,
)


@given(vals=_ema_lists)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ema_fold_bit_identical_to_duckdb_list_reduce(engines, vals):
    """The q_ema contract rests on Spark's seeded F.aggregate fold being
    BIT-identical to DuckDB's list_reduce — fuzz that equivalence on
    arbitrary double sequences (no rounding: exact equality)."""
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.events import EMA_ALPHA

    spark, con = engines
    sdf = spark.createDataFrame([(vals,)], "vals: array<double>")
    fold = F.aggregate(
        F.slice("vals", 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at("vals", 1),
        lambda acc, x: EMA_ALPHA * x + (1 - EMA_ALPHA) * acc,
    )
    got = sdf.select(fold.alias("e")).collect()[0].e
    want = con.execute(
        f"SELECT list_reduce(?::DOUBLE[], (acc, x) -> {EMA_ALPHA} * x + {1 - EMA_ALPHA} * acc)",
        [vals],
    ).fetchone()[0]
    assert got == want, vals[:5]


_event_seqs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # user
        st.integers(min_value=0, max_value=5),     # ts (small pool -> ties)
        st.sampled_from(["a", "b", "c"]),          # type
    ),
    min_size=2,
    max_size=40,
)


@given(seq=_event_seqs)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_lag_transitions_match_duckdb_under_ts_ties(engines, seq):
    """Markov-transition counting depends on lag ordering; duplicate
    timestamps force the (ts, event_id) tie-break to carry the order in
    BOTH engines."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    spark, con = engines
    rows = [(i, u, t, ty) for i, (u, t, ty) in enumerate(seq)]
    sdf = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    got = sorted(
        (r.p, r.n, r.c)
        for r in sdf.withColumn("p", F.lag("event_type").over(w))
        .filter(F.col("p").isNotNull())
        .groupBy("p", F.col("event_type").alias("n"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    con.register("ev_pv", pdf)
    want = sorted(
        map(
            tuple,
            con.execute(
                """
                SELECT p, event_type, count(*) FROM (
                    SELECT event_type,
                           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
                    FROM ev_pv
                ) WHERE p IS NOT NULL GROUP BY 1, 2
                """
            ).fetchall(),
        )
    )
    assert got == want, seq[:5]


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    names=st.lists(
        st.text(alphabet="abcde ", min_size=1, max_size=12).filter(str.strip),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
def test_fuzzy_band_join_complete_vs_brute_force(spark, names):
    """The length-banded candidate generation of q_fuzzy_join must find
    EXACTLY the pairs a brute-force all-pairs Levenshtein scan finds —
    banding may never lose a ≤2-edit pair (completeness) nor duplicate
    one (the g == greatest(band) dedup rule)."""
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.export import (
        FUZZY_BAND,
        FUZZY_MAX_DIST,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if lev(a, b) <= FUZZY_MAX_DIST
    }
    want = {(min(p), max(p)) for p in want}

    df = spark.createDataFrame([(n,) for n in names], ["p_name"])
    probes = df.select(
        "p_name",
        F.length("p_name").alias("len"),
        F.expr(f"length(p_name) div {FUZZY_BAND}").alias("band"),
        F.explode(
            F.array(
                F.expr(f"length(p_name) div {FUZZY_BAND}"),
                F.expr(f"length(p_name) div {FUZZY_BAND} + 1"),
            )
        ).alias("g"),
    )
    a = probes.select(
        F.col("p_name").alias("name_a"), F.col("len").alias("len_a"),
        F.col("band").alias("band_a"), "g",
    )
    b = probes.select(
        F.col("p_name").alias("name_b"), F.col("len").alias("len_b"),
        F.col("band").alias("band_b"), "g",
    )
    got_rows = (
        a.join(b, "g")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.col("g") == F.greatest("band_a", "band_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= FUZZY_MAX_DIST)
            & (F.levenshtein("name_a", "name_b") <= FUZZY_MAX_DIST)
        )
        .select("name_a", "name_b")
        .collect()
    )
    got_list = [(r.name_a, r.name_b) for r in got_rows]
    assert len(got_list) == len(set(got_list)), "banding produced duplicate pairs"
    assert set(got_list) == want


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=40)
)
def test_seq_pack_partition_invariants(spark, toks):
    """Packing invariants on random token lengths: every doc lands in
    exactly one window; window token sums partition the total; window ids
    are exactly the distinct floor(start/CTX) values in doc order."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from machinelearningalgomapreduce_spark.operators.export import CTX_LEN

    rows = [(i, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    w = W.orderBy("doc_id")
    packed = (
        df.withColumn("cum", F.sum("n_tok").over(w))
        .withColumn("start", F.col("cum") - F.col("n_tok"))
        .withColumn("win_id", F.expr(f"start div {CTX_LEN}"))
    )
    agg = packed.groupBy("win_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    out = {r.win_id: (r.n_docs, r.n_tokens) for r in agg.collect()}
    assert sum(d for d, _ in out.values()) == len(toks)
    assert sum(t for _, t in out.values()) == sum(toks)
    # Python reference: greedy streaming-concat window of each doc's start.
    start, want = 0, {}
    for n in toks:
        wid = start // CTX_LEN
        d, t = want.get(wid, (0, 0))
        want[wid] = (d + 1, t + n)
        start += n
    assert out == want


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    ys=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
)
def test_ks_crossmult_matches_python_ecdf(spark, xs, ys):
    """The integer cross-multiplied KS pipeline (q_ks_test's shape) equals
    the textbook max|ECDF_a − ECDF_b| computed in exact fractions —
    including tie handling at shared values."""
    from fractions import Fraction

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    rows = [(float(v), "a") for v in xs] + [(float(v), "b") for v in ys]
    df = spark.createDataFrame(rows, ["value", "grp"])
    per_value = df.groupBy("value").agg(
        F.sum((F.col("grp") == "a").cast("bigint")).alias("na"),
        F.sum((F.col("grp") == "b").cast("bigint")).alias("nb"),
    )
    w = W.orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    cum = per_value.select(
        F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb")
    )
    d_num = cum.agg(
        F.max(F.abs(F.col("ca") * len(ys) - F.col("cb") * len(xs))).alias("d")
    ).first()[0]
    got = Fraction(int(d_num), len(xs) * len(ys))

    want = Fraction(0)
    for v in sorted(set(xs) | set(ys)):
        fa = Fraction(sum(1 for x in xs if x <= v), len(xs))
        fb = Fraction(sum(1 for y in ys if y <= v), len(ys))
        want = max(want, abs(fa - fb))
    assert got == want
