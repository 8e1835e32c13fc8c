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


# --------------------------------------------- evaluation-stats operators

def _round6(x: float) -> float:
    """Spark F.round semantics (HALF_UP) — python round() is banker's."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


@given(
    counts=st.dictionaries(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 3)),
        st.integers(min_value=1, max_value=40),
        min_size=4,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow  # heavy lane, run with -m slow (pytest.ini r16)
def test_chi2_contingency_matches_python(spark, counts):
    """q_chi2's broadcast-marginal pipeline on a random contingency table
    equals the textbook chi-squared computed independently in Python
    (expected = rt*ct/N per cell)."""
    from pyspark.sql import functions as F

    rows = [(t, b, n) for (t, b), n in counts.items()]
    cells = spark.createDataFrame(rows, ["event_type", "band", "n"])
    row_tot = cells.groupBy("event_type").agg(F.sum("n").alias("rt"))
    col_tot = cells.groupBy("band").agg(F.sum("n").alias("ct"))
    grand = cells.agg(F.sum("n").alias("nn"))
    expected = F.col("rt") * F.col("ct") / F.col("nn").cast("double")
    term = (F.col("n") - expected) * (F.col("n") - expected) / expected
    got = (
        cells.join(F.broadcast(row_tot), "event_type")
        .join(F.broadcast(col_tot), "band")
        .crossJoin(F.broadcast(grand))
        .agg(F.sum(term).alias("chi2"))
        .first()
        .chi2
    )

    rt = {}
    ct = {}
    for (t, b), n in counts.items():
        rt[t] = rt.get(t, 0) + n
        ct[b] = ct.get(b, 0) + n
    nn = sum(counts.values())
    want = 0.0
    for (t, b), n in counts.items():
        e = rt[t] * ct[b] / nn
        want += (n - e) ** 2 / e
    assert abs(got - want) <= 1e-9 * max(1.0, want)


@given(
    xs=st.lists(st.integers(0, 10_000_000).map(lambda v: v / 1e6), min_size=3, max_size=30),
    ys=st.lists(st.integers(0, 10_000_000).map(lambda v: v / 1e6), min_size=3, max_size=30),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_welch_t_decimal_pipeline_matches_python(spark, xs, ys):
    """q_ab_test's DECIMAL-accumulated Welch pipeline on random ≤6-dp
    metrics equals the textbook two-sample computation in Python (exact
    Fractions for Σx/Σx², then one float conversion) — including the
    degenerate zero-variance case guarded out by hypothesis."""
    from fractions import Fraction

    from hypothesis import assume
    from pyspark.sql import functions as F

    # Constant groups make the pooled variance 0 and t undefined — discard
    # the example (assume), never skip the whole test.
    assume(len(set(xs)) > 1 or len(set(ys)) > 1)
    rows = [(0, float(v)) for v in xs] + [(1, float(v)) for v in ys]
    df = spark.createDataFrame(rows, ["grp", "value"])
    dec = F.col("value").cast("decimal(18,6)")
    even = F.col("grp") == 0
    agg = df.agg(
        F.sum(even.cast("bigint")).alias("n0"),
        F.sum(F.when(even, dec)).alias("sx0"),
        F.sum(F.when(even, dec * dec)).alias("sxx0"),
        F.sum((~even).cast("bigint")).alias("n1"),
        F.sum(F.when(~even, dec)).alias("sx1"),
        F.sum(F.when(~even, dec * dec)).alias("sxx1"),
    )
    n0c, n1c = F.col("n0").cast("double"), F.col("n1").cast("double")
    sx0, sxx0 = F.col("sx0").cast("double"), F.col("sxx0").cast("double")
    sx1, sxx1 = F.col("sx1").cast("double"), F.col("sxx1").cast("double")
    m0, m1 = sx0 / n0c, sx1 / n1c
    v0 = (sxx0 - sx0 * sx0 / n0c) / (n0c - 1)
    v1 = (sxx1 - sx1 * sx1 / n1c) / (n1c - 1)
    got = agg.select(((m1 - m0) / F.sqrt(v0 / n0c + v1 / n1c)).alias("t")).first().t

    def frac_stats(vals):
        fs = [Fraction(repr(v)) for v in vals]
        n = len(fs)
        sx = sum(fs)
        sxx = sum(f * f for f in fs)
        return n, sx, sxx

    n0, fx0, fxx0 = frac_stats(xs)
    n1, fx1, fxx1 = frac_stats(ys)
    m0p, m1p = fx0 / n0, fx1 / n1
    v0p = (fxx0 - fx0 * fx0 / n0) / (n0 - 1)
    v1p = (fxx1 - fx1 * fx1 / n1) / (n1 - 1)
    denom = float(v0p / n0 + v1p / n1) ** 0.5
    assume(denom > 0)
    want = float(m1p - m0p) / denom
    assert abs(got - want) <= 1e-6 * max(1.0, abs(want))


@given(
    vals=st.lists(st.integers(-200, 200).map(lambda v: v / 4), min_size=5, max_size=40)
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_iqr_fence_flags_match_python(spark, vals):
    """q_outlier_iqr's percentile+fence decision on quarter-valued data
    (exact in binary, so linear interpolation is bit-identical across
    implementations) matches an independent Python fence computation
    row for row."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(float(v),) for v in vals], ["value"])
    fences = df.agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("q3"),
    )
    lo = F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 6)
    hi = F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 6)
    got = (
        df.crossJoin(F.broadcast(fences))
        .agg(F.sum(((F.col("value") < lo) | (F.col("value") > hi)).cast("bigint")).alias("k"))
        .first()
        .k
    )

    s = sorted(vals)
    n = len(s)

    def pct(p):
        pos = p * (n - 1)
        i = int(pos)
        frac = pos - i
        v = s[i] if frac == 0 else s[i] + frac * (s[i + 1] - s[i])
        return _round6(v)

    q1, q3 = pct(0.25), pct(0.75)
    lo_p = _round6(q1 - 1.5 * (q3 - q1))
    hi_p = _round6(q3 + 1.5 * (q3 - q1))
    want = sum(1 for v in vals if v < lo_p or v > hi_p)
    assert got == want


@given(
    vecs=st.lists(
        st.lists(st.integers(-100, 100).map(lambda v: v / 8), min_size=4, max_size=4),
        min_size=3,
        max_size=12,
    ),
    cents=st.lists(
        st.lists(st.integers(-100, 100).map(lambda v: v / 8), min_size=4, max_size=4),
        min_size=2,
        max_size=4,
        unique_by=tuple,
    ),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_silhouette_nearest_two_pick_matches_python(spark, vecs, cents):
    """q_silhouette's array_sort((dist2, cluster)) nearest-two selection on
    random vectors equals an independent Python argmin (same sequential
    fold order, same HALF_UP round-6, same cluster-id tie-break), and
    every s value lands in [-1, 1]."""
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.functions.vectors import sq_dist

    vdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    cdf = spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(cents)], ["cluster", "centroid"]
    )
    dist2 = F.round(sq_dist(F.col("embedding"), F.col("centroid"), 4), 6)
    best2 = (
        vdf.crossJoin(F.broadcast(cdf))
        .select("vec_id", "cluster", dist2.alias("dist2"))
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("dist2", "cluster"))).alias("srt"))
        .select(
            "vec_id",
            F.col("srt")[0]["cluster"].alias("cluster"),
            F.col("srt")[0]["dist2"].alias("a2"),
            F.col("srt")[1]["dist2"].alias("b2"),
        )
    )
    got = {r.vec_id: (r.cluster, r.a2, r.b2) for r in best2.collect()}

    for i, v in enumerate(vecs):
        ds = []
        for j, c in enumerate(cents):
            acc = 0.0
            for k in range(4):
                d = float(v[k]) - float(c[k])
                acc = acc + d * d
            ds.append((_round6(acc), j))
        ds.sort()
        (a2, cl), (b2, _) = ds[0], ds[1]
        assert got[i] == (cl, a2, b2), (i, got[i], (cl, a2, b2))
        a, b = a2 ** 0.5, b2 ** 0.5
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        assert -1.0 <= s <= 1.0


# --- Rank-statistic differential: the doubled tie-averaged rank identity
# (q_spearman / q_kruskal_wallis discipline) on random small-domain integer
# rows — adversarial tie structure, exact integer moments in both engines.

_rank_rows = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=2,
    max_size=24,
)


@given(rows=_rank_rows)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_tie_averaged_rank_moments_match_duckdb(engines, rows):
    spark, con = engines
    values = ", ".join(f"('{g}', {x}, {y})" for g, x, y in rows)
    base = f"(SELECT * FROM (VALUES {values}) AS t(g, x, y))"
    sql = f"""
        WITH ranked AS (
            SELECT g,
                   CAST(2 * rank() OVER (PARTITION BY g ORDER BY x)
                        + count(*) OVER (PARTITION BY g, x) - 1 AS BIGINT) AS rx,
                   CAST(2 * rank() OVER (PARTITION BY g ORDER BY y)
                        + count(*) OVER (PARTITION BY g, y) - 1 AS BIGINT) AS ry
            FROM {base}
        )
        SELECT g, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
               sum(rx * ry) AS sxy, sum(rx * rx) AS sxx
        FROM ranked GROUP BY g
    """
    s = {r.g: (r.n, r.sx, r.sy, r.sxy, r.sxx) for r in spark.sql(sql).collect()}
    d = {row[0]: tuple(int(v) for v in row[1:]) for row in con.execute(sql).fetchall()}
    assert s == d
    # Sanity identity: per group Σrx = n(n+1) (doubled ranks sum to 2·Σi).
    for g, (n, sx, sy, *_rest) in s.items():
        assert sx == n * (n + 1) and sy == n * (n + 1)


# --- Fixed-point half-up differential: the floor((2N+D)/(2D)) identity the
# rating-baseline oracle depends on must evaluate identically in BOTH
# engines, including exact-half numerators where round(double) diverges.

_fixed_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(10**9), max_value=10**9),
        st.integers(min_value=1, max_value=10**4),
    ),
    min_size=1,
    max_size=20,
)


@given(rows=_fixed_rows)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fixed_point_half_up_matches_duckdb(engines, rows):
    spark, con = engines
    # Force exact halves into the sample: N = k*D + D/2 shapes.
    rows = rows + [(d * 7 + (d // 2), d) for _, d in rows[:3]]
    values = ", ".join(f"({n}, {d})" for n, d in rows)
    sql = (
        "SELECT n, d, CAST(floor(CAST(2 * n + d AS DOUBLE) / CAST(2 * d AS DOUBLE)) "
        "AS BIGINT) AS r "
        f"FROM (VALUES {values}) AS t(n, d)"
    )
    s = {(r.n, r.d): r.r for r in spark.sql(sql).collect()}
    d_ = {(row[0], row[1]): int(row[2]) for row in con.execute(sql).fetchall()}
    assert s == d_
    # And the value really is round-half-up of the exact rational.
    from decimal import Decimal

    for (n, dd), r in s.items():
        q, rem = divmod(2 * n + dd, 2 * dd)
        assert r == q  # floor of the exact rational (both engines exact ≤ 2^53)
