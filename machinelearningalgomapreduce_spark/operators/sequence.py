"""Sequence models over per-user event streams (SURVEY.md §2C library tier).

The MapReduce-era ML catalogs ship an HMM family (sequence scoring +
decoding) built as one job per user-partition; here the same semantics are
Spark-first:

- ``hmm_forward`` — the scaled forward algorithm, entirely JVM-side:
  each user's observation sequence is assembled with one aggregation
  (``array_sort(collect_list(...))`` — deterministic order via the
  (ts, event_id) sort key) and the per-step recursion runs inside
  ``F.aggregate`` over that array with an ``array<double>`` accumulator.
  No Python executes per row; the model (K states, V observation symbols)
  is a set of literal arrays baked into the plan and shipped with the
  serialized expressions. Scale shape: ONE shuffle (the groupBy user),
  then a narrow map stage — sequences never leave the JVM, state is
  O(K) per row, and 100 TB of events decompose into independent user
  groups exactly like the reference's per-key MapReduce partitioning.

- ``viterbi_decode`` — max-product decoding with backtrace. The
  backpointer table makes this genuinely imperative, so it is an
  Arrow-batched ``applyInPandas`` over the same user grouping with a
  vectorized numpy kernel (O(T·K²) per sequence, K=3): the sanctioned
  slow path, kept off any oracle-checked query. Output is one row per
  (user, position) with the decoded state.

Both consume the model via module-level constants so tests and library
callers share one ground truth; ``hmm_loglik_reference`` is the numpy
twin used by the differential tests.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Toy 3-state HMM over the fixture's five event types. Rows of TRANS and
# EMIT sum to 1; INIT sums to 1. Values are exact binary fractions where
# convenient but nothing here relies on that — the forward pass is scaled
# (log-likelihood accumulated driver-free) so it is numerically stable for
# arbitrarily long sequences.
HMM_STATES = 3
HMM_TYPES = ("click", "view", "purchase", "signup", "error")
HMM_INIT = (0.5, 0.25, 0.25)
HMM_TRANS = (
    (0.70, 0.20, 0.10),
    (0.15, 0.70, 0.15),
    (0.25, 0.25, 0.50),
)
# EMIT[state][symbol] — P(event_type | state).
HMM_EMIT = (
    (0.40, 0.30, 0.05, 0.05, 0.20),
    (0.10, 0.20, 0.45, 0.15, 0.10),
    (0.20, 0.10, 0.10, 0.40, 0.20),
)


def _lit_vec(vals) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _lit_mat(rows) -> F.Column:
    return F.array(*[_lit_vec(r) for r in rows])


def _emit_map() -> F.Column:
    """map<event_type, array<double>>: the emission column for a symbol
    across states — the per-step lookup the forward recursion needs."""
    pairs = []
    for j, sym in enumerate(HMM_TYPES):
        pairs.append(F.lit(sym))
        pairs.append(_lit_vec([HMM_EMIT[i][j] for i in range(HMM_STATES)]))
    return F.create_map(*pairs)


def user_sequences(events: DataFrame) -> DataFrame:
    """(user_id, obs array<string>) — each user's event types in time
    order. collect_list order is not deterministic, so the sort key rides
    inside the collected structs: (ts, event_id) is unique per fixture
    row and array_sort orders lexicographically by field position."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ).alias("obs")
        )
    )


def hmm_forward(events: DataFrame) -> DataFrame:
    """Scaled forward pass per user, JVM-side.

    alpha_0 = init ⊙ e(o_0);  alpha_t = (alpha_{t-1}ᵀ · TRANS) ⊙ e(o_t);
    each step renormalizes alpha to sum 1 and adds log(scale) to the
    log-likelihood, so ``loglik`` = log P(o_0..o_{T-1} | model) exactly
    (up to float associativity) and alpha never underflows.

    Output: (user_id, n_obs, loglik double, alpha array<double> — the
    filtering distribution after the last observation).
    """
    trans = _lit_mat(HMM_TRANS)
    emit = _emit_map()
    k = F.sequence(F.lit(1), F.lit(HMM_STATES))  # 1-based state indices

    def scale_step(unnorm: F.Column, ll: F.Column) -> F.Column:
        c = F.aggregate(unnorm, F.lit(0.0), lambda a, x: a + x)
        return F.struct(
            F.transform(unnorm, lambda x: x / c).alias("alpha"),
            (ll + F.log(c)).alias("loglik"),
        )

    def step(acc: F.Column, o: F.Column) -> F.Column:
        # raw_j = Σ_i alpha_i · TRANS[i][j], then ⊙ emission column of o.
        raw = F.transform(
            k,
            lambda j: F.aggregate(
                F.sequence(F.lit(1), F.lit(HMM_STATES)),
                F.lit(0.0),
                lambda a, i: a
                + F.element_at(acc["alpha"], i) * F.element_at(F.element_at(trans, i), j),
            ),
        )
        unnorm = F.zip_with(raw, F.element_at(emit, o), lambda x, e: x * e)
        return scale_step(unnorm, acc["loglik"])

    first = F.zip_with(_lit_vec(HMM_INIT), F.element_at(emit, F.element_at("obs", 1)),
                       lambda x, e: x * e)
    init_acc = scale_step(first, F.lit(0.0))
    rest = F.slice("obs", 2, F.greatest(F.size("obs") - 1, F.lit(0)))
    return user_sequences(events).select(
        "user_id",
        F.size("obs").alias("n_obs"),
        F.aggregate(rest, init_acc, step).alias("fwd"),
    ).select(
        "user_id",
        "n_obs",
        F.col("fwd.loglik").alias("loglik"),
        F.col("fwd.alpha").alias("alpha"),
    )


def hmm_loglik_reference(obs: list[str]) -> float:
    """Pure-Python forward pass (differential-test twin of hmm_forward)."""
    sym = {s: j for j, s in enumerate(HMM_TYPES)}
    alpha = [HMM_INIT[i] * HMM_EMIT[i][sym[obs[0]]] for i in range(HMM_STATES)]
    ll = 0.0
    c = sum(alpha)
    alpha = [a / c for a in alpha]
    ll += math.log(c)
    for o in obs[1:]:
        j_o = sym[o]
        raw = [
            sum(alpha[i] * HMM_TRANS[i][j] for i in range(HMM_STATES)) * HMM_EMIT[j][j_o]
            for j in range(HMM_STATES)
        ]
        c = sum(raw)
        alpha = [r / c for r in raw]
        ll += math.log(c)
    return ll


VITERBI_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("state", T.IntegerType()),
    ]
)


def _viterbi_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Numpy Viterbi with backtrace for one user's sequence (log-space —
    no scaling needed because max-product only compares, never sums)."""
    import numpy as np

    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    sym = {s: j for j, s in enumerate(HMM_TYPES)}
    obs = pdf["event_type"].map(sym).to_numpy()
    n = len(obs)
    log_t = np.log(np.asarray(HMM_TRANS))
    log_e = np.log(np.asarray(HMM_EMIT))
    delta = np.log(np.asarray(HMM_INIT)) + log_e[:, obs[0]]
    back = np.zeros((n, HMM_STATES), dtype="int64")
    for t in range(1, n):
        cand = delta[:, None] + log_t  # cand[i, j]
        back[t] = cand.argmax(axis=0)
        delta = cand.max(axis=0) + log_e[:, obs[t]]
    path = np.zeros(n, dtype="int64")
    path[-1] = int(delta.argmax())
    for t in range(n - 1, 0, -1):
        path[t - 1] = back[t, path[t]]
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"].to_numpy(),
            "pos": np.arange(n, dtype="int32"),
            "event_type": pdf["event_type"].to_numpy(),
            "state": path.astype("int32"),
        }
    )


def viterbi_decode(events: DataFrame) -> DataFrame:
    """Most-likely hidden state path per user (argmax over state paths).

    Arrow-batched applyInPandas keyed by user: the backpointer table is
    inherently imperative, so this is the sanctioned Pandas-UDF slow path;
    the grouping shuffle is the SAME single exchange hmm_forward pays, and
    per-group work is O(T·K²) with K=3. Kept off oracle-checked queries.
    """
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(_viterbi_group, schema=VITERBI_SCHEMA)
    )


BW_STATS_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # 'init' | 'trans' | 'emit' | 'll'
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _bw_group_stats(model: dict):
    """Per-user E-step: scaled forward-backward → expected-count rows.

    Emitted rows: ('init', i, 0, γ_0(i)), ('trans', i, j, Σ_t ξ_t(i,j)),
    ('emit', i, v, Σ_t γ_t(i)·[o_t = v]), ('ll', 0, 0, log P(obs)).
    The M-step is then ONE tiny groupBy over (kind, i, j) — the sufficient
    statistics of EM are sums over independent sequences, which is exactly
    the map/reduce decomposition the MapReduce-era HMM trainers used.
    """
    init = model["init"]
    trans = model["trans"]
    emit = model["emit"]

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        sym = {s: j for j, s in enumerate(HMM_TYPES)}
        obs = pdf["event_type"].map(sym).to_numpy()
        n, k = len(obs), len(init)
        a = np.asarray(trans)
        e = np.asarray(emit)
        pi = np.asarray(init)
        # scaled forward
        alpha = np.zeros((n, k))
        scale = np.zeros(n)
        alpha[0] = pi * e[:, obs[0]]
        scale[0] = alpha[0].sum()
        alpha[0] /= scale[0]
        for t in range(1, n):
            alpha[t] = (alpha[t - 1] @ a) * e[:, obs[t]]
            scale[t] = alpha[t].sum()
            alpha[t] /= scale[t]
        # scaled backward (same scale factors)
        beta = np.zeros((n, k))
        beta[-1] = 1.0
        for t in range(n - 2, -1, -1):
            beta[t] = (a @ (e[:, obs[t + 1]] * beta[t + 1])) / scale[t + 1]
        gamma = alpha * beta
        gamma /= gamma.sum(axis=1, keepdims=True)
        rows = [("init", int(i), 0, float(gamma[0, i])) for i in range(k)]
        xi_sum = np.zeros((k, k))
        for t in range(n - 1):
            xi = (
                alpha[t][:, None] * a * (e[:, obs[t + 1]] * beta[t + 1])[None, :]
            ) / scale[t + 1]
            xi_sum += xi
        rows += [
            ("trans", int(i), int(j), float(xi_sum[i, j]))
            for i in range(k)
            for j in range(k)
        ]
        em = np.zeros((k, len(HMM_TYPES)))
        for t in range(n):
            em[:, obs[t]] += gamma[t]
        rows += [
            ("emit", int(i), int(v), float(em[i, v]))
            for i in range(k)
            for v in range(len(HMM_TYPES))
        ]
        rows.append(("ll", 0, 0, float(np.log(scale).sum())))
        return pd.DataFrame(rows, columns=["kind", "i", "j", "value"])

    return stats


def baum_welch_round(events: DataFrame, model: dict | None = None) -> tuple[dict, float]:
    """One distributed Baum-Welch (EM) re-estimation round.

    E-step: forward-backward per user (Arrow-batched applyInPandas — the
    backward recursion is imperative like Viterbi); the per-sequence
    expected counts come back as O(K² + K·V) tiny rows per user. M-step:
    one aggregate over (kind, i, j) — the model collected to the driver is
    O(K² + K·V) scalars, the same bounded-model-state discipline as the
    kmeans/EM loops. Returns (new_model, total log-likelihood under the
    INPUT model — the quantity EM monotonically improves).
    """
    if model is None:
        model = {"init": list(HMM_INIT),
                 "trans": [list(r) for r in HMM_TRANS],
                 "emit": [list(r) for r in HMM_EMIT]}
    k, v = len(model["init"]), len(HMM_TYPES)
    agg = (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(_bw_group_stats(model), schema=BW_STATS_SCHEMA)
        .groupBy("kind", "i", "j")
        .agg(F.sum("value").alias("value"))
    )
    cells = {(r["kind"], r["i"], r["j"]): r["value"] for r in agg.collect()}
    init_raw = [cells.get(("init", i, 0), 0.0) for i in range(k)]
    z = sum(init_raw)
    new_init = [x / z for x in init_raw]
    new_trans = []
    for i in range(k):
        row = [cells.get(("trans", i, j), 0.0) for j in range(k)]
        rz = sum(row)
        new_trans.append([x / rz for x in row] if rz > 0 else list(model["trans"][i]))
    new_emit = []
    for i in range(k):
        row = [cells.get(("emit", i, jv), 0.0) for jv in range(v)]
        rz = sum(row)
        new_emit.append([x / rz for x in row] if rz > 0 else list(model["emit"][i]))
    ll = cells.get(("ll", 0, 0), float("-inf"))
    return {"init": new_init, "trans": new_trans, "emit": new_emit}, ll


def baum_welch_fit(events: DataFrame, rounds: int = 3) -> tuple[dict, list[float]]:
    """EM driver loop: log-likelihood per round is non-decreasing (the EM
    guarantee — asserted by the tests as the correctness oracle)."""
    model = None
    lls: list[float] = []
    for _ in range(rounds):
        model, ll = baum_welch_round(events, model)
        lls.append(ll)
    return model, lls


def viterbi_path_reference(obs: list[str]) -> list[int]:
    """Brute-force argmax over all K^T state paths (tests, T ≤ 8 only).

    Ties broken toward the lexicographically smallest path, matching
    argmax's first-maximum convention in the numpy kernel.
    """
    import itertools

    sym = {s: j for j, s in enumerate(HMM_TYPES)}
    idx = [sym[o] for o in obs]
    best, best_p = None, None
    for path in itertools.product(range(HMM_STATES), repeat=len(obs)):
        p = math.log(HMM_INIT[path[0]]) + math.log(HMM_EMIT[path[0]][idx[0]])
        for t in range(1, len(obs)):
            p += math.log(HMM_TRANS[path[t - 1]][path[t]])
            p += math.log(HMM_EMIT[path[t]][idx[t]])
        if best is None or p > best + 1e-12:
            best, best_p = p, path
    return list(best_p)


# ---------------------------------------------------------------------------
# Oracle-checked HMM scoring (deferred driver window). The forward pass is
# a per-user left fold with identical float-op order in both engines
# (Spark F.aggregate over the sorted obs array; DuckDB list_reduce over the
# same list) — alpha is bit-exact; only ln() can drift by an ulp per step,
# which round-6 absorbs (the q_trend_fit posture, not a rational-boundary
# case). DuckDB pitfall: bare numeric literals are DECIMAL and poison
# lambda arithmetic, so every model constant is CAST(... AS DOUBLE).


def q_hmm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user HMM sequence log-likelihood under the fixed 3-state model:
    the scaled forward pass (hmm_forward) with the filtering distribution
    dropped — (user_id, n_obs, loglik round-6). The sequence-scoring
    query an anomaly/bot-detection pipeline runs: users whose event
    streams score far below the population are behaving unlike the
    model.

    Scale shape: ONE shuffle (groupBy user) then a narrow JVM-side fold;
    state is O(K) per user regardless of sequence length."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    t = load_tables(spark, sf_dir)
    return hmm_forward(t.events).select(
        "user_id", "n_obs", F.round("loglik", 6).alias("loglik")
    )


def _sql_d(v: float) -> str:
    return f"CAST({float(v)!r} AS DOUBLE)"


def _sql_emit_row(j: int) -> str:
    return "[" + ", ".join(_sql_d(HMM_EMIT[j][v]) for v in range(len(HMM_TYPES))) + "]"


_TYPES_SQL = "[" + ", ".join(f"'{s}'" for s in HMM_TYPES) + "]"


def _hmm_oracle_sql() -> str:
    k = HMM_STATES
    # init (o1 bound in a prior CTE level): u_j = INIT[j] · EMIT[j][o1]
    init_u = [f"({_sql_d(HMM_INIT[j])} * {_sql_emit_row(j)}[o1])" for j in range(k)]
    # fold lambda: raw_j = Σ_i acc[i]·TRANS[i][j] (left-assoc, matching
    # Spark's aggregate fold), u_j = raw_j · EMIT[j][o], c = Σ u_j.
    o = "CAST(x[1] AS INT)"
    raw = [
        "(" + " + ".join(f"acc[{i + 1}] * {_sql_d(HMM_TRANS[i][j])}" for i in range(k)) + ")"
        for j in range(k)
    ]
    u = [f"({raw[j]} * {_sql_emit_row(j)}[{o}])" for j in range(k)]
    c = "(" + " + ".join(u) + ")"
    new_acc = "[" + ", ".join(f"{u[j]} / {c}" for j in range(k)) + f", acc[{k + 1}] + ln({c})]"
    return f"""
        WITH seq AS (
            SELECT user_id, list(event_type ORDER BY ts, event_id) AS obs,
                   CAST(count(*) AS BIGINT) AS n_obs
            FROM events GROUP BY user_id
        ),
        idx AS (
            SELECT user_id, n_obs, obs,
                   list_position({_TYPES_SQL}, obs[1]) AS o1
            FROM seq
        ),
        init1 AS (
            SELECT user_id, n_obs, obs,
                   {", ".join(f"{init_u[j]} AS u{j + 1}" for j in range(k))}
            FROM idx
        ),
        init2 AS (
            SELECT user_id, n_obs, obs,
                   ({" + ".join(f"u{j + 1}" for j in range(k))}) AS c0,
                   u1, u2, u3
            FROM init1
        ),
        folded AS (
            SELECT user_id, n_obs,
                   list_reduce(
                       list_prepend(
                           [{", ".join(f"u{j + 1} / c0" for j in range(k))}, ln(c0)],
                           list_transform(obs[2:],
                               s -> [CAST(list_position({_TYPES_SQL}, s) AS DOUBLE)])
                       ),
                       (acc, x) -> {new_acc}
                   ) AS fin
            FROM init2
        )
        SELECT user_id, n_obs, round(fin[{k + 1}], 6) AS loglik FROM folded
    """


QUERIES = {"q_hmm_score": q_hmm_score}
ORACLES = {"q_hmm_score": _hmm_oracle_sql()}


SMOOTH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("map_state", T.IntegerType()),
        T.StructField("p_map", T.DoubleType()),
    ]
)


def _smooth_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Scaled forward-backward posterior marginals for one user: γ_t(i) =
    P(state_t = i | o_1..T) — smoothing, vs Viterbi's joint-path argmax
    (the two can disagree position-wise; both ship)."""
    import numpy as np

    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    sym = {s: j for j, s in enumerate(HMM_TYPES)}
    obs = pdf["event_type"].map(sym).to_numpy()
    n, k = len(obs), HMM_STATES
    a = np.asarray(HMM_TRANS)
    e = np.asarray(HMM_EMIT)
    alpha = np.zeros((n, k))
    scale = np.zeros(n)
    alpha[0] = np.asarray(HMM_INIT) * e[:, obs[0]]
    scale[0] = alpha[0].sum()
    alpha[0] /= scale[0]
    for t in range(1, n):
        alpha[t] = (alpha[t - 1] @ a) * e[:, obs[t]]
        scale[t] = alpha[t].sum()
        alpha[t] /= scale[t]
    beta = np.zeros((n, k))
    beta[-1] = 1.0
    for t in range(n - 2, -1, -1):
        beta[t] = (a @ (e[:, obs[t + 1]] * beta[t + 1])) / scale[t + 1]
    gamma = alpha * beta
    gamma /= gamma.sum(axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"].to_numpy(),
            "pos": range(n),
            "event_type": pdf["event_type"].to_numpy(),
            "map_state": gamma.argmax(axis=1).astype("int32"),
            "p_map": gamma.max(axis=1),
        }
    )


def hmm_smooth(events: DataFrame) -> DataFrame:
    """Posterior state marginals per position (forward-backward
    smoothing) under the fixed model — the probabilistic companion to
    viterbi_decode: Viterbi answers "most likely PATH", smoothing
    answers "most likely state AT EACH POSITION given everything seen".
    Arrow-batched applyInPandas over the same single user-keyed
    exchange; pytest-diffed against an independent pure-Python
    forward-backward."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(_smooth_group, schema=SMOOTH_SCHEMA)
    )
