"""Text operators: wordcount, TF-IDF, and LLM-pipeline text analysis
(SURVEY.md §2C q_wordcount/q_tfidf, §2D q_text_stats + north-star text ops).

Wordcount is the MapReduce hello-world (map=emit(word,1), combine,
reduce=sum — SURVEY.md §2A); here it is explode + one hash aggregate with
map-side partials supplied by Catalyst. TF-IDF is the reference's canonical
chained-job pipeline (tf job → df job → idf join); here the chain is a lazy
DAG of three aggregations the optimizer pipelines.

Scale notes (100 TB posture):
- explode(split) multiplies rows ~55× (measured avg tokens/doc) BEFORE the
  shuffle, but partial aggregation collapses each partition to its distinct
  (doc, token) pairs pre-shuffle — shuffled bytes are bounded by vocabulary,
  not corpus size.
- Every per-doc stat (lang-id, quality, token counts, fingerprints) is a
  narrow projection: no shuffle at all, pure codegen'd map work.
- doc-count N is a 1-row aggregate broadcast into the idf join — the
  reference ships it via Configuration/DistributedCache (SURVEY.md §2A).

Float policy: ratios/idf are rounded to 6 in BOTH engines (SURVEY.md §5.2.3);
counts stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.functions.hashing import shingles
from machinelearningalgomapreduce_spark.functions.joins import fan_out, pre_partition_small_tier
from machinelearningalgomapreduce_spark.sources.catalog import load_tables

# Tiny function-word lexicon for the language-ID heuristic. The fixture
# vocabulary is shared across langs (measured: all 5 langs draw the same 31
# tokens), so the checked contract is "both engines score identically", not
# "the guess recovers the hidden label".
STOPWORDS = ("the", "a", "of", "is", "and")
LANG_STOP_THRESHOLD = 0.08
ZIPF_TOP_TERMS = 200


def _tokens(col: str = "text"):
    from machinelearningalgomapreduce_spark.functions.hashing import tokens

    return tokens(F.col(col))  # ONE canonical tokenization (hashing.py)


def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic wordcount + document frequency per token.

    Two-level aggregation instead of count + countDistinct in one agg: the
    distinct-agg rewrite Expands every exploded token row ×2 before the
    first shuffle. Pre-aggregating per (token, doc) shuffles narrower,
    already-combined rows; n_occurrences = exact integer partial sums, so
    results are identical. Small tiers pre-partition on token so both
    levels share ONE exchange (joins.py::pre_partition_small_tier)."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(_tokens()).alias("token"))
    tok = pre_partition_small_tier(tok, sf_dir, ["token"])
    per_doc = tok.groupBy("token", "doc_id").agg(F.count("*").alias("n"))
    return per_doc.groupBy("token").agg(
        F.sum("n").alias("n_occurrences"),
        F.count("*").alias("n_docs"),
    )


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, token): tf * ln(N / df).

    Three chained aggregations (tf, df, N) — the reference's three MapReduce
    jobs — fused into one DAG; N is a broadcast 1-row join.
    """
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(_tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = t.documents.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tf_idf"),
        )
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus rollup: doc counts, token/char statistics, langs."""
    t = load_tables(spark, sf_dir)
    toks = _tokens()
    per_doc = t.documents.select(
        "source",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("text_chars"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg("text_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.col("n_distinct_tokens") / F.col("n_tokens").cast("double")), 6).alias(
            "avg_distinct_ratio"
        ),
        F.countDistinct("lang").alias("n_langs"),
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways per doc: whitespace split and a BPE-ish
    regex ([a-z]+ runs — digits/punct become their own units)."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(_tokens()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)).alias("n_re_tokens"),
        F.length("text").alias("n_text_chars"),
        "n_chars",
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: function-word density → 'en' / 'unk'."""
    t = load_tables(spark, sf_dir)
    toks = _tokens()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    frac = F.size(F.filter(toks, lambda x: F.array_contains(stop, x))) / F.size(toks).cast(
        "double"
    )
    return t.documents.select(
        "doc_id",
        "lang",
        F.round(frac, 6).alias("stopword_frac"),
        F.when(frac >= LANG_STOP_THRESHOLD, F.lit("en")).otherwise(F.lit("unk")).alias(
            "lang_pred"
        ),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality heuristics (pretraining-filter style): length band,
    lexical diversity, function-word density → composite score in [0, 1]."""
    t = load_tables(spark, sf_dir)
    toks = _tokens()
    n = F.size(toks).cast("double")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_frac = F.size(F.filter(toks, lambda x: F.array_contains(stop, x))) / n
    diversity = F.size(F.array_distinct(toks)) / n
    len_ok = F.when((n >= 20) & (n <= 80), 1.0).otherwise(0.0)
    score = 0.4 * len_ok + 0.4 * diversity + 0.2 * F.least(stop_frac * 5, F.lit(1.0))
    return t.documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(diversity, 6).alias("diversity"),
        F.round(stop_frac, 6).alias("stop_frac"),
        F.round(score, 6).alias("quality_score"),
        (F.round(score, 6) >= 0.5).alias("keep"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash + min-shingle hash (the
    1-permutation MinHash — robust to local edits, cf. functions/hashing.py)."""
    t = load_tables(spark, sf_dir)
    sh = shingles(F.col("text"), k=3)
    return t.documents.select(
        "doc_id",
        F.md5("text").alias("fp_exact"),
        F.array_min(F.transform(sh, F.md5)).alias("fp_shingle"),
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index — the classic MapReduce textbook job after wordcount:
    token → sorted posting list of doc ids (+ df). Postings are built with
    collect_set + array_sort after the same one-shuffle token aggregate.

    The checked output serializes postings to a comma-joined STRING: the
    driver's pandas canonicalizer cannot hash array cells (round-2 red row).
    `inverted_index_arrays` below keeps the typed array<bigint> form for
    library consumers."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(_tokens()).alias("token")).distinct()
    return tok.groupBy("token").agg(
        F.array_join(
            F.array_sort(F.collect_set("doc_id")).cast("array<string>"), ","
        ).alias("postings"),
        F.count("*").alias("df"),
    )


def inverted_index_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed inverted index (token → array<bigint> postings) — library form
    of q_inverted_index for downstream joins; pytest-checked."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(_tokens()).alias("token")).distinct()
    return tok.groupBy("token").agg(
        F.array_sort(F.collect_set("doc_id")).alias("postings"),
        F.count("*").alias("df"),
    )


def q_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep (the original MapReduce paper's example): regex
    match over the corpus with match counts — a pure scan-side filter, no
    shuffle at all until the tiny per-source rollup."""
    t = load_tables(spark, sf_dir)
    pattern = "(scan|merge) (slow|fast)"
    hits = t.documents.filter(F.col("text").rlike(pattern)).select(
        "doc_id",
        "source",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pattern), 0)).alias("n_matches"),
        F.regexp_extract(F.col("text"), pattern, 0).alias("first_match"),
    )
    return hits


DECON_PROBE_STRIDE = 100  # doc_id % stride == 0 → "benchmark" document


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    3-gram with the held-out "benchmark" set (every 100th doc stands in
    for an eval suite). The standard pretraining hygiene pass (n-gram
    overlap decontamination à la GPT-3/FLAN appendix methodology).

    Scale shape: real benchmark suites are tiny relative to the corpus, so
    the probe n-gram set is the BROADCAST side and the corpus is scanned
    once — no corpus shuffle at all until the per-doc hit count (which
    shuffles only (doc_id, shingle-hit) pairs). With a larger probe set,
    swap the broadcast join for a bloom filter built from it."""
    t = load_tables(spark, sf_dir)
    # fan_out + localCheckpoint (r16): the shingle pass fed BOTH branches
    # (probe build + train probe) from the single-file scan — each branch
    # re-ran it, serially. Materialize the per-doc distinct-shingle arrays
    # once and explode from the blocks; measured 2.3–3.3 → 1.26 s at
    # sf0.1. Same rows (explode of the same arrays).
    base = fan_out(t.documents).select(
        "doc_id", F.array_distinct(shingles(F.col("text"), k=3)).alias("shs")
    ).localCheckpoint()
    sh = base.select("doc_id", F.explode("shs").alias("sh"))
    probes = sh.filter(F.col("doc_id") % DECON_PROBE_STRIDE == 0).select("sh").distinct()
    train = t.documents.filter(F.col("doc_id") % DECON_PROBE_STRIDE != 0)
    hits = (
        sh.filter(F.col("doc_id") % DECON_PROBE_STRIDE != 0)
        .join(F.broadcast(probes), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_hits"))
    )
    return train.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).alias("n_contaminated_ngrams"),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )


REPETITION_TOP_FRAC_MAX = 0.2


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filtering: per document, the fraction of
    bigrams taken by the single most-repeated bigram, and the overall
    duplicate-bigram fraction; docs above the threshold are dropped.

    Two aggregates — (doc, bigram) counts, then per-doc rollup — both with
    map-side partials; shuffled bytes are bounded by distinct bigrams, not
    corpus size."""
    t = load_tables(spark, sf_dir)
    # fan_out: the bigram explode is per-row map work over a single-file
    # scan — spread across cores before computing (r16; no-op on wide
    # inputs, same as the other shingling sites).
    bg = fan_out(t.documents).select(
        "doc_id", F.explode(shingles(F.col("text"), k=2)).alias("bg")
    )
    counts = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("n"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.max("n").alias("top_n"),
        F.count("*").alias("n_distinct"),
    )
    top_frac = F.round(F.col("top_n") / F.col("n_bigrams").cast("double"), 6)
    dup_frac = F.round(1 - F.col("n_distinct") / F.col("n_bigrams").cast("double"), 6)
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_bigram_frac"),
        (top_frac < REPETITION_TOP_FRAC_MAX).alias("keep"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("scan", "merge", "fast")
BM25_TOPK = 20


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: rank the corpus for a fixed keyword query — the IR
    scoring job an LLM retrieval pipeline runs over its index.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene-positive form).

    round(sum(part), 6) audit (r15, the half-boundary class): the
    summand is a CONTINUOUS-valued score (log idf × a tf ratio), so the
    true per-doc sum is almost surely OFF every 6dp half-boundary — the
    double-sum's ±few-ulp order dependence only matters within ~1e-10 of a
    boundary, jointly negligible. Unlike the grid-money sums (converted to
    exact fixed-point in functions/money.py), there is no exact integer
    representation to sum, so this stays a documented double sum.

    Plan shape: per-doc tf for the 3 query terms (scan-side filter before
    the aggregate), df/N/avgdl are 1-row or per-term broadcast aggregates —
    exactly the inverted-index + doc-stats reuse a real index would give;
    top-k is TakeOrderedAndProject. Scores rounded to 6 before ranking
    with a doc_id tie-break (SURVEY §5.2.2 determinism policy)."""
    t = load_tables(spark, sf_dir)
    terms = F.array(*[F.lit(q) for q in BM25_QUERY])
    tok = t.documents.select("doc_id", F.explode(_tokens()).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    qtok = tok.filter(F.array_contains(terms, F.col("token")))
    tf = qtok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = df.crossJoin(F.broadcast(stats)).select(
        "token",
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1).alias("idf"),
    )
    part = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    return (
        part.groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOPK)
    )


NGRAM_LM_MIN_COUNT = 3


def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model with add-one smoothing — the canonical
    MapReduce NLP counting job: corpus bigram counts, unigram context
    counts, vocabulary size, conditional log-probabilities.

    log P(w2|w1) = ln((c(w1 w2) + 1) / (c(w1) + V)). Two counting
    aggregates + a broadcast 1-row vocab — shuffle bounded by n-gram
    vocabulary, not corpus size. Output restricted to bigrams seen ≥ 3
    times (the model head a downstream scorer would load)."""
    t = load_tables(spark, sf_dir)
    # fan_out: shingling is per-row map work over the single-file scan (r16).
    bg = fan_out(t.documents).select(F.explode(shingles(F.col("text"), k=2)).alias("bigram"))
    c2 = (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("c2"))
        .filter(F.col("c2") >= NGRAM_LM_MIN_COUNT)
        .withColumn("w1", F.split(F.col("bigram"), " ")[0])
    )
    tok = fan_out(t.documents).select(F.explode(_tokens()).alias("token"))
    c1 = tok.groupBy("token").agg(F.count("*").alias("c1"))
    # V = |distinct tokens| = the row count of c1 (which already paid the
    # token explode + distinct shuffle): counting c1's non-null keys is
    # value-identical to countDistinct(token) over tok — explode never
    # emits NULL tokens, and count(col) skips them anyway — and removes a
    # second full token-explode pass (r16, guide §2.4 "don't compute
    # things twice").
    vocab = c1.agg(F.count("token").alias("v"))
    return (
        c2.join(c1, c2.w1 == c1.token)
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            "c2",
            "c1",
            F.round(F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")).cast("double")), 6).alias(
                "log_prob"
            ),
        )
    )


PPL_KEEP_MAX = 31.0  # calibrated on the fixture: keeps ~85% (p90 ≈ 31.2)


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity filter (CCNet/Gopher-style pretraining quality gate):
    score every document by its average add-one-smoothed bigram
    log-probability under the CORPUS bigram LM, convert to perplexity,
    and flag the high-perplexity tail for removal.

    lp(w1 w2) = ln((c(w1 w2)+1) / (c(w1)+V)); ppl = exp(-avg(lp)).
    The per-doc average is computed from an EXACT integer sum of
    micro-unit lp values (round(lp,6) → ×1e6 → bigint): averaging
    6-decimal values over small n lands on true decimal ties
    (-74.918789/22 = -3.40539950...), where a 1-ulp float-sum-order
    difference flips the rounded 6th decimal between engines (measured:
    5/500 docs at sf0.001). Integer sums make both engines divide
    identical numbers, so ties resolve identically.

    Scale shape: the model tables (c2, c1, V) are n-gram-vocab-bounded,
    never corpus-bounded; the doc-side probe is one shuffle of bigram
    occurrences joined against them (broadcastable when the pruned model
    fits, exactly like q_decontaminate's probe side). The per-doc rollup
    shuffles (doc_id, lp) scalars. No O(n²) anywhere."""
    t = load_tables(spark, sf_dir)
    # fan_out: the bigram/token explodes run twice each (model build +
    # probe) over the single-file scan — spread before exploding (r15).
    docs = fan_out(t.documents)
    db = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), k=2)).alias("bigram")
    )
    c2 = db.groupBy("bigram").agg(F.count("*").alias("c2"))
    tok = docs.select(F.explode(_tokens()).alias("token"))
    c1 = tok.groupBy("token").agg(F.count("*").alias("c1"))
    # V from c1's row count — identical to countDistinct(token) over tok
    # and one token-explode pass cheaper (r16; see q_ngram_lm's note).
    vocab = c1.agg(F.count("token").alias("v"))
    lp = F.round(
        F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")).cast("double")), 6
    )
    scored = (
        db.join(c2, "bigram")
        .withColumn("w1", F.split("bigram", " ")[0])
        .join(c1, F.col("w1") == F.col("token"))
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", F.round(lp * 1e6).cast("bigint").alias("lp_micro"))
    )
    avg_d = (F.col("sm").cast("double") / F.col("n_bigrams")) / F.lit(1e6)
    ppl = F.round(F.exp(-avg_d), 6)
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp_micro").alias("sm"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(avg_d, 6).alias("avg_logprob"),
            ppl.alias("ppl"),
            (ppl <= PPL_KEEP_MAX).alias("keep"),
        )
    )


# PII patterns kept RE2-compatible (DuckDB) AND Java-regex-compatible
# (Spark): character classes + bounded repetition only, no lookaround.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrub pass an LLM training pipeline
    runs before anything else. The fixture corpus is synthetic word-salad
    with no PII, so deterministic contacts are INJECTED from doc_id (email
    on every 3rd doc, phone on every 2nd) and then scrubbed; the oracle
    injects the identical strings, so detector counts, redacted lengths,
    and the md5 fingerprint of the scrubbed text are all hash-checked.

    Scale shape: pure per-row regex work on the scan — no shuffle at all;
    at 100 TB this is codegen'd map work, embarrassingly parallel."""
    t = load_tables(spark, sf_dir)
    email = F.concat(F.lit(" user"), F.col("doc_id").cast("string"), F.lit("@example.com"))
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    enriched = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, email).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, phone).otherwise(F.lit("")),
    )
    base = t.documents.select("doc_id", enriched.alias("enriched"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("enriched"), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return base.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("enriched"), F.lit(PII_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("enriched"), F.lit(PII_PHONE_RE), 0)).alias(
            "n_phones"
        ),
        F.length(redacted).alias("n_redacted_chars"),
        F.md5(redacted).alias("redacted_fp"),
    )


COOCCUR_MIN_PAIRS = 5


def q_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence with pointwise mutual information — the
    collocation-mining job (word2vec's count cousin): for token pairs
    appearing in ≥ 5 documents together, pmi = ln(n_ab·N / (df_a·df_b))
    over document-level counts.

    Scale shape: the pair generator is a SELF-JOIN CO-PARTITIONED on
    doc_id (both sides shuffle once on doc_id, then pairs are produced
    partition-locally); per-doc fan-out is bounded by distinct-tokens²,
    and the aggregate output by vocabulary², independent of corpus size.
    Token document-frequencies are vocabulary-sized broadcast joins."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(F.array_distinct(_tokens())).alias("token"))
    n_docs = t.documents.agg(F.count("*").alias("n_docs"))
    docfreq = tok.groupBy("token").agg(F.count("*").alias("df"))
    a, b = tok.alias("a"), tok.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.token") < F.col("b.token")))
        .groupBy(F.col("a.token").alias("token_a"), F.col("b.token").alias("token_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= COOCCUR_MIN_PAIRS)
    )
    dfa = docfreq.select(F.col("token").alias("token_a"), F.col("df").alias("df_a"))
    dfb = docfreq.select(F.col("token").alias("token_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(dfa), "token_a")
        .join(F.broadcast(dfb), "token_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token_a",
            "token_b",
            "n_ab",
            F.round(
                F.log(
                    # double BEFORE the product: n_ab·n_docs as BIGINT
                    # overflows at corpus scale (the q_js_divergence
                    # discipline); both engines compute the identical
                    # double for any in-range fixture value
                    F.col("n_ab").cast("double") * F.col("n_docs")
                    / (F.col("df_a") * F.col("df_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the token distribution per source — the corpus-
    diversity health metric (a collapsed/boilerplate source shows low
    entropy). H = ln(N) − (Σ n·ln n)/N over per-source token counts; the
    algebraic form needs only two counting aggregates, no p=n/N division
    per token.

    Float posture: the Σ n·ln n fold is ~vocabulary terms per source
    (tiny), and the final H lands in [0, ln V] — round-6 absorbs the
    cross-engine summation-order drift at this magnitude.

    Scale shape: (source, token) counts with map-side partials (shuffle
    bounded by sources × vocabulary), then an O(sources) rollup."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("source", F.explode(_tokens()).alias("token"))
    counts = tok.groupBy("source", "token").agg(F.count("*").alias("n"))
    return counts.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(
            F.log(F.sum("n").cast("double"))
            - F.sum(F.col("n") * F.log(F.col("n").cast("double"))) / F.sum("n"),
            6,
        ).alias("entropy"),
    )


def q_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-level near-duplicate signal: token-set Jaccard similarity
    between every source pair — the "are these two crawls the same
    corpus?" check run before merging training-data sources.

    J(A,B) = |A∩B| / (|A|+|B|−|A∩B|) over distinct token sets. The
    intersection comes from a token-keyed self-join of the distinct
    (source, token) relation — shuffle is bounded by vocabulary, and
    per-token fan-out by sources², independent of corpus size; set sizes
    are a sources-sized broadcast."""
    t = load_tables(spark, sf_dir)
    st = t.documents.select("source", F.explode(_tokens()).alias("token")).distinct()
    sizes = st.groupBy("source").agg(F.count("*").alias("n_set"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_set").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_set").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_inter",
            "n_a",
            "n_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus frequency spectrum: OLS of
    ln(count) on ln(rank) for the top ZIPF_TOP_TERMS terms — slope ≈ −1
    is the natural-language signature; a flat or broken slope flags
    synthetic/templated corpora before they enter a training mix.

    Exactness: each per-term ln is rounded to 6 (engine-equal at that
    precision) and every OLS sufficient statistic (Σx, Σy, Σx², Σy², Σxy)
    is accumulated as DECIMAL over the ROUNDED terms, so sums are
    order-independent; slope/intercept/r² are then derived doubles from
    identical inputs, with the same operation order in both engines.

    Scale shape: one counting aggregate (vocab-bounded) → top-k
    TakeOrdered → a 200-row window and 1-row rollup. Only the token count
    touches corpus-sized data.
    """
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    tok = t.documents.select(F.explode(_tokens()).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), "token").limit(ZIPF_TOP_TERMS)
    # Window over ≤ ZIPF_TOP_TERMS rows — bounded domain, not a scale risk.
    ranked = top.withColumn("r", F.row_number().over(W.orderBy(F.desc("cnt"), "token")))
    x = F.round(F.log(F.col("r").cast("double")), 6)
    y = F.round(F.log(F.col("cnt").cast("double")), 6)
    dec = lambda c: F.round(c, 6).cast("decimal(18,6)")  # noqa: E731
    terms = ranked.select(
        x.cast("decimal(18,6)").alias("x"),
        y.cast("decimal(18,6)").alias("y"),
        dec(x * x).alias("xx"),
        dec(y * y).alias("yy"),
        dec(x * y).alias("xy"),
    )
    sums = terms.agg(
        F.count("*").alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xx").alias("sxx"),
        F.sum("yy").alias("syy"),
        F.sum("xy").alias("sxy"),
    )
    n = F.col("n_terms").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    # try_divide: a degenerate corpus (one distinct token → den = 0, or
    # all-equal counts → zero y-variance) yields NULL here like the
    # oracle's double/0 does, instead of an ANSI DIVIDE_BY_ZERO abort
    slope = F.try_divide(num, den)
    return sums.select(
        "n_terms",
        F.round(slope, 6).alias("slope"),
        F.round(F.try_divide(sy - slope * sx, n), 6).alias("intercept"),
        F.round(
            F.try_divide(num * num, den * (n * syy - sy * sy)), 6
        ).alias("r2"),
    )


def tfidf_fit(spark: SparkSession, sf_dir: str, n_features: int = 1 << 10):
    """MLlib TF-IDF variant (HashingTF + IDF) — library API, pytest-checked.
    The pure-DF q_tfidf is the oracle-checked form; this is the fitted-
    transformer pipeline a downstream MLlib model consumes."""
    from pyspark.ml.feature import IDF, HashingTF

    t = load_tables(spark, sf_dir)
    toks = t.documents.select("doc_id", F.split("text", " ").alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="tf", numFeatures=n_features).transform(toks)
    model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    return model, model.transform(tf)


def q_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness per source: the hapax-legomena profile — how
    many of a source's token occurrences are corpus-wide singletons. High
    hapax rates flag noisy/OCR-ish sources; near-zero rates flag templated
    or duplicated ones. Complements q_token_entropy (distribution shape)
    and q_vocab_coverage (OOV vs a fixed top-k vocab).

    Scale shape: one (source, token) aggregate, then the corpus count per
    token comes from a window over the already-aggregated frame keyed by
    token (sources-per-token rows, never raw occurrences) — one token
    shuffle total; the final rollup is source-bounded. Exact integers;
    the rate is one rounded division."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    per = (
        t.documents.select("source", F.explode(_tokens()).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )
    corpus_n = F.sum("n").over(W.partitionBy("token"))
    flagged = per.withColumn("hapax", (corpus_n == 1).cast("bigint"))
    agg = flagged.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(F.col("hapax") * F.col("n")).alias("n_hapax"),
        F.round(
            F.sum(F.col("hapax") * F.col("n")) / F.sum("n").cast("double"), 6
        ).alias("hapax_rate"),
        F.count("*").alias("n_distinct"),
    )
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    return tiny_sorted(agg, "source")


def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution —
    the drift/contamination detector for multi-source training mixes
    (a source whose token distribution diverges from the pool gets
    flagged before it skews the mix). Algebraic form over count sums:
    KL(p_s‖q) = [(Σ n·ln n) − (Σ n·ln m)]/N_s − ln N_s + ln M, so only
    counting aggregates touch the data (the q_token_entropy float
    posture: bounded-vocab folds + round-6).

    Scale shape: one (source, token) counting aggregate, one token-keyed
    marginal aggregate joined back (shuffle bounded by vocabulary), then
    an O(sources) rollup."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("source", F.explode(_tokens()).alias("token"))
    counts = tok.groupBy("source", "token").agg(F.count("*").alias("n"))
    marg = counts.groupBy("token").agg(F.sum("n").alias("m"))
    tot = marg.agg(F.sum("m").alias("big_m"))
    joined = counts.join(marg, "token").crossJoin(F.broadcast(tot))
    return joined.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.round(
            (
                F.sum(F.col("n") * F.log(F.col("n").cast("double")))
                - F.sum(F.col("n") * F.log(F.col("m").cast("double")))
            )
            / F.sum("n")
            - F.log(F.sum("n").cast("double"))
            + F.log(F.max("big_m").cast("double")),
            6,
        ).alias("kl"),
    )


def q_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity: type-token ratio and the
    length-robust root TTR (types/√tokens) — the quick corpus-health
    screen next to q_token_entropy/q_hapax_rate. Exact integer counts;
    the two ratios are identical scalar divisions (sqrt is correctly
    rounded IEEE), rounded to 6.

    Scale shape: one (source, token) distinct + two counting aggregates,
    all map-side combinable."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("source", F.explode(_tokens()).alias("token"))
    per = tok.groupBy("source").agg(F.count("*").alias("n_tokens"))
    types = (
        tok.distinct().groupBy("source").agg(F.count("*").alias("n_types"))
    )
    return per.join(types, "source").select(
        "source",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / F.col("n_tokens").cast("double"), 6)
        .alias("ttr"),
        F.round(
            F.col("n_types").cast("double") / F.sqrt(F.col("n_tokens").cast("double")), 6
        ).alias("root_ttr"),
    )


QUERIES = {
    "q_kl_divergence": q_kl_divergence,
    "q_type_token_ratio": q_type_token_ratio,
    "q_hapax_rate": q_hapax_rate,
    "q_wordcount": q_wordcount,
    "q_inverted_index": q_inverted_index,
    "q_grep": q_grep,
    "q_tfidf": q_tfidf,
    "q_text_stats": q_text_stats,
    "q_token_count": q_token_count,
    "q_lang_id": q_lang_id,
    "q_quality_score": q_quality_score,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_decontaminate": q_decontaminate,
    "q_repetition_filter": q_repetition_filter,
    "q_bm25": q_bm25,
    "q_ngram_lm": q_ngram_lm,
    "q_perplexity_filter": q_perplexity_filter,
    "q_pii_scrub": q_pii_scrub,
    "q_cooccur_pmi": q_cooccur_pmi,
    "q_token_entropy": q_token_entropy,
    "q_source_jaccard": q_source_jaccard,
    "q_zipf_fit": q_zipf_fit,
}

_STOP_SQL = "['the','a','of','is','and']"

# Shared quality-score scalar (DuckDB SQL over a `documents`-shaped relation).
# Op order matches q_quality_score's Spark expression EXACTLY — in particular
# (stop_count / n) * 5, never 5 * stop_count / n: the value is rounded to 6
# and reused by dedup's keep-best survivor pick, where a 1-ulp op-order
# divergence can flip the rounded score (and hence the survivor) at knife
# edges. Any oracle that needs a document quality score must use this
# constant, never re-derive the formula.
_N_TOKS_SQL = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
QUALITY_SCORE_SQL = (
    "round(0.4 * (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80"
    " THEN 1.0 ELSE 0.0 END)"
    f" + 0.4 * (len(list_distinct(string_split(text, ' '))) / {_N_TOKS_SQL})"
    " + 0.2 * least(len(list_filter(string_split(text, ' '),"
    f" t -> list_contains({_STOP_SQL}, t))) / {_N_TOKS_SQL} * 5, 1.0), 6)"
)

ORACLES = {
    "q_kl_divergence": """
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
        ),
        counts AS (
            SELECT source, token, CAST(count(*) AS BIGINT) AS n
            FROM tok GROUP BY 1, 2
        ),
        marg AS (SELECT token, CAST(sum(n) AS BIGINT) AS m FROM counts GROUP BY token),
        tot AS (SELECT CAST(sum(m) AS BIGINT) AS big_m FROM marg)
        SELECT c.source, CAST(sum(c.n) AS BIGINT) AS n_tokens,
               round((sum(c.n * ln(CAST(c.n AS DOUBLE)))
                      - sum(c.n * ln(CAST(m.m AS DOUBLE))))
                     / CAST(sum(c.n) AS DOUBLE)
                     - ln(CAST(sum(c.n) AS DOUBLE))
                     + ln(CAST((SELECT big_m FROM tot) AS DOUBLE)), 6) AS kl
        FROM counts c JOIN marg m USING (token)
        GROUP BY c.source
    """,
    "q_type_token_ratio": """
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
        ),
        per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY source),
        types AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_types
            FROM (SELECT DISTINCT source, token FROM tok) GROUP BY source
        )
        SELECT p.source, n_tokens, n_types,
               round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
               round(CAST(n_types AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE)), 6) AS root_ttr
        FROM per p JOIN types USING (source)
    """,
    "q_hapax_rate": """
        WITH per AS (
            SELECT source, token, count(*) AS n
            FROM (SELECT source, unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY source, token
        ),
        flagged AS (
            SELECT source, n,
                   CASE WHEN sum(n) OVER (PARTITION BY token) = 1
                        THEN 1 ELSE 0 END AS hapax
            FROM per
        )
        SELECT source,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(sum(hapax * n) AS BIGINT) AS n_hapax,
               round(sum(hapax * n) / CAST(sum(n) AS DOUBLE), 6) AS hapax_rate,
               count(*) AS n_distinct
        FROM flagged
        GROUP BY source
        ORDER BY source
    """,
    "q_wordcount": """
        SELECT token,
               count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    """,
    "q_inverted_index": """
        SELECT token,
               array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings,
               count(*) AS df
        FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY token
    """,
    "q_grep": """
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text, '(scan|merge) (slow|fast)')) AS INTEGER)
                   AS n_matches,
               regexp_extract(text, '(scan|merge) (slow|fast)', 0) AS first_match
        FROM documents
        WHERE regexp_matches(text, '(scan|merge) (slow|fast)')
    """,
    "q_tfidf": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
        ), df AS (
            SELECT token, count(*) AS df FROM tf GROUP BY token
        )
        SELECT tf.doc_id, tf.token, tf.tf, df.df,
               round(tf.tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df.df), 6)
                   AS tf_idf
        FROM tf JOIN df USING (token)
    """,
    "q_text_stats": """
        WITH per_doc AS (
            SELECT source, lang,
                   len(string_split(text, ' ')) AS n_tokens,
                   length(text) AS text_chars,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               round(avg(n_tokens), 6) AS avg_tokens,
               round(avg(text_chars), 6) AS avg_chars,
               round(avg(CAST(n_distinct_tokens AS DOUBLE) / n_tokens), 6) AS avg_distinct_ratio,
               count(DISTINCT lang) AS n_langs
        FROM per_doc
        GROUP BY source
    """,
    "q_token_count": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_re_tokens,
               CAST(length(text) AS INTEGER) AS n_text_chars,
               n_chars
        FROM documents
    """,
    "q_lang_id": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS frac
            FROM documents
        )
        SELECT doc_id, lang,
               round(frac, 6) AS stopword_frac,
               CASE WHEN frac >= 0.08 THEN 'en' ELSE 'unk' END AS lang_pred
        FROM scored
    """,
    "q_quality_score": f"""
        WITH feat AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                   round(len(list_distinct(string_split(text, ' '))) / {_N_TOKS_SQL}, 6)
                       AS diversity,
                   round(len(list_filter(string_split(text, ' '),
                                         t -> list_contains({_STOP_SQL}, t))) / {_N_TOKS_SQL}, 6)
                       AS stop_frac,
                   {QUALITY_SCORE_SQL} AS quality_score
            FROM documents
        )
        SELECT doc_id, n_tokens, diversity, stop_frac, quality_score,
               quality_score >= 0.5 AS keep
        FROM feat
    """,
    "q_decontaminate": f"""
        WITH sh AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                       i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS sh
            FROM documents
        ), probes AS (
            SELECT DISTINCT sh FROM sh WHERE doc_id % {DECON_PROBE_STRIDE} = 0
        ), hits AS (
            SELECT s.doc_id, count(DISTINCT s.sh) AS n_hits
            FROM sh s JOIN probes p USING (sh)
            WHERE s.doc_id % {DECON_PROBE_STRIDE} <> 0
            GROUP BY s.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_contaminated_ngrams,
               coalesce(h.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % {DECON_PROBE_STRIDE} <> 0
    """,
    "q_repetition_filter": f"""
        WITH bg AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
                       i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS bg
            FROM documents
        ), counts AS (
            SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY doc_id, bg
        ), per_doc AS (
            SELECT doc_id,
                   CAST(sum(n) AS BIGINT) AS n_bigrams,
                   max(n) AS top_n,
                   count(*) AS n_distinct
            FROM counts GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               round(top_n / CAST(n_bigrams AS DOUBLE), 6) AS top_bigram_frac,
               round(1 - n_distinct / CAST(n_bigrams AS DOUBLE), 6) AS dup_bigram_frac,
               round(top_n / CAST(n_bigrams AS DOUBLE), 6) < {REPETITION_TOP_FRAC_MAX}
                   AS keep
        FROM per_doc
    """,
    "q_bm25": f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ), dl AS (
            SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
        ), stats AS (
            SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf
            FROM tok WHERE token IN ({", ".join(f"'{q}'" for q in BM25_QUERY)})
            GROUP BY doc_id, token
        ), idf AS (
            SELECT token, ln((n_docs - df + 0.5) / (df + 0.5) + 1) AS idf
            FROM (SELECT token, count(*) AS df FROM tf GROUP BY token), stats
        ), part AS (
            SELECT tf.doc_id,
                   idf.idf * (tf.tf * ({BM25_K1} + 1))
                   / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
                       AS part
            FROM tf
            JOIN idf USING (token)
            JOIN dl ON dl.doc_id = tf.doc_id
            CROSS JOIN stats
        )
        SELECT doc_id, round(sum(part), 6) AS bm25
        FROM part GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT {BM25_TOPK}
    """,
    "q_ngram_lm": f"""
        WITH bg AS (
            SELECT unnest(list_transform(
                range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
                i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS bigram
            FROM documents
        ), c2 AS (
            SELECT bigram, count(*) AS c2, string_split(bigram, ' ')[1] AS w1
            FROM bg GROUP BY bigram
            HAVING count(*) >= {NGRAM_LM_MIN_COUNT}
        ), tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), c1 AS (
            SELECT token, count(*) AS c1 FROM tok GROUP BY token
        ), v AS (
            SELECT count(DISTINCT token) AS v FROM tok
        )
        SELECT c2.bigram, c2.c2, c1.c1,
               round(ln((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE)), 6) AS log_prob
        FROM c2 JOIN c1 ON c1.token = c2.w1 CROSS JOIN v
    """,
    "q_perplexity_filter": f"""
        WITH bg AS (
            SELECT doc_id, unnest(list_transform(
                range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
                i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS bigram
            FROM documents
        ), c2 AS (
            SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram
        ), tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), c1 AS (
            SELECT token, count(*) AS c1 FROM tok GROUP BY token
        ), v AS (
            SELECT count(DISTINCT token) AS v FROM tok
        ), scored AS (
            SELECT bg.doc_id,
                   CAST(round(round(ln((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE)), 6) * 1e6)
                        AS BIGINT) AS lp_micro
            FROM bg
            JOIN c2 USING (bigram)
            JOIN c1 ON c1.token = string_split(bg.bigram, ' ')[1]
            CROSS JOIN v
        )
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(CAST(sum(lp_micro) AS DOUBLE) / count(*) / 1e6, 6) AS avg_logprob,
               round(exp(-(CAST(sum(lp_micro) AS DOUBLE) / count(*) / 1e6)), 6) AS ppl,
               round(exp(-(CAST(sum(lp_micro) AS DOUBLE) / count(*) / 1e6)), 6)
                   <= {PPL_KEEP_MAX} AS keep
        FROM scored GROUP BY doc_id
    """,
    "q_pii_scrub": f"""
        WITH enriched AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' user' || doc_id || '@example.com' ELSE '' END
                   || CASE WHEN doc_id % 2 = 0
                           THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           ELSE '' END AS enriched
            FROM documents
        ), red AS (
            SELECT doc_id, enriched,
                   regexp_replace(
                       regexp_replace(enriched, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
            FROM enriched
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(enriched, '{PII_EMAIL_RE}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(enriched, '{PII_PHONE_RE}')) AS INTEGER) AS n_phones,
               CAST(length(redacted) AS INTEGER) AS n_redacted_chars,
               md5(redacted) AS redacted_fp
        FROM red
    """,
    "q_cooccur_pmi": f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
            FROM documents
        ), docfreq AS (
            SELECT token, count(*) AS df FROM tok GROUP BY token
        ), pairs AS (
            SELECT a.token AS token_a, b.token AS token_b, count(*) AS n_ab
            FROM tok a JOIN tok b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY 1, 2
            HAVING count(*) >= {COOCCUR_MIN_PAIRS}
        )
        SELECT p.token_a, p.token_b, p.n_ab,
               round(ln(CAST(p.n_ab AS DOUBLE) * (SELECT count(*) FROM documents)
                        / CAST(fa.df * fb.df AS DOUBLE)), 6) AS pmi
        FROM pairs p
        JOIN docfreq fa ON fa.token = p.token_a
        JOIN docfreq fb ON fb.token = p.token_b
    """,
    "q_source_jaccard": """
        WITH st AS (
            SELECT DISTINCT source, token
            FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        ), sizes AS (
            SELECT source, count(*) AS n_set FROM st GROUP BY source
        ), inter AS (
            SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
            FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT i.source_a, i.source_b, i.n_inter,
               sa.n_set AS n_a, sb.n_set AS n_b,
               round(i.n_inter / CAST(sa.n_set + sb.n_set - i.n_inter AS DOUBLE), 6)
                   AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.source = i.source_a
        JOIN sizes sb ON sb.source = i.source_b
    """,
    "q_token_entropy": """
        WITH counts AS (
            SELECT source, token, count(*) AS n
            FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY source, token
        )
        SELECT source,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               round(ln(CAST(sum(n) AS DOUBLE))
                     - sum(n * ln(CAST(n AS DOUBLE))) / sum(n), 6) AS entropy
        FROM counts
        GROUP BY source
    """,
    "q_doc_fingerprint": """
        WITH base AS (
            SELECT doc_id, text, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        )
        SELECT doc_id,
               md5(text) AS fp_exact,
               list_min(list_transform(
                   range(1, greatest(n - 2, 1) + 1),
                   i -> md5(array_to_string(toks[i:i+2], ' '))
               )) AS fp_shingle
        FROM base
    """,
    "q_zipf_fit": f"""
        WITH counts AS (
            SELECT token, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY token
        ), top AS (
            SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT {ZIPF_TOP_TERMS}
        ), ranked AS (
            SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS r FROM top
        ), terms AS (
            SELECT CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
                   CAST(round(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y,
                   CAST(round(round(ln(CAST(r AS DOUBLE)), 6)
                              * round(ln(CAST(r AS DOUBLE)), 6), 6) AS DECIMAL(18,6)) AS xx,
                   CAST(round(round(ln(CAST(cnt AS DOUBLE)), 6)
                              * round(ln(CAST(cnt AS DOUBLE)), 6), 6) AS DECIMAL(18,6)) AS yy,
                   CAST(round(round(ln(CAST(r AS DOUBLE)), 6)
                              * round(ln(CAST(cnt AS DOUBLE)), 6), 6) AS DECIMAL(18,6)) AS xy
            FROM ranked
        ), sums AS (
            SELECT count(*) AS n_terms,
                   CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(sum(xx) AS VARCHAR) AS DOUBLE) AS sxx,
                   CAST(CAST(sum(yy) AS VARCHAR) AS DOUBLE) AS syy,
                   CAST(CAST(sum(xy) AS VARCHAR) AS DOUBLE) AS sxy
            FROM terms
        )
        SELECT n_terms,
               round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6) AS slope,
               round((sy - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) * sx)
                     / n_terms, 6) AS intercept,
               round((n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)
                     / ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy)), 6) AS r2
        FROM sums
    """,
}


DRIFT_TOP_K = 50


def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-rank drift per source: Spearman rank correlation
    between each source's top-50 token ranking and the pooled corpus
    ranking of the SAME tokens — the rank-order companion to
    q_kl_divergence's mass-based drift (a source can keep the corpus
    token MASS profile while reordering what dominates). Ranks are
    row_numbers over the fully tie-broken (count desc, token) order and
    the corpus side re-ranks WITHIN the selected 50 (so both rankings
    are permutations of 1..k) — ρ = 1 − 6Σd²/(k(k²−1)) is then exact
    integer arithmetic with one rounded division.

    Scale shape: (source, token) + token-marginal counting aggregates
    (vocab-bounded), per-source top-k windows, one O(k) rollup."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    tok = t.documents.select("source", F.explode(_tokens()).alias("token"))
    src_counts = tok.groupBy("source", "token").agg(F.count("*").alias("n_s"))
    corpus = src_counts.groupBy("token").agg(F.sum("n_s").alias("n_c"))
    w_src = W.partitionBy("source").orderBy(F.desc("n_s"), F.col("token"))
    top = src_counts.withColumn("r_src", F.row_number().over(w_src)).filter(
        F.col("r_src") <= DRIFT_TOP_K
    )
    joined = top.join(corpus, "token")
    w_corp = W.partitionBy("source").orderBy(F.desc("n_c"), F.col("token"))
    ranked = joined.withColumn("r_corp", F.row_number().over(w_corp))
    d = F.col("r_src") - F.col("r_corp")
    agg = ranked.groupBy("source").agg(
        F.count("*").alias("k"),
        F.sum(d * d).alias("sum_d2"),
    )
    kk = F.col("k").cast("double")
    # try_divide: a single-token source has k=1 and an undefined rho —
    # NULL, not an ANSI error (oracle nullif matches).
    rho = 1.0 - F.try_divide(
        6.0 * F.col("sum_d2").cast("double"), kk * (kk * kk - 1.0)
    )
    return agg.select("source", "k", "sum_d2", F.round(rho, 6).alias("rho"))


QUERIES["q_vocab_drift"] = q_vocab_drift

ORACLES["q_vocab_drift"] = f"""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    src_counts AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS n_s
        FROM tok GROUP BY 1, 2
    ),
    corpus AS (SELECT token, CAST(sum(n_s) AS BIGINT) AS n_c FROM src_counts GROUP BY token),
    top AS (
        SELECT source, token, n_s,
               row_number() OVER (PARTITION BY source ORDER BY n_s DESC, token) AS r_src
        FROM src_counts
        QUALIFY r_src <= {DRIFT_TOP_K}
    ),
    ranked AS (
        SELECT t.source, t.r_src,
               row_number() OVER (PARTITION BY t.source ORDER BY c.n_c DESC, t.token)
                   AS r_corp
        FROM top t JOIN corpus c USING (token)
    ),
    agg AS (
        SELECT source, CAST(count(*) AS BIGINT) AS k,
               CAST(sum((r_src - r_corp) * (r_src - r_corp)) AS BIGINT) AS sum_d2
        FROM ranked GROUP BY source
    )
    SELECT source, k, sum_d2,
           round(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
                 / nullif(CAST(k AS DOUBLE)
                          * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0), 0.0), 6)
               AS rho
    FROM agg
"""


def q_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix detection: documents sharing their first 12
    tokens verbatim — the C4-style sweep that catches templated headers,
    scraped navigation chrome, and mirror-site copies that full-document
    hashing misses once trailing content diverges.

    The prefix fingerprints via md5 over the joined first-12 tokens
    (engine-identical; the dedup-family foundation), so the heavy state
    is one GROUP BY on a 32-hex key — never document text. Groups with
    ≥ 2 documents surface with their size, distinct-source spread, and
    the smallest member id as the canonical exemplar.

    Scale shape: scan-side slice/join/hash (zero joins), ONE hash
    aggregate keyed on the fingerprint, bounded-output filter — the
    q_dedup_exact plan with a prefix key."""
    t = load_tables(spark, sf_dir)
    pfx = F.md5(F.array_join(F.slice(_tokens(), 1, 12), " "))
    agg = (
        t.documents.select(pfx.alias("prefix_hash"), "doc_id", "source")
        .groupBy("prefix_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("exemplar_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    # plain orderBy, NOT tiny_sorted: duplicate-prefix groups scale with
    # the corpus (templated crawls → millions of groups), so the
    # coalesce(1) single-task sort tiny_sorted is documented for bounded
    # key domains would become the job's bottleneck (r10 review)
    return agg.orderBy(F.desc("n_docs"), "prefix_hash")


QUERIES["q_prefix_dup"] = q_prefix_dup

ORACLES["q_prefix_dup"] = """
    SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 12), ' '))
               AS prefix_hash,
           count(*) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           min(doc_id) AS exemplar_doc
    FROM documents
    GROUP BY 1
    HAVING count(*) >= 2
    ORDER BY n_docs DESC, prefix_hash
"""


GOPHER_MIN_WORDS = 35
GOPHER_MEAN_LEN_LO = 3
GOPHER_MEAN_LEN_HI = 8
GOPHER_DIVERSITY_NUM = 3  # distinct/words must be ≥ 3/5


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule audit: per rule, how many documents
    fail — the pre-training filter report (Rae et al. 2021 §A1.1 class
    of rules) a corpus curator reads before choosing thresholds.

    Four rules, each an EXACT INTEGER predicate (cross-multiplied means,
    no float thresholds anywhere):
      too_short      n_words < 35
      mean_word_len  NOT 3 ≤ Σlen/n ≤ 8   (as 3n ≤ Σlen ≤ 8n)
      no_stopword    count('the') = 0
      low_diversity  distinct/n < 3/5      (as 5·distinct < 3·n)

    Scale shape: every signal is scan-side array arithmetic (size /
    list-sum of lengths / filter / distinct — whole-stage codegen, no
    explode, no shuffle of tokens); ONE global aggregate folds the four
    violation counts, and the 4-row report explodes from that single
    row. The fail share is integer-exact micro fixed-point."""
    from machinelearningalgomapreduce_spark.functions.fixedpoint import half_up

    t = load_tables(spark, sf_dir)
    toks = _tokens()
    nw = F.size(toks).cast("bigint")
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_the = F.size(F.filter(toks, lambda w: w == F.lit("the"))).cast("bigint")
    n_dist = F.size(F.array_distinct(toks)).cast("bigint")
    sig = t.documents.select(
        (nw < GOPHER_MIN_WORDS).cast("bigint").alias("f_short"),
        (
            ~((F.lit(GOPHER_MEAN_LEN_LO) * nw <= sum_len)
              & (sum_len <= F.lit(GOPHER_MEAN_LEN_HI) * nw))
        ).cast("bigint").alias("f_meanlen"),
        (n_the == 0).cast("bigint").alias("f_nostop"),
        (F.lit(5) * n_dist < F.lit(GOPHER_DIVERSITY_NUM) * nw)
        .cast("bigint").alias("f_lowdiv"),
    )
    m = sig.agg(
        F.count("*").alias("n_docs"),
        F.sum("f_short").alias("too_short"),
        F.sum("f_meanlen").alias("mean_word_len"),
        F.sum("f_nostop").alias("no_stopword"),
        F.sum("f_lowdiv").alias("low_diversity"),
    )
    rules = F.array(
        *[
            F.struct(F.lit(r).alias("rule"), F.col(r).alias("n_fail"))
            for r in ("too_short", "mean_word_len", "no_stopword", "low_diversity")
        ]
    )
    return (
        m.select("n_docs", F.explode(rules).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n_fail").alias("n_fail"),
            "n_docs",
            half_up(F.col("r.n_fail") * 1_000_000, F.col("n_docs")).alias(
                "fail_share_micro"
            ),
        )
    )


QUERIES["q_gopher_rules"] = q_gopher_rules

ORACLES["q_gopher_rules"] = """
    WITH sig AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
               CAST(list_sum(list_transform(string_split(text, ' '),
                                            w -> CAST(length(w) AS BIGINT)))
                    AS BIGINT) AS sum_len,
               CAST(len(list_filter(string_split(text, ' '), w -> w = 'the'))
                    AS BIGINT) AS n_the,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dist
        FROM documents
    ),
    m AS (
        SELECT count(*) AS n_docs,
               sum(CASE WHEN nw < 35 THEN 1 ELSE 0 END) AS too_short,
               sum(CASE WHEN NOT (3 * nw <= sum_len AND sum_len <= 8 * nw)
                        THEN 1 ELSE 0 END) AS mean_word_len,
               sum(CASE WHEN n_the = 0 THEN 1 ELSE 0 END) AS no_stopword,
               sum(CASE WHEN 5 * n_dist < 3 * nw THEN 1 ELSE 0 END) AS low_diversity
        FROM sig
    ),
    r AS (
        SELECT 'too_short' AS rule, CAST(too_short AS BIGINT) AS n_fail,
               CAST(n_docs AS BIGINT) AS n_docs FROM m
        UNION ALL
        SELECT 'mean_word_len', CAST(mean_word_len AS BIGINT), CAST(n_docs AS BIGINT) FROM m
        UNION ALL
        SELECT 'no_stopword', CAST(no_stopword AS BIGINT), CAST(n_docs AS BIGINT) FROM m
        UNION ALL
        SELECT 'low_diversity', CAST(low_diversity AS BIGINT), CAST(n_docs AS BIGINT) FROM m
    )
    SELECT rule, n_fail, n_docs,
           CAST(floor((2 * (n_fail * 1000000) + n_docs) / (2 * n_docs)) AS BIGINT)
               AS fail_share_micro
    FROM r
"""

def q_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring duplication: 16-token windows shared
    verbatim by ≥ 2 documents. This is the distributed form of the
    "duplicated training substrings" sweep (the suffix-array dedup family,
    e.g. Lee et al. 2021): whole-document hashing misses a copied
    paragraph inside otherwise-distinct pages, near-dup MinHash smears it
    into a global similarity score — the window fingerprint localizes it.

    Every document emits all n−15 consecutive 16-token windows (stride 1,
    so a shared run of ≥ 16 tokens is GUARANTEED to collide regardless of
    alignment — a stride-s emitter can only see runs the stride happens to
    align), each fingerprinted with md5 over the joined tokens
    (engine-identical; the dedup-family foundation). Groups touching ≥ 2
    distinct documents surface with occurrence/document/source counts and
    the smallest (doc, position) exemplar.

    Scale shape: the exploded window relation is O(total tokens) rows of
    (32-hex, ids) — the q_inverted_index / q_wordcount posture, shuffled
    once on the fingerprint with map-side partial aggregation; document
    text never shuffles. Output is TakeOrdered-capped at 100, so the
    driver sees a bounded result at any tier.
    """
    t = load_tables(spark, sf_dir)
    k = 16
    toks = t.documents.select(
        "doc_id", "source", _tokens().alias("toks"), F.size(_tokens()).alias("n")
    ).filter(F.col("n") >= k)
    win = (
        toks.select(
            "doc_id", "source", "toks",
            F.explode(F.sequence(F.lit(1), F.col("n") - (k - 1))).alias("pos"),
        )
        .select(
            "doc_id", "source", "pos",
            F.md5(F.array_join(F.slice("toks", F.col("pos"), k), " ")).alias("win_hash"),
        )
    )
    agg = (
        win.groupBy("win_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            # (doc, pos) argmin as one exact composite BIGINT: positions are
            # < 1e6 (window index into one document's token list; the emit
            # guard would overflow a document only past 10^6 tokens, far
            # beyond any fixture or practical page), so lexicographic
            # (doc_id, pos) order == numeric order of the composite.
            F.min(F.col("doc_id") * 1000000 + F.col("pos")).alias("first_key"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "win_hash", "n_occurrences", "n_docs", "n_sources",
            # integer `div`, not `/`: double division truncates past 2^53
            # (doc_id ≥ ~9e9 under the 1e6 position scale) while the
            # oracle's `//` stays exact; the composite itself holds to
            # doc_id ~9.2e12 (BIGINT), documented with the 1e6 guard above
            F.expr("first_key div 1000000").cast("bigint").alias("exemplar_doc"),
            (F.col("first_key") % 1000000).cast("bigint").alias("exemplar_pos"),
        )
    )
    return agg.orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "win_hash").limit(100)


QUERIES["q_substring_dup"] = q_substring_dup

ORACLES["q_substring_dup"] = """
    WITH win AS (
        SELECT doc_id, source, CAST(pos AS INTEGER) AS pos,
               md5(array_to_string(
                   list_slice(string_split(text, ' '), pos, pos + 15), ' '))
                   AS win_hash
        FROM (SELECT doc_id, source, text,
                     len(string_split(text, ' ')) AS n
              FROM documents WHERE len(string_split(text, ' ')) >= 16),
             unnest(range(1, n - 14)) AS u(pos)
    )
    SELECT win_hash,
           count(*) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(doc_id * 1000000 + pos) // 1000000 AS BIGINT) AS exemplar_doc,
           CAST(min(doc_id * 1000000 + pos) % 1000000 AS BIGINT) AS exemplar_pos
    FROM win
    GROUP BY win_hash
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, win_hash
    LIMIT 100
"""


# Shared double literal (the q_sprt discipline): interpolated into BOTH
# engines so neither side's libm ln(2) rounding matters.
LN2 = 0.6931471805599453


def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen-Shannon divergence from the corpus unigram
    pool — q_kl_divergence's bounded, symmetric, always-finite sibling
    (JS ≤ ln 2 even on disjoint support, which is why mixture monitors
    prefer it when a source can carry tokens the pool has never seen):
    JS(p‖q) = ½Σp·ln(2p/(p+q)) + ½Σq·ln(2q/(p+q)), p the source
    distribution, q the corpus pool. Also emits the [0,1] JS distance
    √(JS/ln 2).

    Exactness: in-vocabulary terms use double products n·M and m·N
    (each ONE correctly-rounded multiply — never a >2⁶³ integer
    product) through the same division/ln sequence in both engines,
    folded in token order seeded at 0.0 (the q_g_test discipline);
    the out-of-vocabulary remainder is EXACT — Σ_{t∉s} q·ln2 =
    ln2·(1 − Σ_in m / M) with Σ_in m an exact BIGINT — and ln 2 is a
    shared double literal, so no libm constant is trusted.

    Scale shape: q_kl_divergence's — one (source, token) counting
    aggregate, one vocab-bounded marginal join, O(sources) rollups;
    the fold runs on the per-source vocabulary frame."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("source", F.explode(_tokens()).alias("token"))
    counts = tok.groupBy("source", "token").agg(F.count("*").alias("n"))
    marg = counts.groupBy("token").agg(F.sum("n").alias("m"))
    tot = marg.agg(F.sum("m").alias("big_m"))
    per_src = counts.groupBy("source").agg(F.sum("n").alias("n_s"))
    joined = (
        counts.join(marg, "token")
        .join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(tot))
    )
    n_d = F.col("n").cast("double")
    m_d = F.col("m").cast("double")
    ns_d = F.col("n_s").cast("double")
    bm_d = F.col("big_m").cast("double")
    nM = n_d * bm_d
    mN = m_d * ns_d
    term = (n_d / ns_d) * F.log(2.0 * nM / (nM + mN)) + (m_d / bm_d) * F.log(
        2.0 * mN / (nM + mN)
    )
    with_terms = joined.select(
        "source", "token", "n_s", "m", term.alias("term")
    )
    folded = with_terms.groupBy("source").agg(
        F.max("n_s").alias("n_tokens"),
        F.sum("m").alias("m_in"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("token", "term"))),
                lambda s: s["term"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("s_in"),
    )
    js = 0.5 * F.col("s_in") + 0.5 * F.lit(LN2) * (
        1.0 - F.col("m_in").cast("double") / F.col("big_m").cast("double")
    )
    out = folded.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.round(js, 6).alias("js"),
        F.round(F.sqrt(F.greatest(F.lit(0.0), js / F.lit(LN2))), 6).alias(
            "js_dist"
        ),
    )
    # O(sources) rows: single-partition sort, never a range exchange
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    return tiny_sorted(out, "source")


QUERIES["q_js_divergence"] = q_js_divergence

ORACLES["q_js_divergence"] = f"""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY 1, 2
    ),
    marg AS (SELECT token, CAST(sum(n) AS BIGINT) AS m FROM counts GROUP BY token),
    tot AS (SELECT CAST(sum(m) AS BIGINT) AS big_m FROM marg),
    per_src AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_s FROM counts GROUP BY source),
    terms AS (
        SELECT c.source, c.token, p.n_s, mg.m,
               (CAST(c.n AS DOUBLE) / CAST(p.n_s AS DOUBLE))
               * ln(2.0 * (CAST(c.n AS DOUBLE) * CAST((SELECT big_m FROM tot) AS DOUBLE))
                    / (CAST(c.n AS DOUBLE) * CAST((SELECT big_m FROM tot) AS DOUBLE)
                       + CAST(mg.m AS DOUBLE) * CAST(p.n_s AS DOUBLE)))
               + (CAST(mg.m AS DOUBLE) / CAST((SELECT big_m FROM tot) AS DOUBLE))
               * ln(2.0 * (CAST(mg.m AS DOUBLE) * CAST(p.n_s AS DOUBLE))
                    / (CAST(c.n AS DOUBLE) * CAST((SELECT big_m FROM tot) AS DOUBLE)
                       + CAST(mg.m AS DOUBLE) * CAST(p.n_s AS DOUBLE))) AS term
        FROM counts c
        JOIN marg mg USING (token)
        JOIN per_src p USING (source)
    ),
    folded AS (
        SELECT source,
               CAST(max(n_s) AS BIGINT) AS n_tokens,
               CAST(sum(m) AS BIGINT) AS m_in,
               list_reduce(list_prepend(0.0, list(term ORDER BY token)),
                           (a, x) -> a + x) AS s_in
        FROM terms GROUP BY source
    )
    SELECT source, n_tokens,
           round(0.5 * s_in
                 + 0.5 * {LN2} * (1.0 - CAST(m_in AS DOUBLE)
                                  / CAST((SELECT big_m FROM tot) AS DOUBLE)), 6) AS js,
           round(sqrt(greatest(0.0,
                 (0.5 * s_in
                  + 0.5 * {LN2} * (1.0 - CAST(m_in AS DOUBLE)
                                   / CAST((SELECT big_m FROM tot) AS DOUBLE)))
                 / {LN2})), 6) AS js_dist
    FROM folded
    ORDER BY source
"""
