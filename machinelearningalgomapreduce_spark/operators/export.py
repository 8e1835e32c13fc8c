"""Training-data export operators (SURVEY.md §2D tier): the last mile of
an LLM data pipeline — sharding a cleaned corpus for distributed training,
packing documents into context windows, checking vocabulary coverage,
fuzzy-matching reference lists, and extracting salient terms.

All candidate generation is blocked/banded (never all-pairs), shard
assignment is content-hash deterministic (md5, engine-portable), and every
shuffle is bounded by a model-sized domain (shards, windows, vocabulary,
name-length bands) — the 100 TB posture of operators/dedup.py applied to
the export stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from machinelearningalgomapreduce_spark.sources.catalog import load_tables

N_SHARDS = 16
CTX_LEN = 2048
VOCAB_TOP = 100
FUZZY_MAX_DIST = 2
FUZZY_BAND = 4  # length-band width; > max dist so candidates span ≤2 bands
TOPK_TERMS = 3
GROUP_SAMPLE_N = 5


def _ws_tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def _split_digit():
    """First md5 hex digit of the salted doc id — THE split membership
    expression; q_train_test_split assigns with it and q_srm_check audits
    with it, so the two can never validate different splits."""
    return F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 1
    )


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for training-data export: shard =
    first md5 hex digit of the doc id (16 shards), per-shard doc/token/char
    rollup. Hash sharding is reproducible across engines, runs, and
    partitionings — unlike round-robin or partition-index schemes — so a
    resumed export writes byte-identical shards.

    Scale shape: scan-side shard computation + one 16-key aggregate with
    map-side partials; the writer side would be `repartition(shard)` +
    partitioned parquet, no other shuffle."""
    t = load_tables(spark, sf_dir)
    shard = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    ).alias("shard")
    return (
        t.documents.select(
            shard,
            F.size(_ws_tokens()).cast("bigint").alias("n_tok"),
            F.length("text").cast("bigint").alias("n_chr"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_chr").alias("n_chars"),
        )
    )


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing: per-source token shares and the
    downsampling rate that flattens the mix to the uniform target —
    the "domain weights" computation every multi-source training run
    performs before export (web-heavy crawls get rate < 1, small
    high-quality sources keep rate = 1; no upsampling).

    Exactness: shares and rates are doubles derived from exact integer
    token counts and rounded to 6; the kept-token projection uses floor
    (engine-identical) on the UNROUNDED rate so totals stay consistent.

    Scale shape: one corpus aggregate keyed by source with map-side
    partials + a broadcast 1-row totals join — nothing else touches
    corpus-sized data."""
    t = load_tables(spark, sf_dir)
    per_source = (
        t.documents.select("source", F.size(_ws_tokens()).cast("bigint").alias("n_tok"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    totals = per_source.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.count("*").alias("n_sources")
    )
    share = F.col("n_tokens") / F.col("tot_tokens").cast("double")
    target = 1.0 / F.col("n_sources").cast("double")
    rate = F.least(F.lit(1.0), target / share)
    return per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(rate, 6).alias("sample_rate"),
        F.floor(F.col("n_tokens") * rate).cast("bigint").alias("kept_tokens"),
    )


def rendezvous_assign(df: DataFrame, key_col: str, nodes: list[str]) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment (library API) —
    the consistent-hashing complement to q_shard_assign's mod-N: each key
    goes to argmax over nodes of hash(key, node), so ADDING a node moves
    ONLY the keys that now prefer it (≈ 1/(n+1) of them) and removing one
    moves only its own keys — no global reshuffle. The property is exact
    and is asserted in tests, not just claimed.

    Scale shape: pure scan-side expression — an O(|nodes|) struct-array
    argmax per row, no shuffle, no UDF; |nodes| is cluster-sized (tens),
    not data-sized."""
    if not nodes:
        raise ValueError("rendezvous_assign needs at least one node")
    scored = F.array(
        *[
            F.struct(
                F.xxhash64(F.col(key_col).cast("string"), F.lit(n)).alias("h"),
                F.lit(n).alias("node"),
            )
            for n in nodes
        ]
    )
    return df.withColumn("assigned_node", F.array_max(scored)["node"])


def temperature_mix(
    documents: DataFrame,
    temperature: float = 2.0,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled source mixture (library API) — the sampling-rate
    schedule multilingual/multi-source training runs use: source weights
    p_s ∝ share_s^(1/T) renormalized, so T=1 keeps the natural mix, T→∞
    approaches uniform, and intermediate T up-weights small sources without
    drowning the big ones. Returns per source the natural token share, the
    temperature-scaled target share, and the resulting per-document
    sampling rate (target/natural, capped at 1 — no upsampling; the
    uncapped ratio is also emitted for epoch-repeat planning).

    Scale shape: identical to q_domain_mix — one corpus aggregate keyed by
    source with map-side partials, a broadcast 1-row totals join, output
    bounded by the source count. Pure double arithmetic off the oracle
    paths (pow is libm-dependent, so this stays library-tier).
    """
    if not temperature > 0:
        raise ValueError(
            f"temperature must be > 0, got {temperature} (0 divides by "
            "zero; negative values would invert the flattening)"
        )
    per_source = (
        documents.select(
            F.col(source_col).alias("source"),
            F.size(_ws_tokens(text_col)).cast("bigint").alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    share = F.col("n_tokens") / F.col("tot_tokens").cast("double")
    scaled = F.pow(share, 1.0 / temperature)
    totals = per_source.agg(F.sum("n_tokens").alias("tot_tokens"))
    with_share = per_source.crossJoin(F.broadcast(totals)).select(
        "source", "n_docs", "n_tokens", share.alias("natural_share"),
        scaled.alias("scaled_raw"),
    )
    z = with_share.agg(F.sum("scaled_raw").alias("z"))
    ratio = (F.col("scaled_raw") / F.col("z")) / F.col("natural_share")
    return with_share.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        "natural_share",
        (F.col("scaled_raw") / F.col("z")).alias("target_share"),
        ratio.alias("repeat_factor"),
        F.least(F.lit(1.0), ratio).alias("sample_rate"),
    )


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Fixed-size token chunking with overlap (library API) — the
    splitting half of the training exporter (q_seq_pack is the packing
    half): each document's whitespace token stream is cut into windows
    of `chunk_tokens` advancing by `chunk_tokens − overlap`, so
    consecutive chunks share `overlap` tokens of context. Returns
    (doc_id, chunk_id, n_tokens, chunk_text); the final partial chunk is
    kept (n_tokens ≤ chunk_tokens).

    Scale shape: pure scan-side fan-out — split, a `sequence` of start
    offsets, explode, slice, join — NO shuffle anywhere; chunk ids are
    per-document ordinals so downstream shard assignment stays
    content-deterministic."""
    t = load_tables(spark, sf_dir)
    return chunk_token_streams(t.documents, chunk_tokens, overlap)


def chunk_token_streams(
    docs: DataFrame, chunk_tokens: int = 64, overlap: int = 8
) -> DataFrame:
    """DataFrame-level core of `chunk_documents`: chunk any (doc_id, text)
    frame — the composable form the pipeline demo chains after its own
    filtering stages."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap {overlap} must be in [0, {chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).withColumn("n", F.size("toks"))
    # Last start is capped at floor((n−overlap−1)/stride)·stride: a chunk
    # starting at s only adds tokens beyond its predecessor's window when
    # s ≤ n−overlap−1, so the old (n−1) cap emitted a final chunk fully
    # contained in the previous one whenever (n−1) mod stride < overlap —
    # duplicated training text (ADVICE r5). Coverage still holds: the
    # capped last start satisfies s_max + chunk_tokens ≥ n.
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            F.floor((F.col("n") - overlap - 1) / F.lit(stride)).cast("int") * stride,
        ),
        F.lit(stride),
    )
    exploded = toks.select(
        "doc_id", "toks", "n", F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        (F.col("start") / stride).cast("int").alias("chunk_id"),
        F.least(F.lit(chunk_tokens), F.col("n") - F.col("start")).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents are concatenated in doc_id order
    within each source and cut into 2048-token windows; a document belongs
    to the window where its first token lands (streaming-concat
    semantics — the packing a sequence-training exporter performs).
    Per (source, window): docs, tokens, fill ratio.

    All window arithmetic is exact integers (cumulative token offsets,
    `div` floor); only the fill ratio is a rounded double — and its
    round(sum(n_tok)/CTX_LEN, 6) is NOT the half-boundary class (r15
    audit): sum(n_tok) is an exact BIGINT sum, the division by a constant
    is one correctly-rounded double op, identical in both engines.

    Scale shape: one cumulative window per source partition (the same
    shuffle a sessionize pays), then an O(windows) aggregate. Sources
    partition the sort, so no global order is required."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("source").orderBy("doc_id")
    toks = (
        t.documents.select("source", "doc_id", F.size(_ws_tokens()).cast("bigint").alias("n_tok"))
        .withColumn("cum", F.sum("n_tok").over(w))
        .withColumn("start", F.col("cum") - F.col("n_tok"))
        .withColumn("win_id", F.expr(f"start div {CTX_LEN}"))
    )
    return toks.groupBy("source", "win_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.sum("n_tok") / F.lit(float(CTX_LEN)), 6).alias("fill_ratio"),
    )


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage per source: build the corpus top-100 token
    vocabulary (count desc, token asc — deterministic), then report each
    source's out-of-vocabulary token rate. The tokenizer-fit sanity check
    run before committing a corpus mix.

    Scale shape: token aggregate (vocabulary-bounded shuffle) → top-k →
    the vocab re-joined as a BROADCAST membership table onto the
    per-source token counts; the corpus is never shuffled twice."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("source", F.explode(_ws_tokens()).alias("token"))
    corpus_counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    vocab = (
        corpus_counts.withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("n"), "token"))
        )
        .filter(F.col("rk") <= VOCAB_TOP)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    per_source = tok.groupBy("source", "token").agg(F.count("*").alias("n"))
    flagged = per_source.join(F.broadcast(vocab), "token", "left")
    oov_n = F.sum(F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(F.lit(0)))
    return flagged.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        oov_n.alias("n_oov"),
        F.round(oov_n / F.sum("n").cast("double"), 6).alias("oov_rate"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("in_vocab").isNull().cast("bigint")).alias("n_distinct_oov"),
    )


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join: distinct part names within Levenshtein distance 2,
    banded by name length so candidate generation is an EQUI-join (each
    name probes its own 4-char length band and the next one; a ≤2-edit
    pair differs by ≤2 chars, hence spans at most adjacent bands) — the
    entity-resolution primitive for matching reference lists at scale
    without an all-pairs cross join.

    Determinism: levenshtein is the same classic edit distance in both
    engines; pairs are oriented name_a < name_b; widths cast to BIGINT."""
    t = load_tables(spark, sf_dir)
    names = t.part.select("p_name").distinct().select(
        "p_name", F.length("p_name").alias("len")
    )
    band = F.expr(f"len div {FUZZY_BAND}")
    # Each side emits (band) and (band+1); a pair is generated exactly once
    # at g = greatest(band_a, band_b).
    probes = names.select(
        "p_name", "len", band.alias("band"), F.explode(F.array(band, band + 1)).alias("g")
    )
    a = probes.select(
        F.col("p_name").alias("name_a"), F.col("len").alias("len_a"),
        F.col("band").alias("band_a"), "g",
    )
    b = probes.select(
        F.col("p_name").alias("name_b"), F.col("len").alias("len_b"),
        F.col("band").alias("band_b"), "g",
    )
    pairs = (
        a.join(b, "g")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.col("g") == F.greatest("band_a", "band_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= FUZZY_MAX_DIST)
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
    )
    return pairs


def q_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: each document's top-3 TF-IDF terms (rounded
    tf-idf desc, token asc — deterministic). The per-doc salient-term
    surface a retrieval or labeling pipeline exports next to the text.

    Scale shape: the q_tfidf chain (tf → df → broadcast N) plus ONE
    per-doc window over the (doc, token) frame — partitioned by doc_id,
    never a global sort."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(_ws_tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = t.documents.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tf_idf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tf_idf"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOPK_TERMS)
        .select("doc_id", "token", "tf_idf", "rk")
    )


N_HASH_FEATURES = 64


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (HashingTF-style feature extraction): tokens
    hashed into a fixed 64-bucket feature space per document — the
    fixed-width, vocabulary-free featurization a streaming training
    pipeline uses when the vocabulary is unbounded.

    The bucket is md5-derived (first two hex digits mod 64) so both
    engines hash identically — unlike engine-native hash() — and the
    output is reproducible across runs and partitionings.

    Scale shape: scan-side hashing + one (doc, bucket) aggregate; shuffle
    width is docs × ≤64, independent of vocabulary size."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(_ws_tokens()).alias("token"))
    h = F.md5(F.col("token"))
    byte = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1) * 16
        + F.instr(F.lit("0123456789abcdef"), F.substring(h, 2, 1))
        - 1
    )
    return (
        tok.select("doc_id", F.pmod(byte, F.lit(N_HASH_FEATURES)).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )


BPE_TOP = 20


def q_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge round: count adjacent character pairs across
    the corpus weighted by word frequency and report the top-20 merge
    candidates — the inner loop of byte-pair-encoding tokenizer training,
    expressed as the reference's map(emit pairs)+reduce(sum) shape.

    Word frequencies aggregate first (vocabulary-bounded), then each
    DISTINCT word explodes into its adjacent char pairs — corpus size
    enters only through the integer weights, so the explode cost is
    O(vocab × word length), not O(corpus).

    Determinism: pure integer counts; top-k breaks ties on the pair string.

    Scale shape: token-count aggregate → per-word pair explode → pair
    aggregate (both key domains vocabulary-bounded) → TakeOrdered top-k."""
    t = load_tables(spark, sf_dir)
    words = (
        t.documents.select(F.explode(_ws_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wn"))
        .filter(F.length("word") >= 2)
    )
    # substring with a column start position needs expr().
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")
        ).alias("pair"),
        "wn",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").alias("score"))
        .orderBy(F.desc("score"), "pair")
        .limit(BPE_TOP)
    )


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source document sample (GROUP_SAMPLE_N per
    source): order within each source by the md5 of the doc id — a
    reproducible pseudo-random shuffle — and keep the first k. This is
    how eval/holdout sets get carved from a training corpus so that
    re-running the export yields byte-identical membership.

    Scale shape: one window per source over the md5 order. At 100 TB
    pre-filter with a hash threshold first (md5 < bound keeping ~3k×
    margin) so the sort input per source is k-scale, not corpus-scale —
    same result, the window only ranks survivors."""
    w = W.partitionBy("source").orderBy("h", "doc_id")
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select(
            "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_SAMPLE_N)
        .select("source", "doc_id", "rk")
    )


def bpe_merge_table(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> list[tuple[tuple[str, str], int]]:
    """Full BPE tokenizer-training loop (library API, pytest-verified):
    repeat [count adjacent symbol pairs weighted by word frequency → merge
    the top pair] n_merges times; returns [(merged_token, score), ...].

    Division of labor at scale (the shape real BPE trainers use): the
    CORPUS-sized work is the one distributed word-frequency aggregate;
    the merge loop runs on the VOCABULARY (bounded, driver-side symbol
    table) — the corpus is scanned once and never collected. Round 0's
    pair scores are exactly q_bpe_merge's checked output (tie-break:
    score desc, pair asc), asserted in tests."""
    t = load_tables(spark, sf_dir)
    wc = {
        r.word: r.wn
        for r in (
            t.documents.select(F.explode(_ws_tokens()).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("wn"))
            .filter(F.length("word") >= 2)
        ).collect()  # vocabulary-bounded (31 tokens on this fixture)
    }
    symbols = {w: list(w) for w in wc}
    merges: list[tuple[str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in symbols.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wc[w]
        if not counts:
            break
        # Tie-break on the pair TUPLE (ADVICE r4): concatenation cannot
        # distinguish ('ab','c') from ('a','bc') and would fall back to
        # dict insertion order, which derives from a collect().
        (a, b), score = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(((a, b), score))
        for w, syms in symbols.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = out
    return merges


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-aware duplication matrix: minhash near-dup pairs
    (operators/dedup.py::q_dedup_minhash) rolled up by the SOURCE PAIR of
    the two documents — the "are these two crawls copies of each other"
    read-out a corpus-mixing decision needs (q_source_jaccard measures
    vocabulary overlap; this measures actual duplicated documents).
    Within-source pairs report as (src, src); cross-source pairs are the
    contamination signal.

    Scale shape: inherits the band-bucket candidate generation (shuffle
    moves band keys, never documents); the source join touches only the
    O(pairs) frame; rollup domain is sources²."""
    from machinelearningalgomapreduce_spark.operators.dedup import q_dedup_minhash

    t = load_tables(spark, sf_dir)
    pairs = q_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    src = t.documents.select("doc_id", "source")
    labeled = (
        pairs.join(src.withColumnRenamed("source", "src_a"), pairs.doc_a == src.doc_id)
        .drop("doc_id")
        .join(
            src.withColumnRenamed("source", "src_b").withColumnRenamed("doc_id", "doc_id_b"),
            F.col("doc_b") == F.col("doc_id_b"),
        )
        .select(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
    )
    return labeled.groupBy("source_x", "source_y").agg(
        F.count("*").alias("n_dup_pairs"),
        (F.col("source_x") != F.col("source_y")).alias("cross_source"),
    )


TOKEN_BUDGET = 10_000
TRAIN_HEX = tuple("0123456789abc")  # 13/16 of md5 space ≈ 81% train


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum budget fill: admit the highest-quality documents first
    until a global token budget is spent, then report what each source
    contributed — the "best 10B tokens out of 100 TB" selection every
    budgeted training run makes after scoring.

    A document is admitted if it STARTS within the budget (cum − n_tok <
    B over the (quality desc, doc_id) order), so the cut is a prefix of
    the quality ranking and deterministic (quality_score is the shared
    rounded composite from operators/text.py — never re-derived).

    Scale shape: the global cumulative window is the fixture-scale plan;
    at 100 TB you binary-search a quality threshold from a per-bucket
    token histogram (bounded domain) and only window the knife-edge
    bucket — same output, no global sort. Output is the per-source
    rollup (bounded domain)."""
    from machinelearningalgomapreduce_spark.operators.text import q_quality_score

    t = load_tables(spark, sf_dir)
    quality = q_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    docs = t.documents.select(
        "doc_id", "source", F.size(_ws_tokens()).cast("bigint").alias("n_tok")
    ).join(quality, "doc_id")
    w = W.orderBy(F.desc("quality_score"), "doc_id")
    admitted = (
        docs.withColumn("cum", F.sum("n_tok").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .filter(F.col("cum") - F.col("n_tok") < TOKEN_BUDGET)
    )
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    agg = admitted.groupBy("source").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("n_tok").alias("tokens_kept"),
        F.round(F.min("quality_score"), 6).alias("min_quality_admitted"),
    )
    return tiny_sorted(agg, "source")


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split (train ≈ 81% / test ≈ 19%) with per-source
    stratification report: split membership is the first md5 hex digit of
    a salted doc id — reproducible across engines, runs, partitionings,
    and corpus growth (a doc never flips split when new data arrives,
    unlike row_number or random splits).

    Scale shape: per-row hash + one aggregate on the bounded
    (source, split) domain; the within-source fraction comes from a
    window over that already-aggregated frame (≤ sources × 2 rows)."""
    t = load_tables(spark, sf_dir)
    split = F.when(_split_digit().isin(*TRAIN_HEX), "train").otherwise("test")
    per = (
        t.documents.select(
            "source",
            split.alias("split"),
            F.size(_ws_tokens()).cast("bigint").alias("n_tok"),
        )
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    wsrc = W.partitionBy("source")
    out = per.withColumn(
        "frac_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(wsrc), 6),
    )
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    return tiny_sorted(out, "source", "split")


def q_weighted_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic length-weighted sampling: per source, the document
    selected with probability proportional to its character count — the
    exact-integer form of weighted sampling (mixture construction,
    spot-check selection) that stays reproducible across engines, runs,
    and partitionings.

    Mechanism: documents order by doc_id within a source; the pick is the
    first doc whose cumulative n_chars exceeds a salted-md5-derived
    threshold in [0, total_chars). Everything is BIGINT arithmetic — no
    floats, no libm, no rand() — so the selection is bit-reproducible
    (the float exponential-race A-Res form would hinge on cross-libm
    pow/ln ulps; this integer form does not).

    Scale shape: one per-source cumulative window (the seq_pack shuffle)
    + a broadcast threshold join; output is source-bounded."""
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("w")
    )
    totals = docs.groupBy("source").agg(F.sum("w").alias("total_w"))
    # Threshold: first 15 md5 hex chars of the salted source name → 60-bit
    # int, reduced mod total weight. 8 chars (32 bits) looked like enough
    # but inverts at scale (r10 review): any source whose total character
    # weight exceeds 2^32 — guaranteed at the 100 TB posture — would
    # confine the pick to its first ~4.3 G characters and give every later
    # document zero probability. 60 bits clears any bigint-weight corpus.
    thr = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("pick:"), F.col("source"))), 1, 15), 16, 10)
        .cast("bigint"),
        F.col("total_w"),
    )
    w = W.partitionBy("source").orderBy("doc_id")
    cum = F.sum("w").over(w)
    picked = (
        docs.join(F.broadcast(totals.select("source", thr.alias("thr"))), "source")
        .withColumn("cum", cum)
        .filter((F.col("cum") - F.col("w") <= F.col("thr")) & (F.col("thr") < F.col("cum")))
        .select("source", F.col("doc_id").alias("picked_doc"), F.col("w").alias("doc_chars"))
    )
    from machinelearningalgomapreduce_spark.operators.relational import tiny_sorted

    return tiny_sorted(picked, "source")


QUERIES = {
    "q_weighted_pick": q_weighted_pick,
    "q_token_budget": q_token_budget,
    "q_train_test_split": q_train_test_split,
    "q_cross_source_dups": q_cross_source_dups,
    "q_domain_mix": q_domain_mix,
    "q_group_sample": q_group_sample,
    "q_shard_assign": q_shard_assign,
    "q_seq_pack": q_seq_pack,
    "q_vocab_coverage": q_vocab_coverage,
    "q_fuzzy_join": q_fuzzy_join,
    "q_topk_terms": q_topk_terms,
    "q_feature_hash": q_feature_hash,
    "q_bpe_merge": q_bpe_merge,
}

ORACLES = {
    "q_token_budget": None,  # filled below: needs QUALITY_SCORE_SQL
    "q_train_test_split": f"""
        WITH per AS (
            SELECT source,
                   CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0','1','2','3','4','5','6','7','8','9','a','b','c')
                        THEN 'train' ELSE 'test' END AS split,
                   count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents
            GROUP BY 1, 2
        )
        SELECT source, split, n_docs, n_tokens,
               round(CAST(n_docs AS DOUBLE)
                     / sum(n_docs) OVER (PARTITION BY source), 6) AS frac_docs
        FROM per
        ORDER BY source, split
    """,
    "q_group_sample": f"""
        WITH h AS (
            SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ), r AS (
            SELECT source, doc_id,
                   CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                        AS INTEGER) AS rk
            FROM h
        )
        SELECT source, doc_id, rk FROM r WHERE rk <= {GROUP_SAMPLE_N}
    """,
    "q_domain_mix": """
        WITH per_source AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ), totals AS (
            SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
                   count(*) AS n_sources
            FROM per_source
        )
        SELECT source, n_docs, n_tokens,
               round(n_tokens / CAST(tot_tokens AS DOUBLE), 6) AS token_share,
               round(least(1.0, (1.0 / CAST(n_sources AS DOUBLE))
                                / (n_tokens / CAST(tot_tokens AS DOUBLE))), 6)
                   AS sample_rate,
               CAST(floor(n_tokens * least(1.0, (1.0 / CAST(n_sources AS DOUBLE))
                                / (n_tokens / CAST(tot_tokens AS DOUBLE)))) AS BIGINT)
                   AS kept_tokens
        FROM per_source CROSS JOIN totals
    """,
    "q_shard_assign": """
        SELECT instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                   AS shard,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(sum(length(text)) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY 1
    """,
    "q_seq_pack": f"""
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ), packed AS (
            SELECT source, n_tok,
                   (CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    - n_tok) // {CTX_LEN} AS win_id
            FROM toks
        )
        SELECT source, win_id,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               round(CAST(sum(n_tok) AS BIGINT) / {float(CTX_LEN)}, 6) AS fill_ratio
        FROM packed
        GROUP BY source, win_id
    """,
    "q_vocab_coverage": f"""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
        ), corpus_counts AS (
            SELECT token, count(*) AS n FROM tok GROUP BY token
        ), vocab AS (
            SELECT token FROM (
                SELECT token, row_number() OVER (ORDER BY n DESC, token) AS rk
                FROM corpus_counts
            ) WHERE rk <= {VOCAB_TOP}
        ), per_source AS (
            SELECT source, token, count(*) AS n FROM tok GROUP BY source, token
        )
        SELECT p.source,
               CAST(sum(p.n) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.token IS NULL THEN p.n ELSE 0 END) AS BIGINT) AS n_oov,
               round(sum(CASE WHEN v.token IS NULL THEN p.n ELSE 0 END)
                     / CAST(sum(p.n) AS DOUBLE), 6) AS oov_rate,
               count(*) AS n_distinct,
               CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_distinct_oov
        FROM per_source p LEFT JOIN vocab v ON p.token = v.token
        GROUP BY p.source
    """,
    "q_fuzzy_join": f"""
        WITH names AS (
            SELECT DISTINCT p_name, length(p_name) AS len FROM part
        ), probes AS (
            SELECT p_name, len, len // {FUZZY_BAND} AS band,
                   unnest([len // {FUZZY_BAND}, len // {FUZZY_BAND} + 1]) AS g
            FROM names
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM probes a JOIN probes b ON a.g = b.g
        WHERE a.p_name < b.p_name
          AND a.g = greatest(a.band, b.band)
          AND abs(a.len - b.len) <= {FUZZY_MAX_DIST}
          AND levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
    "q_bpe_merge": f"""
        WITH words AS (
            SELECT word, count(*) AS wn
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            GROUP BY word
            HAVING length(word) >= 2
        ), pairs AS (
            SELECT unnest(list_transform(range(1, length(word)),
                                         i -> substr(word, CAST(i AS INTEGER), 2))) AS pair,
                   wn
            FROM words
        )
        SELECT pair, CAST(sum(wn) AS BIGINT) AS score
        FROM pairs
        GROUP BY pair
        ORDER BY score DESC, pair
        LIMIT {BPE_TOP}
    """,
    "q_feature_hash": f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        )
        SELECT doc_id,
               ((instr('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 16
                + instr('0123456789abcdef', substr(md5(token), 2, 1)) - 1)
                   % {N_HASH_FEATURES} AS bucket,
               count(*) AS n
        FROM tok
        GROUP BY 1, 2
    """,
    "q_topk_terms": f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
        ), df AS (
            SELECT token, count(*) AS df FROM tf GROUP BY token
        ), n AS (
            SELECT count(*) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.token,
                   round(tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)), 6) AS tf_idf
            FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
        )
        SELECT doc_id, token, tf_idf, rk
        FROM (
            SELECT doc_id, token, tf_idf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tf_idf DESC, token) AS rk
            FROM scored
        )
        WHERE rk <= {TOPK_TERMS}
    """,
}

# The dup-pair candidate set must be IDENTICAL to q_dedup_minhash's, so the
# oracle reuses dedup's minhash CTE chain verbatim (same shingles, same
# signature permutations, same band keys, same verification threshold).
from machinelearningalgomapreduce_spark.operators.dedup import (  # noqa: E402
    _MINHASH_CTES,
    JACCARD_THRESHOLD,
)

ORACLES["q_cross_source_dups"] = f"""
    WITH {_MINHASH_CTES}, dup_pairs AS (
        SELECT doc_a, doc_b FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
    ), labeled AS (
        SELECT least(da.source, db.source) AS source_x,
               greatest(da.source, db.source) AS source_y
        FROM dup_pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
    )
    SELECT source_x, source_y,
           count(*) AS n_dup_pairs,
           source_x != source_y AS cross_source
    FROM labeled
    GROUP BY source_x, source_y
"""

from machinelearningalgomapreduce_spark.operators.text import QUALITY_SCORE_SQL  # noqa: E402

ORACLES["q_token_budget"] = f"""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               {QUALITY_SCORE_SQL} AS quality_score
        FROM documents
    ),
    ranked AS (
        SELECT source, n_tok, quality_score,
               sum(n_tok) OVER (ORDER BY quality_score DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM scored
    )
    SELECT source,
           count(*) AS n_docs_kept,
           CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
           round(min(quality_score), 6) AS min_quality_admitted
    FROM ranked
    WHERE cum - n_tok < {TOKEN_BUDGET}
    GROUP BY source
    ORDER BY source
"""

ORACLES["q_weighted_pick"] = """
    WITH docs AS (
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w
        FROM documents
    ),
    totals AS (
        SELECT source, CAST(sum(w) AS BIGINT) AS total_w,
               ((instr('0123456789abcdef', substr(md5('pick:' || source), 1, 1)) - 1) * 72057594037927936 + (instr('0123456789abcdef', substr(md5('pick:' || source), 2, 1)) - 1) * 4503599627370496 + (instr('0123456789abcdef', substr(md5('pick:' || source), 3, 1)) - 1) * 281474976710656 + (instr('0123456789abcdef', substr(md5('pick:' || source), 4, 1)) - 1) * 17592186044416 + (instr('0123456789abcdef', substr(md5('pick:' || source), 5, 1)) - 1) * 1099511627776 + (instr('0123456789abcdef', substr(md5('pick:' || source), 6, 1)) - 1) * 68719476736 + (instr('0123456789abcdef', substr(md5('pick:' || source), 7, 1)) - 1) * 4294967296 + (instr('0123456789abcdef', substr(md5('pick:' || source), 8, 1)) - 1) * 268435456 + (instr('0123456789abcdef', substr(md5('pick:' || source), 9, 1)) - 1) * 16777216 + (instr('0123456789abcdef', substr(md5('pick:' || source), 10, 1)) - 1) * 1048576 + (instr('0123456789abcdef', substr(md5('pick:' || source), 11, 1)) - 1) * 65536 + (instr('0123456789abcdef', substr(md5('pick:' || source), 12, 1)) - 1) * 4096 + (instr('0123456789abcdef', substr(md5('pick:' || source), 13, 1)) - 1) * 256 + (instr('0123456789abcdef', substr(md5('pick:' || source), 14, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5('pick:' || source), 15, 1)) - 1) * 1) % CAST(sum(w) AS BIGINT) AS thr
        FROM docs GROUP BY source
    ),
    cum AS (
        SELECT d.source, d.doc_id, d.w, t.thr,
               sum(d.w) OVER (PARTITION BY d.source ORDER BY d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM docs d JOIN totals t USING (source)
    )
    SELECT source, doc_id AS picked_doc, CAST(w AS BIGINT) AS doc_chars
    FROM cum
    WHERE cum - w <= thr AND thr < cum
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# Oracle-checked round-6 additions (deferred driver window).

RV_NODES = tuple(f"node{i:02d}" for i in range(8))


def q_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment of documents
    onto a fixed node list, reported as the per-node load profile: owner
    = argmax over nodes of md5(node ‖ ':' ‖ doc_id), compared as hex
    STRINGS (lexicographic — no numeric conversion, trivially
    engine-portable), ties to the larger node name. The md5 oracle-
    checked twin of the `rendezvous_assign` library API: HRW is what
    gives minimal reshuffling when a node joins/leaves (only that node's
    keys move — the q_shard_assign mod-N scheme reshuffles ~everything).

    Scale shape: the candidate scores are a per-row array of |nodes|
    structs reduced by array_max — NO explode, NO join, one aggregate on
    the bounded node domain."""
    t = load_tables(spark, sf_dir)
    cand = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat(F.lit(n + ":"), F.col("doc_id").cast("string"))
                ).alias("h"),
                F.lit(n).alias("node"),
            )
            for n in RV_NODES
        ]
    )
    return (
        t.documents.select(
            F.array_max(cand)["node"].alias("node"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("chars_total"))
    )


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixing weights at T=2:
    w_s ∝ share_s^(1/2) — the up-sampling schedule multilingual/
    multi-source LLM corpora use so small sources aren't drowned.
    T=2 makes the power a SQRT (correctly rounded in IEEE → bit-equal
    across engines); the normalizing denominator folds in sorted source
    order (no unordered float summation). Oracle-checked twin of the
    general `temperature_mix` library API.

    Scale shape: one bounded-domain aggregate (sources), O(|sources|)
    arithmetic after it."""
    t = load_tables(spark, sf_dir)
    per = t.documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("n_chars"),
    )
    tot = per.agg(F.sum("n_chars").alias("c_total"))
    scored = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars",
        F.sqrt(F.col("n_chars").cast("double") / F.col("c_total").cast("double")).alias("v"),
    )
    denom = scored.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", F.col("v").alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("denom")
    )
    return scored.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_docs",
        "n_chars",
        F.round(F.col("v") / F.col("denom"), 6).alias("weight"),
    )


QUERIES["q_rendezvous"] = q_rendezvous
QUERIES["q_temperature_mix"] = q_temperature_mix

_RV_NODE_VALUES = ", ".join(f"('{n}')" for n in RV_NODES)

ORACLES["q_rendezvous"] = f"""
    WITH assign AS (
        SELECT doc_id, n_chars, node FROM (
            SELECT d.doc_id, d.n_chars, n.node,
                   row_number() OVER (
                       PARTITION BY d.doc_id
                       ORDER BY md5(n.node || ':' || CAST(d.doc_id AS VARCHAR)) DESC,
                                n.node DESC) AS rn
            FROM documents d CROSS JOIN (VALUES {_RV_NODE_VALUES}) n(node)
        ) WHERE rn = 1
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM assign GROUP BY node
"""

ORACLES["q_temperature_mix"] = """
    WITH per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS c_total FROM per),
    scored AS (
        SELECT source, n_docs, n_chars,
               sqrt(CAST(n_chars AS DOUBLE)
                    / CAST((SELECT c_total FROM tot) AS DOUBLE)) AS v
        FROM per
    ),
    den AS (SELECT list_sum(list(v ORDER BY source)) AS denom FROM scored)
    SELECT source, n_docs, n_chars,
           round(v / (SELECT denom FROM den), 6) AS weight
    FROM scored
"""


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for the hash split: chi-square
    goodness-of-fit of the observed train/test document counts against
    the designed 13/16 : 3/16 ratio, with the df=1 α=0.05 verdict
    (χ² < 3.841). A failed SRM means the split hashing is biased or the
    corpus was filtered after splitting — the standard A/B health check
    run before trusting any split-based evaluation. All inputs are exact
    integers; χ² is an identical double expression.

    Scale shape: one counting aggregate over the split column."""
    t = load_tables(spark, sf_dir)
    digit = _split_digit()
    is_train = digit.isin(*TRAIN_HEX).cast("bigint")
    agg = t.documents.agg(
        F.count("*").alias("n"),
        F.sum(is_train).alias("n_train"),
    )
    n = F.col("n").cast("double")
    obs_t = F.col("n_train").cast("double")
    obs_e = n - obs_t
    exp_t = n * 13.0 / 16.0
    exp_e = n * 3.0 / 16.0
    chi2 = (obs_t - exp_t) * (obs_t - exp_t) / exp_t + (obs_e - exp_e) * (
        obs_e - exp_e
    ) / exp_e
    return agg.select(
        "n",
        "n_train",
        (F.col("n") - F.col("n_train")).alias("n_test"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 < 3.841).alias("srm_ok"),
    )


QUERIES["q_srm_check"] = q_srm_check

ORACLES["q_srm_check"] = """
    WITH agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0','1','2','3','4','5','6','7','8','9','a','b','c')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_train
        FROM documents
    )
    SELECT n, n_train, n - n_train AS n_test,
           round((CAST(n_train AS DOUBLE) - CAST(n AS DOUBLE) * 13.0 / 16.0)
                 * (CAST(n_train AS DOUBLE) - CAST(n AS DOUBLE) * 13.0 / 16.0)
                 / (CAST(n AS DOUBLE) * 13.0 / 16.0)
                 + (CAST(n - n_train AS DOUBLE) - CAST(n AS DOUBLE) * 3.0 / 16.0)
                 * (CAST(n - n_train AS DOUBLE) - CAST(n AS DOUBLE) * 3.0 / 16.0)
                 / (CAST(n AS DOUBLE) * 3.0 / 16.0), 6) AS chi2,
           ((CAST(n_train AS DOUBLE) - CAST(n AS DOUBLE) * 13.0 / 16.0)
            * (CAST(n_train AS DOUBLE) - CAST(n AS DOUBLE) * 13.0 / 16.0)
            / (CAST(n AS DOUBLE) * 13.0 / 16.0)
            + (CAST(n - n_train AS DOUBLE) - CAST(n AS DOUBLE) * 3.0 / 16.0)
            * (CAST(n - n_train AS DOUBLE) - CAST(n AS DOUBLE) * 3.0 / 16.0)
            / (CAST(n AS DOUBLE) * 3.0 / 16.0)) < 3.841 AS srm_ok
    FROM agg
"""


def bpe_train(spark: SparkSession, sf_dir: str, n_merges: int = 10) -> list[tuple[str, int]]:
    """BPE training (library API): [(merged_token, score), ...] — the
    original surface, now a view over `bpe_merge_table` (which keeps the
    (left, right) split `bpe_encode` needs — 'ab'+'c' vs 'a'+'bc' are
    different merges that concatenate identically)."""
    return [(a + b, score) for (a, b), score in bpe_merge_table(spark, sf_dir, n_merges)]


def bpe_encode(df: DataFrame, text_col: str, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a trained BPE merge table to text, ENTIRELY JVM-side
    (library API): each whitespace token explodes to characters, then
    every merge (in training order) is one left-greedy fold over the
    symbol array — append the symbol, or replace the tail when it
    completes the (left, right) pair. Left-greedy matches the trainer's
    scan exactly (pytest-diffed), and concat(symbols) == word always
    (lossless round-trip).

    Output: one row per (original row, token) carrying ALL input columns
    (doc_id etc. — r10 review: without them the documented per-doc
    token-budget consumer could not group by document) plus the encoded
    symbol list serialized to a space-joined string and the symbol
    count.

    Scale shape: pure per-row expression work — no shuffle, no Python;
    the merge table is O(n_merges) literals baked into the plan (the
    DistributedCache idiom)."""
    toks = F.explode(F.split(F.col(text_col), " ")).alias("word")
    out = df.select("*", toks)
    symbols = F.split(F.col("word"), "")
    for a, b in merges:
        ab = a + b
        symbols = F.aggregate(
            symbols,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
    return out.select(
        *[c for c in out.columns if c != "word"],
        "word",
        F.array_join(symbols, " ").alias("encoded"),
        F.size(symbols).alias("n_symbols"),
    )
