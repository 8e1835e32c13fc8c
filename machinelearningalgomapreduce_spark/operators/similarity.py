"""Similarity search over the embeddings table (SURVEY.md §2D q_sim_topk;
north-star ANN surface).

Two paths, same semantics:
- q_sim_topk — brute-force global top-k cosine pairs. Exact, quadratic:
  this is the oracle-checkable baseline and the verify stage of every
  approximate pipeline. Ranking uses the ROUNDED cosine with a total id
  tie-break, so the top-k set is engine-independent.
- q_sim_ann — IVF-style cell-pruned search: vectors are bucketed to their
  nearest seeded centroid (the coarse quantizer; reuses the k-means
  assignment), queries probe ONLY their own cell. At 100 TB the centroid
  set is broadcast, the corpus is hash-partitioned by cell, and each probe
  touches 1/k of the data — candidate generation is linear, never
  all-pairs. (The same shape backs q_dedup_embedding at scale.)

Both are exact sql-oracle checks — the IVF pruning is deterministic
because the quantizer (rounded centroids, rounded distances, id
tie-breaks) is bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from machinelearningalgomapreduce_spark.functions.joins import sf_of
from machinelearningalgomapreduce_spark.functions.vectors import dot, norm, sq_dist
from machinelearningalgomapreduce_spark.operators.ml import (
    _ASSIGN_CTES,
    assign_nearest,
    label_centroids,
)
from machinelearningalgomapreduce_spark.sources.catalog import load_tables
from machinelearningalgomapreduce_spark.sources.schemas import EMBEDDING_DIM

TOPK_PAIRS = 20
ANN_QUERY_STRIDE = 100
ANN_K = 3
ANN_NPROBE = 2
# Above this tier the O(n²) brute pair scans REFUSE to run and route to the
# cell-pruned plan instead (VERDICT r4 item 5: the scale path must be
# enforced by code, not prose). Fixture tiers (≤ sf0.1) stay brute — the
# exact oracle baseline.
BRUTE_MAX_SF = 0.5


def _pair_cos() -> "F.Column":
    return F.round(
        dot(F.col("a.embedding"), F.col("b.embedding"), EMBEDDING_DIM)
        / (F.col("a.vnorm") * F.col("b.vnorm")),
        6,
    )


def sim_topk_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-pruned global top-k pairs — the 100 TB form of q_sim_topk.

    Candidate pairs must share an IVF cell (coarse quantizer = the seeded
    k-means assignment), so candidate generation is per-cell, never
    all-pairs; the shuffle key is the cell id. Same output contract as the
    brute query; recall vs brute is the q_sim_recall trade-off, measured
    on a sample."""
    t = load_tables(spark, sf_dir)
    cells = assign_nearest(t.embeddings, label_centroids(t.embeddings), EMBEDDING_DIM).select(
        "vec_id", "cluster"
    )
    e = t.embeddings.join(cells, "vec_id").select(
        "vec_id", "embedding", "cluster", norm(F.col("embedding"), EMBEDDING_DIM).alias("vnorm")
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            _pair_cos().alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "id_a", "id_b")
        .limit(TOPK_PAIRS)
    )


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most-similar embedding pairs by cosine.

    Brute force at fixture tiers (exact — the oracle baseline); above
    BRUTE_MAX_SF the O(n²) self-join is refused and the query routes to
    the cell-pruned plan (sim_topk_cell), pytest-asserted via the plan."""
    if sf_of(sf_dir) > BRUTE_MAX_SF:
        return sim_topk_cell(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    # Norms precomputed per vector; the pairwise loop pays only the dot.
    e = t.embeddings.select("vec_id", "embedding", norm(F.col("embedding"), EMBEDDING_DIM).alias("vnorm"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            _pair_cos().alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "id_a", "id_b")
        .limit(TOPK_PAIRS)
    )


def q_sim_ann(spark: SparkSession, sf_dir: str, n_probe: int = ANN_NPROBE) -> DataFrame:
    """IVF-pruned ANN: top-3 neighbors per query (every 100th id), searching
    the query's `n_probe` nearest coarse cells instead of the full corpus.

    Multi-probe (default 2, VERDICT r4 item 6): corpus vectors live in
    their top-1 cell (assign_nearest — a min_by hash aggregate); only the
    QUERY side ranks its centroid distances to take the top-n_probe cells
    (a window over queries × k centroid rows — sample-sized). Each
    candidate (query, neighbor) pair appears once because a neighbor has
    exactly one home cell; `cell` reports the probed cell the neighbor was
    found in. q_sim_recall quantifies what each probe buys."""
    t = load_tables(spark, sf_dir)
    cells = assign_nearest(t.embeddings, label_centroids(t.embeddings), EMBEDDING_DIM).select(
        "vec_id", "cluster"
    )
    e = t.embeddings.join(cells, "vec_id").select(
        "vec_id", "embedding", "cluster", norm(F.col("embedding"), EMBEDDING_DIM).alias("vnorm")
    )
    cents = label_centroids(t.embeddings).select(F.col("label").alias("pcell"), "centroid")
    wq = W.partitionBy("query_id").orderBy("dist2", "pcell")
    qprobe = (
        t.embeddings.filter(F.col("vec_id") % ANN_QUERY_STRIDE == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "pcell",
            F.round(sq_dist(F.col("embedding"), F.col("centroid"), EMBEDDING_DIM), 6).alias("dist2"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "pcell")
    )
    q = (
        e.filter(F.col("vec_id") % ANN_QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("vnorm").alias("qnorm"),
        )
        .join(qprobe, "query_id")
    )
    cos = F.round(
        dot(F.col("qv"), F.col("embedding"), EMBEDDING_DIM)
        / (F.col("qnorm") * F.col("vnorm")),
        6,
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        q.join(e, (F.col("pcell") == F.col("cluster")) & (F.col("query_id") != F.col("vec_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("cluster").alias("cell"),
            cos.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
    )


def q_sim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the IVF path: per query point, how many of the
    EXACT brute-force top-k neighbors the cell-pruned q_sim_ann search
    recovered — the number that decides whether single-cell probing is
    good enough or nprobe must rise, measured continuously at scale on a
    query sample (the q_dedup_minhash_est discipline applied to ANN).

    Scale shape: brute ground truth is queries × corpus (broadcastable
    query side — linear in corpus, affordable for a sample); the IVF side
    and the hit-join are model-sized. Ranking uses rounded cosine with id
    tie-breaks in both engines, so top-k sets are engine-identical."""
    t = load_tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", "embedding", norm(F.col("embedding"), EMBEDDING_DIM).alias("vnorm")
    )
    q = e.filter(F.col("vec_id") % ANN_QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("vnorm").alias("qnorm"),
    )
    cos = F.round(
        dot(F.col("qv"), F.col("embedding"), EMBEDDING_DIM)
        / (F.col("qnorm") * F.col("vnorm")),
        6,
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    brute = (
        F.broadcast(q)
        .join(e, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
    )
    ann = q_sim_ann(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        brute.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .select(
            "query_id",
            F.lit(ANN_K).alias("k"),
            "n_hits",
            F.round(F.col("n_hits") / float(ANN_K), 6).alias("recall"),
        )
    )


def brp_lsh_neighbors(
    spark: SparkSession, sf_dir: str, key_id: int = 0, k: int = 10
):
    """MLlib BucketedRandomProjectionLSH variant (library API): approximate
    nearest neighbors for one query vector via random-hyperplane bucketing.
    The deterministic IVF path (q_sim_ann) is the oracle-checked twin;
    pytest checks this one's recall against brute force."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from machinelearningalgomapreduce_spark.functions.vectors import as_double

    t = load_tables(spark, sf_dir)
    data = t.embeddings.select(
        "vec_id", array_to_vector(as_double(F.col("embedding"))).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    ).fit(data)
    key = data.filter(F.col("vec_id") == key_id).first()
    return lsh.approxNearestNeighbors(data, key.features, k + 1).filter(
        F.col("vec_id") != key_id
    )


QUERIES = {
    "q_sim_topk": q_sim_topk,
    "q_sim_ann": q_sim_ann,
    "q_sim_recall": q_sim_recall,
}

_DIMS = f"range(1, {EMBEDDING_DIM + 1})"

_PAIR_COS = f"""round(
    list_sum(list_transform({_DIMS}, i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform({_DIMS}, i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform({_DIMS}, i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
    6)"""

ORACLES = {
    "q_sim_topk": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_PAIR_COS} AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ORDER BY cos_sim DESC, id_a, id_b
        LIMIT {TOPK_PAIRS}
    """,
    "q_sim_ann": f"""
        WITH {_ASSIGN_CTES},
        cells AS (
            SELECT e.vec_id, e.embedding, a.cluster
            FROM embeddings e JOIN assigned a USING (vec_id)
        ), q AS (
            SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id % {ANN_QUERY_STRIDE} = 0
        ), qprobe AS (
            SELECT query_id, pcell
            FROM (SELECT vec_id AS query_id, cluster AS pcell,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY dist2, cluster) AS rn
                  FROM scored WHERE vec_id % {ANN_QUERY_STRIDE} = 0)
            WHERE rn <= {ANN_NPROBE}
        ), probe AS (
            SELECT q.query_id, b.vec_id AS neighbor_id, b.cluster AS cell,
                   round(
                     list_sum(list_transform({_DIMS},
                         i -> CAST(q.qv[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform({_DIMS},
                            i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform({_DIMS},
                            i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
                     6) AS cos_sim
            FROM q
            JOIN qprobe p ON p.query_id = q.query_id
            JOIN cells b ON b.cluster = p.pcell AND q.query_id <> b.vec_id
        )
        SELECT query_id, neighbor_id, cell, cos_sim, CAST(rank AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos_sim DESC, neighbor_id) AS rank
              FROM probe)
        WHERE rank <= {ANN_K}
    """,
    "q_sim_recall": f"""
        WITH {_ASSIGN_CTES},
        cells AS (
            SELECT e.vec_id, e.embedding, a.cluster
            FROM embeddings e JOIN assigned a USING (vec_id)
        ), q AS (
            SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id % {ANN_QUERY_STRIDE} = 0
        ), qprobe AS (
            SELECT query_id, pcell
            FROM (SELECT vec_id AS query_id, cluster AS pcell,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY dist2, cluster) AS rn
                  FROM scored WHERE vec_id % {ANN_QUERY_STRIDE} = 0)
            WHERE rn <= {ANN_NPROBE}
        ), brute AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM (
                SELECT q.query_id, b.vec_id AS neighbor_id,
                       round(
                         list_sum(list_transform({_DIMS},
                             i -> CAST(q.qv[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                         / (sqrt(list_sum(list_transform({_DIMS},
                                i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
                          * sqrt(list_sum(list_transform({_DIMS},
                                i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
                         6) AS cos_sim
                FROM q JOIN embeddings b ON q.query_id <> b.vec_id)
        ), topk AS (
            SELECT query_id, neighbor_id FROM brute WHERE rank <= {ANN_K}
        ), probe AS (
            SELECT q.query_id, b.vec_id AS neighbor_id,
                   round(
                     list_sum(list_transform({_DIMS},
                         i -> CAST(q.qv[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform({_DIMS},
                            i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform({_DIMS},
                            i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
                     6) AS cos_sim
            FROM q
            JOIN qprobe p ON p.query_id = q.query_id
            JOIN cells b ON b.cluster = p.pcell AND q.query_id <> b.vec_id
        ), ann AS (
            SELECT query_id, neighbor_id
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                               ORDER BY cos_sim DESC, neighbor_id) AS rank
                  FROM probe)
            WHERE rank <= {ANN_K}
        )
        SELECT t.query_id,
               {ANN_K} AS k,
               CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hits,
               round(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                     / {float(ANN_K)}, 6) AS recall
        FROM topk t
        LEFT JOIN ann a
          ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
        GROUP BY t.query_id
    """,
}
