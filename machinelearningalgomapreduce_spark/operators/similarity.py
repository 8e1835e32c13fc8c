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

from machinelearningalgomapreduce_spark.functions.vectors import dot, norm
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


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most-similar embedding pairs by cosine (brute force)."""
    t = load_tables(spark, sf_dir)
    # Norms precomputed per vector; the pairwise loop pays only the dot.
    e = t.embeddings.select("vec_id", "embedding", norm(F.col("embedding"), EMBEDDING_DIM).alias("vnorm"))
    a, b = e.alias("a"), e.alias("b")
    cos = F.round(
        dot(F.col("a.embedding"), F.col("b.embedding"), EMBEDDING_DIM)
        / (F.col("a.vnorm") * F.col("b.vnorm")),
        6,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "id_a", "id_b")
        .limit(TOPK_PAIRS)
    )


def q_sim_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned ANN: top-3 neighbors per query (every 100th id), searching
    only the query's own coarse cell instead of the full corpus."""
    t = load_tables(spark, sf_dir)
    cells = assign_nearest(t.embeddings, label_centroids(t.embeddings), EMBEDDING_DIM).select(
        "vec_id", "cluster"
    )
    e = t.embeddings.join(cells, "vec_id").select(
        "vec_id", "embedding", "cluster", norm(F.col("embedding"), EMBEDDING_DIM).alias("vnorm")
    )
    q = e.filter(F.col("vec_id") % ANN_QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("cluster").alias("qcell"),
        F.col("vnorm").alias("qnorm"),
    )
    cos = F.round(
        dot(F.col("qv"), F.col("embedding"), EMBEDDING_DIM)
        / (F.col("qnorm") * F.col("vnorm")),
        6,
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        q.join(e, (F.col("qcell") == F.col("cluster")) & (F.col("query_id") != F.col("vec_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("qcell").alias("cell"),
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
            SELECT vec_id AS query_id, embedding AS qv, cluster AS qcell
            FROM cells WHERE vec_id % {ANN_QUERY_STRIDE} = 0
        ), probe AS (
            SELECT q.query_id, b.vec_id AS neighbor_id, q.qcell AS cell,
                   round(
                     list_sum(list_transform({_DIMS},
                         i -> CAST(q.qv[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform({_DIMS},
                            i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform({_DIMS},
                            i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
                     6) AS cos_sim
            FROM q JOIN cells b
              ON q.qcell = b.cluster AND q.query_id <> b.vec_id
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
            SELECT vec_id AS query_id, embedding AS qv, cluster AS qcell
            FROM cells WHERE vec_id % {ANN_QUERY_STRIDE} = 0
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
            FROM q JOIN cells b
              ON q.qcell = b.cluster AND q.query_id <> b.vec_id
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
