"""Graph traversal (SURVEY.md §2C graph tier): BFS frontier expansion —
the shortest-path kernel every iterative MapReduce graph job is built on
(frontier = this round's keys, expansion = one edge join, dedup = anti-join
against the visited set).

The checked query runs exactly TWO rounds (SQL-expressible, so the DuckDB
oracle can verify it); `bfs_levels` below is the general driver loop with
the same per-round body — the pagerank_iterate pattern applied to
reachability.

Scale notes: each round is one equi-join of the frontier against the edge
list (shuffle keyed on node id — never the whole graph state) plus an
anti-join against the visited set. Frontier size is the working set; at
100 TB the visited set lives as a bucketed table so the anti-join is
co-located. Unreached nodes are reported, not silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.operators.graph import _copurchase_edges

BFS_SEED_MOD = 500  # p_partkey % 500 == 0 → seed node


def _undirected(edges: DataFrame) -> DataFrame:
    return edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def bfs_levels(spark: SparkSession, sf_dir: str, n_rounds: int = 2) -> DataFrame:
    """Per-node BFS distance (≤ n_rounds) from the seed set over the
    undirected co-purchase graph; returns (node, dist). Library API — the
    general loop; the fixed 2-round form is the oracle-checked query."""
    edges = _undirected(_copurchase_edges(spark, sf_dir)).cache()
    nodes = edges.select(F.col("u").alias("node")).distinct()
    visited = nodes.filter(F.col("node") % BFS_SEED_MOD == 0).select(
        "node", F.lit(0).alias("dist")
    )
    frontier = visited.select("node")
    for r in range(1, n_rounds + 1):
        nxt = (
            edges.join(frontier, edges.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        visited = visited.union(nxt.select("node", F.lit(r).alias("dist")))
        frontier = nxt
    return visited


def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two BFS rounds from the seed parts, rolled up per distance —
    dist 0 (seeds), 1, 2, and -1 for nodes unreached within two rounds.
    Exact integer set algebra end to end (joins + anti-joins + counts)."""
    edges = _undirected(_copurchase_edges(spark, sf_dir)).cache()
    nodes = edges.select(F.col("u").alias("node")).distinct()
    l0 = nodes.filter(F.col("node") % BFS_SEED_MOD == 0)
    l1 = (
        edges.join(l0, edges.u == l0.node)
        .select(F.col("v").alias("node"))
        .distinct()
        .join(l0, "node", "left_anti")
    )
    l2 = (
        edges.join(l1, edges.u == l1.node)
        .select(F.col("v").alias("node"))
        .distinct()
        .join(l0, "node", "left_anti")
        .join(l1, "node", "left_anti")
    )
    reached = (
        l0.select("node", F.lit(0).alias("dist"))
        .union(l1.select("node", F.lit(1).alias("dist")))
        .union(l2.select("node", F.lit(2).alias("dist")))
    )
    unreached = nodes.join(reached.select("node"), "node", "left_anti").select(
        "node", F.lit(-1).alias("dist")
    )
    return (
        reached.union(unreached)
        .groupBy("dist")
        .agg(F.count("*").alias("n_nodes"))
    )


QUERIES = {"q_bfs_levels": q_bfs_levels}

_EDGE_CTES = """parts AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), dir_edges AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM parts a JOIN parts b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ), edges AS (
            SELECT u, v FROM dir_edges
            UNION ALL
            SELECT v AS u, u AS v FROM dir_edges
        )"""

ORACLES = {
    "q_bfs_levels": f"""
        WITH {_EDGE_CTES},
        nodes AS (
            SELECT DISTINCT u AS node FROM edges
        ), l0 AS (
            SELECT node FROM nodes WHERE node % {BFS_SEED_MOD} = 0
        ), l1 AS (
            SELECT DISTINCT e.v AS node
            FROM edges e JOIN l0 ON e.u = l0.node
            WHERE e.v NOT IN (SELECT node FROM l0)
        ), l2 AS (
            SELECT DISTINCT e.v AS node
            FROM edges e JOIN l1 ON e.u = l1.node
            WHERE e.v NOT IN (SELECT node FROM l0)
              AND e.v NOT IN (SELECT node FROM l1)
        ), reached AS (
            SELECT node, 0 AS dist FROM l0
            UNION ALL SELECT node, 1 FROM l1
            UNION ALL SELECT node, 2 FROM l2
        ), allnodes AS (
            SELECT r.node, r.dist FROM reached r
            UNION ALL
            SELECT n.node, -1 AS dist FROM nodes n
            WHERE n.node NOT IN (SELECT node FROM reached)
        )
        SELECT dist, count(*) AS n_nodes FROM allnodes GROUP BY dist
    """,
}
