"""Persisted IVF index as a maintained view (round-10; SURVEY §2D ANN
scale path, index-maintenance form).

q_sim_ann / learned_ivf_ann recompute the corpus→cell assignment on
every run — fine for an audit query, wrong for a serving index over a
growing corpus. This view makes the IVF index a MAINTAINED artifact with
the matview storage discipline (operators/matview.py):

* the coarse quantizer (centroids) is PINNED at construction and spec-
  guarded — assignments from two different quantizers must never mix;
  retraining is a new index path (or ``rebuild``), not an in-place edit;
* ``refresh(delta)`` assigns ONLY the delta's vectors to cells (one
  broadcast-centroids argmin aggregate, O(delta)) and appends them as an
  immutable segment written ``partitionBy("cell")`` — the on-disk layout
  IS the index: a probe reads only its cells' directories via partition
  pruning, never the corpus;
* manifest-per-version + atomic ``_CURRENT`` pointer flip gives crash
  safety, a replay ledger (at-least-once delivery → exactly-once index
  state), and time travel; ``compact`` merges segments (row union, no
  re-assignment); ``vacuum`` frees unreferenced versions/segments;
* ``query(queries)`` probes each query's top-n_probe cells: centroids
  broadcast, the index scan filtered to the probed cells (pruned), one
  rounded-cosine top-k window per query — the q_sim_ann plan over the
  PERSISTED assignment instead of a recomputed one.

100 TB shape: segments are cell-partitioned parquet, so a query touches
n_probe/k of the data regardless of corpus size; refresh cost is the
delta scan + one k-row broadcast; compaction is one union rewrite of the
chosen segments. Determinism discipline throughout (rounded distances
and cosines, id tie-breaks) keeps results engine-stable.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from machinelearningalgomapreduce_spark.functions.vectors import dot, norm, sq_dist

_POINTER = "_CURRENT"


class IVFIndexView:
    """A persisted, incrementally-maintained IVF index over an embedding
    frame (vec_id, embedding: array<double>)."""

    _SPEC_FILE = "_SPEC.json"

    def __init__(
        self,
        path: str,
        centroids: list[tuple[int, list[float]]],
        dim: int,
        n_probe: int = 2,
    ) -> None:
        if not centroids:
            raise ValueError("IVFIndexView needs at least one centroid")
        if n_probe < 1:
            raise ValueError(f"n_probe must be >= 1, got {n_probe}")
        self.path = path
        self.dim = int(dim)
        self.n_probe = int(n_probe)
        # rounded to 6 before pinning: the spec must be bit-stable across
        # writers (the label_centroids determinism discipline)
        self.centroids = [
            (int(label), [round(float(x), 6) for x in vec])
            for label, vec in sorted(centroids)
        ]
        for label, vec in self.centroids:
            if len(vec) != self.dim:
                raise ValueError(
                    f"centroid {label} has dim {len(vec)}, expected {self.dim}"
                )
        # quantizer identity: assignments from two different centroid sets
        # must never mix in one index (n_probe is query-time only).
        # Lists, not tuples — the spec must compare equal after a JSON
        # round-trip.
        self._spec = {
            "dim": self.dim,
            "centroids": [[label, vec] for label, vec in self.centroids],
        }
        os.makedirs(path, exist_ok=True)

    # ---- pointers & manifests (the SegmentedAggView protocol) -----------
    def current_version(self) -> int:
        try:
            with open(os.path.join(self.path, _POINTER)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, f"m{version:08d}.json")

    def _manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def segments(self, version: int | None = None) -> list[str]:
        v = self.current_version() if version is None else version
        return self._manifest(v)["segments"] if v else []

    def applied_batches(self) -> list[str]:
        v = self.current_version()
        return self._manifest(v)["batches"] if v else []

    def _check_or_write_spec(self) -> None:
        spec_path = os.path.join(self.path, self._SPEC_FILE)
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                on_disk = json.load(f)
            if on_disk != self._spec:
                raise ValueError(
                    f"index at {self.path} was built with a different "
                    "quantizer/dim; use a new path (or rebuild) to retrain"
                )
            return
        tmp = spec_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._spec, f)
        os.replace(tmp, spec_path)

    def _commit(self, segments: list[str], batches: list[str]) -> int:
        v = self.current_version() + 1
        tmp = self._manifest_path(v) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"segments": segments, "batches": batches}, f)
        os.replace(tmp, self._manifest_path(v))
        ptmp = os.path.join(self.path, _POINTER + ".tmp")
        with open(ptmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(ptmp, os.path.join(self.path, _POINTER))  # THE commit
        return v

    def _next_seg_id(self) -> int:
        mx = 0
        for name in os.listdir(self.path):
            if name.startswith("seg-") and name[4:].isdigit():
                mx = max(mx, int(name[4:]))
        return mx + 1

    # ---- quantizer -------------------------------------------------------
    def _centroids_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            self.centroids, "cell bigint, centroid array<double>"
        )

    def assign_cells(self, spark: SparkSession, vectors: DataFrame) -> DataFrame:
        """(vec_id, cell, embedding): each vector's nearest pinned centroid
        — rounded squared distance, cell-id tie-break (deterministic). One
        k-row broadcast crossJoin + a min_by hash aggregate; the join back
        re-attaches the embedding without shuffling the vectors."""
        cents = F.broadcast(self._centroids_df(spark))
        d2 = F.round(sq_dist(F.col("embedding"), F.col("centroid"), self.dim), 6)
        best = (
            vectors.select("vec_id", "embedding")
            .crossJoin(cents)
            .select("vec_id", "cell", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min_by("cell", F.struct("d2", "cell")).alias("cell"))
        )
        return vectors.select("vec_id", "embedding").join(best, "vec_id")

    # ---- maintenance -----------------------------------------------------
    def refresh(self, spark: SparkSession, delta: DataFrame, batch_id: str) -> bool:
        """Append one delta of vectors as a cell-partitioned segment
        (O(delta) — existing index state is never read or rewritten).
        Returns False (no-op) for an already-applied batch_id."""
        self._check_or_write_spec()
        applied = self.applied_batches()
        if batch_id in applied:
            return False
        name = f"seg-{self._next_seg_id():08d}"
        (
            self.assign_cells(spark, delta)
            .write.partitionBy("cell")
            .mode("error")
            .parquet(os.path.join(self.path, name))
        )
        self._commit([*self.segments(), name], [*applied, batch_id])
        return True

    def compact(self, spark: SparkSession) -> int:
        """Merge ALL live segments into one cell-partitioned segment (a
        row-level union rewrite — assignments are immutable facts, no
        re-quantization). No-op below 2 segments. Old versions stay
        time-travel-resolvable until vacuum."""
        self._check_or_write_spec()
        segs = self.segments()
        if len(segs) < 2:
            return 0
        name = f"seg-{self._next_seg_id():08d}"
        (
            self._union_segments(spark, segs)
            .write.partitionBy("cell")
            .mode("error")
            .parquet(os.path.join(self.path, name))
        )
        self._commit([name], self.applied_batches())
        return 1

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop manifests older than the newest ``keep_last`` and every
        segment no kept manifest references."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        cur = self.current_version()
        removed: list[str] = []
        keep_versions = set(range(max(1, cur - keep_last + 1), cur + 1))
        live: set[str] = set()
        for v in keep_versions:
            if os.path.exists(self._manifest_path(v)):
                live.update(self.segments(v))
        for name in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, name)
            if name.startswith("m") and name[1:9].isdigit():
                if int(name[1:9]) not in keep_versions:
                    os.remove(full)
                    removed.append(name)
            elif name.startswith("seg-") and name not in live:
                shutil.rmtree(full)
                removed.append(name)
        return removed

    # ---- reads -----------------------------------------------------------
    def _union_segments(self, spark: SparkSession, segs: list[str]) -> DataFrame:
        dfs = [
            spark.read.parquet(os.path.join(self.path, s)) for s in segs
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The indexed corpus (vec_id, embedding, cell) at ``version``."""
        self._check_or_write_spec()
        v = self.current_version() if version is None else version
        if v == 0:
            raise ValueError("index has no committed version yet")
        if v > self.current_version():
            raise ValueError(
                f"version {v} not committed (current={self.current_version()})"
            )
        return self._union_segments(spark, self.segments(v))

    def query(
        self, spark: SparkSession, queries: DataFrame, k: int = 3
    ) -> DataFrame:
        """Top-k cosine neighbors per query row (query_id, embedding),
        searching only each query's ``n_probe`` nearest cells. The cell
        filter lands on the segment scans as a PARTITION filter, so the
        read touches ~n_probe/k of the index regardless of corpus size.
        Output: (query_id, neighbor_id, cell, cos_sim, rank) — the
        q_sim_ann contract."""
        cents = F.broadcast(self._centroids_df(spark))
        qd2 = F.round(sq_dist(F.col("qv"), F.col("centroid"), self.dim), 6)
        wq = W.partitionBy("query_id").orderBy("dist2", "cell")
        q = queries.select(
            F.col("query_id"),
            F.col("embedding").alias("qv"),
            norm(F.col("embedding"), self.dim).alias("qnorm"),
        )
        probe = (
            q.crossJoin(cents)
            .select("query_id", "qv", "qnorm", "cell", qd2.alias("dist2"))
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= self.n_probe)
            .select("query_id", "qv", "qnorm", F.col("cell").alias("pcell"))
        )
        probed_cells = [
            r.pcell for r in probe.select("pcell").distinct().collect()
        ]
        # the isin literal list reaches every segment scan as a partition
        # filter — only the probed cells' directories are read
        corpus = self.read(spark).filter(F.col("cell").isin(probed_cells))
        corpus = corpus.select(
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            F.col("embedding").alias("nv"),
            norm(F.col("embedding"), self.dim).alias("vnorm"),
        )
        cos = F.round(
            dot(F.col("qv"), F.col("nv"), self.dim)
            / (F.col("qnorm") * F.col("vnorm")),
            6,
        )
        w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
        return (
            probe.join(
                corpus,
                (F.col("pcell") == F.col("cell"))
                & (F.col("query_id") != F.col("neighbor_id")),
            )
            .select("query_id", "neighbor_id", "cell", cos.alias("cos_sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
