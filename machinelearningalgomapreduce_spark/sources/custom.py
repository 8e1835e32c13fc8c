"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`): a
deterministic synthetic-events generator, registered as a real scan the
planner treats like any other source (partition pruning by the source's
own partitioning, schema projection handled by Spark).

Why it exists: the reference repo class reads ad-hoc text files; a
Spark-native engine instead exposes generators/feeds through the
DataSource API so EVERYTHING upstream of a query — including synthetic
load or replayed feeds — arrives as a partitioned, schema'd scan. The
generator is hash-deterministic (no RNG state), so two scans of the same
options produce identical rows on any executor layout — the same
reproducibility rule as the md5 sampling/sharding operators.

Usage:
    spark.dataSource.register(SyntheticEventsSource)
    df = spark.read.format("synthetic_events").option("n_rows", 1000).load()
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs


def _h_line(line: str) -> int:
    """md5 → uint64 (the one copy; _h expresses the per-field stream
    through it)."""
    d = hashlib.md5(line.encode()).digest()
    return int.from_bytes(d[:8], "big")


def _h(i: int, field: str) -> int:
    """Deterministic 64-bit hash stream per (row, field)."""
    return _h_line(f"{i}:{field}")


class SyntheticEventsSource(DataSource):
    """spark.read.format("synthetic_events").option("n_rows", N)
    .option("n_partitions", P).load() — N rows split into P ranges."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("ts_us", LongType()),
            ]
        )

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))
        if self.n_rows < 0:
            raise ValueError(f"n_rows must be >= 0, got {self.n_rows}")
        if self.n_partitions < 1:
            raise ValueError(
                f"n_partitions must be >= 1, got {self.n_partitions}"
            )

    def partitions(self):
        # ceil division: floor produced UP TO n_rows single-row partitions
        # past the requested count (n_rows=10, n_partitions=4 → 5 ranges)
        per = max(1, -(-self.n_rows // self.n_partitions))
        bounds = list(range(0, self.n_rows, per)) + [self.n_rows]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:]) if b > a]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (
                i,
                _h(i, "user") % 1000,
                EVENT_TYPES[_h(i, "type") % len(EVENT_TYPES)],
                round((_h(i, "value") % 50_000) / 100.0, 2),
                BASE_TS_US + (_h(i, "ts") % (30 * 24 * 3600)) * 1_000_000,
            )


# --------------------------------------------------------------- writer side

class ManifestJsonlSink(DataSource):
    """Custom Python DataSource WRITER: JSON-lines shards + a commit-time
    manifest — the export sink shape a training-data pipeline wants (each
    shard's row count and an order-insensitive content checksum recorded
    atomically at job commit).

    Demonstrates the DataSourceWriter two-phase commit protocol: each task
    writes its own shard and returns a WriterCommitMessage; only if EVERY
    task succeeds does ``commit()`` write ``manifest.json`` on the driver
    — a reader that requires the manifest therefore never observes a
    partial job (the shard files of a failed job are garbage without it,
    and ``abort()`` removes them best-effort).

    APPEND-ONLY by contract: the manifest accumulates shards across jobs,
    so ``mode("overwrite")`` is rejected loudly — replacement means a
    fresh directory (the export_view_snapshot version-dir pattern), never
    an in-place truncation a concurrent reader could half-observe.
    Deployment constraint (stated, not enforced): driver and executors
    must share the target filesystem — shard files are written where the
    task runs and the manifest where the driver runs. Values outside the
    JSON natives (timestamps, decimals) serialize via ``str`` and read
    back as strings; export typed columns through the repo's integer
    cents/micros conventions when the round-trip type matters.

    Usage:
        spark.dataSource.register(ManifestJsonlSink)
        df.write.format("manifest_jsonl").option("path", d).mode("append").save()
    """

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "manifest_jsonl is append-only (the manifest accumulates "
                "shards); write to a fresh directory instead of overwrite"
            )
        return ManifestJsonlWriter(self.options, schema)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int, checksum: int):
        self.path, self.n_rows, self.checksum = path, n_rows, checksum


class ManifestJsonlWriter(DataSourceWriter):
    # A live commit holds the manifest lock for one read-modify-write
    # (milliseconds); a lock this old belongs to a dead driver and is
    # safe to break (see commit()).
    LOCK_STALE_SECONDS = 300.0

    def __init__(self, options, schema: StructType):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_jsonl requires .option('path', ...)")
        self.fields = [f.name for f in schema.fields]
        # Job-unique shard token, generated driver-side and serialized to
        # every task: partitionId/taskAttemptId are only unique within ONE
        # SparkContext, so a second application appending to the same path
        # would otherwise truncate the first app's same-named shards.
        self.token = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _ShardCommit:
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(
            self.path,
            f"shard-{self.token}-{ctx.partitionId():05d}-{ctx.taskAttemptId()}.jsonl",
        )
        n, checksum = 0, 0
        with open(shard, "w", encoding="utf-8") as fh:
            for row in iterator:
                line = json.dumps(dict(zip(self.fields, row)), sort_keys=True,
                                  default=str)
                fh.write(line + "\n")
                n += 1
                # Order-insensitive: sum of per-line digests mod 2^64, so
                # the checksum is stable under partition-internal reorder.
                checksum = (checksum + _h_line(line)) % (1 << 64)
        return _ShardCommit(shard, n, checksum)

    def commit(self, messages) -> None:
        import json
        import os
        import socket as _socket
        import time as _time

        shards = [
            {"path": os.path.basename(m.path), "n_rows": m.n_rows,
             "checksum": m.checksum}
            for m in messages
        ]
        manifest_path = os.path.join(self.path, "manifest.json")
        # The manifest read-modify-write below is the one non-task-isolated
        # step of the protocol: two jobs committing concurrently would each
        # extend the manifest they read and the last rename would silently
        # drop the other's shards. An O_EXCL lock turns that data loss into
        # a loud failure (the single-writer rule every view in this repo
        # already follows — the loser retries or serializes).
        lock_path = manifest_path + ".lock"
        # Stale-lock recovery: a driver killed between acquiring the lock
        # and the finally block would otherwise brick every later commit
        # to this directory. The lock records its holder (pid@host, mtime
        # carries the timestamp); a lock older than LOCK_STALE_SECONDS is
        # broken — a live commit holds the lock only for one manifest
        # read-modify-write, far under the timeout. Break via RENAME, not
        # remove: two concurrent breakers both statting the same stale
        # lock would otherwise each run os.remove — the second deleting
        # the FIRST breaker's fresh lock and letting both into the
        # critical section (the r11 review's TOCTOU). rename is atomic
        # and fails for the loser, so exactly one breaker proceeds.
        try:
            if (
                os.path.exists(lock_path)
                and _time.time() - os.path.getmtime(lock_path)
                > self.LOCK_STALE_SECONDS
            ):
                broken = f"{lock_path}.broken.{os.getpid()}"
                os.rename(lock_path, broken)
                os.remove(broken)
        except OSError:
            pass  # lost the break race (or holder cleaned up) — O_EXCL decides
        try:
            lock_fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(
                lock_fd,
                f"{os.getpid()}@{_socket.gethostname()}".encode(),
            )
        except FileExistsError as exc:
            holder = ""
            try:
                with open(lock_path) as fh:
                    holder = fh.read().strip()
            except OSError:
                pass
            raise RuntimeError(
                f"concurrent manifest commit detected at {manifest_path} "
                f"(lock held by {holder or 'unknown'}); manifest_jsonl is "
                "single-writer per directory. If the holder is dead, the "
                f"lock self-expires after {self.LOCK_STALE_SECONDS}s, or "
                f"remove {lock_path} manually."
            ) from exc
        try:
            # Append semantics: a later job EXTENDS the manifest rather than
            # silently dropping the earlier jobs' shards from it (a
            # manifest-driven reader treats unlisted shards as garbage).
            if os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    shards = json.load(fh)["shards"] + shards
            manifest = {
                "shards": shards,
                "total_rows": sum(s["n_rows"] for s in shards),
                "total_checksum": sum(s["checksum"] for s in shards) % (1 << 64),
            }
            # Atomic + durable publish: fsync before the rename (a crash
            # mid-commit must never leave a truncated manifest visible —
            # the manifest IS the commit marker).
            tmp = manifest_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(manifest, fh, indent=2, sort_keys=True)
                fh.flush()
                os.fsync(fh.fileno())
            os.rename(tmp, manifest_path)
        finally:
            os.close(lock_fd)
            os.remove(lock_path)

    def abort(self, messages) -> None:
        import os

        # Failed tasks contribute None commit messages (DataSourceWriter
        # contract) — only the succeeded tasks' shards exist to remove.
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass


# --------------------------------------------------------------- reader side

class ManifestJsonlSource(DataSource):
    """Custom Python DataSource READER paired with ManifestJsonlSink: scans
    ONLY the shards the committed manifest lists, so the exactly-once
    guarantee the two-phase-commit writer establishes actually reaches the
    consumer — orphan shards from failed or aborted jobs sit in the same
    directory but are never observed, and a directory without a manifest
    (a job that died before commit) reads as an explicit error instead of
    a silent partial dataset.

    Each manifest entry becomes one InputPartition (shard-parallel scan;
    at export scale the shard count is the write-side parallelism, so the
    read side inherits it). Every task re-derives its shard's row count
    and order-insensitive checksum while streaming and fails LOUDLY on
    mismatch — bit-rot or a hand-edited shard is a read error, not a
    quietly different dataset.

    Schema: pass one explicitly (``spark.read.format(...).schema(...)``)
    or let the source infer it from a SAMPLE of the first non-empty
    shard (up to 1,000 lines): keys union across the sample, types widen
    bool → long → double, anything stringy → string, and a key that is
    NULL in every sampled line falls back to string. Inference is a
    convenience — pass the schema when a rare key or late-appearing type
    could be missed by the sample.

    Usage:
        spark.dataSource.register(ManifestJsonlSource)
        df = spark.read.format("manifest_jsonl_read").option("path", d).load()
    """

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl_read"

    _SCHEMA_SAMPLE_LINES = 1000

    def _manifest(self) -> dict:
        import json
        import os

        # Parsed once per DataSource instance: Spark may call schema()
        # several times during planning and reader() after — re-reading
        # the manifest each time is repeated driver I/O AND lets a
        # concurrent append make schema and shard list inconsistent
        # within one load.
        cached = getattr(self, "_m", None)
        if cached is not None:
            return cached
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_jsonl_read requires .option('path', ...)")
        mpath = os.path.join(path, "manifest.json")
        if not os.path.exists(mpath):
            raise FileNotFoundError(
                f"no committed manifest at {mpath}: the export job did not "
                "commit (or the path is wrong); refusing to read orphan shards"
            )
        with open(mpath, encoding="utf-8") as fh:
            self._m = json.load(fh)
        return self._m

    def schema(self) -> StructType:
        import json
        import os

        from pyspark.sql.types import BooleanType

        manifest = self._manifest()
        for shard in manifest["shards"]:
            if shard["n_rows"] == 0:
                continue
            # Sample many lines, not one: a null in line 1 is not a type,
            # and a key absent from line 1 would silently vanish from
            # every row. Types widen bool → long → double; strings win.
            kinds: dict[str, str] = {}
            with open(os.path.join(self.options["path"], shard["path"]),
                      encoding="utf-8") as fh:
                for _ in range(self._SCHEMA_SAMPLE_LINES):
                    line = fh.readline()
                    if not line:
                        break
                    for key, v in json.loads(line).items():
                        if v is None:
                            k = "null"
                        elif isinstance(v, bool):
                            k = "bool"
                        elif isinstance(v, int):
                            k = "long"
                        elif isinstance(v, float):
                            k = "double"
                        else:
                            k = "string"
                        prev = kinds.get(key, "null")
                        if prev == "null":
                            merged = k
                        elif k in ("null", prev):
                            merged = prev
                        elif {prev, k} == {"long", "double"}:
                            merged = "double"
                        else:  # any other mix is not numeric-widenable
                            merged = "string"
                        kinds[key] = merged
            by_kind = {
                "bool": BooleanType(), "long": LongType(),
                "double": DoubleType(), "string": StringType(),
                "null": StringType(),  # all-null sample: string fallback
            }
            return StructType(
                [StructField(key, by_kind[kinds[key]]) for key in sorted(kinds)]
            )
        return StructType([])

    def reader(self, schema: StructType) -> "ManifestJsonlReader":
        return ManifestJsonlReader(self.options, schema, self._manifest())


class _Shard(InputPartition):
    def __init__(self, path: str, n_rows: int, checksum: int):
        self.path, self.n_rows, self.checksum = path, n_rows, checksum


class ManifestJsonlReader(DataSourceReader):
    def __init__(self, options, schema: StructType, manifest: dict):
        self.dir = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.shards = manifest["shards"]

    def partitions(self):
        return [_Shard(s["path"], s["n_rows"], s["checksum"])
                for s in self.shards]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        import json
        import os

        full = os.path.join(self.dir, partition.path)
        n, checksum = 0, 0
        with open(full, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                n += 1
                checksum = (checksum + _h_line(line)) % (1 << 64)
                obj = json.loads(line)
                yield tuple(obj.get(f) for f in self.fields)
        if n != partition.n_rows or checksum != partition.checksum:
            raise IOError(
                f"shard {partition.path} does not match its manifest entry "
                f"(rows {n} vs {partition.n_rows}, checksum {checksum} vs "
                f"{partition.checksum}): refusing to serve corrupt data"
            )
