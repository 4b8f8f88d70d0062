"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource``
API): a partition-planned, filter-pushing JSONL source.

Why this exists: the engine's other readers go through built-in
formats; real ingest surfaces regularly need a SOURCE Spark doesn't
ship (an internal shard format, a paginated API, a proprietary
container). Spark 4's Python DataSource API is the sanctioned way to
add one — this module is the engine's reference implementation of
the pattern, with the three properties a scalable custom source
must get right:

1. **Partition planning**: one ``InputPartition`` per shard file, so
   a directory of N shards reads with N-way parallelism and executor-
   side locality — never a single-task driver read.
2. **Filter pushdown** (``pushFilters``): comparison/null filters on
   leaf columns are accepted and applied INSIDE the per-partition
   reader (rows are skipped before they reach the engine); everything
   else is declared unsupported so Spark re-applies it — pushdown
   here is an optimization, never a correctness dependency.
3. **Schema-ordered tuple emission**: rows yield in declared field
   order with None for missing keys — malformed lines fail loudly
   (a silent drop would corrupt counts downstream).

The decode path is per-row Python — that is the API's cost model
(Arrow-batched variants exist via DataSourceArrowWriter for writes);
for hot formats prefer a built-in reader. This source is for the
long tail where no JVM reader exists.
"""

from __future__ import annotations

import json
import os

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)

_DEFAULT_SCHEMA = "doc_id bigint, text string, n_chars bigint"


class JsonlShardDataSource(DataSource):
    """``spark.read.format("bht_jsonl").option("path", dir)`` after
    ``spark.dataSource.register(JsonlShardDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "bht_jsonl"

    def schema(self) -> str:
        return self.options.get("schema_ddl", _DEFAULT_SCHEMA)

    def reader(self, schema):
        # Spark REFUSES a reader that implements pushFilters() while
        # spark.sql.python.filterPushdown.enabled is false (default) —
        # and the driver calls this source from vanilla sessions. So
        # the pushdown hook lives on a subclass chosen per-session:
        # plain reader under default conf, pushdown reader when the
        # flag is on. Results are identical either way (Spark
        # re-applies what isn't pushed); only the skip location moves.
        from pyspark.sql import SparkSession

        session = SparkSession.getActiveSession()
        enabled = (
            session is not None
            and session.conf.get(
                "spark.sql.python.filterPushdown.enabled", "false"
            ).lower()
            == "true"
        )
        cls = JsonlShardPushdownReader if enabled else JsonlShardReader
        return cls(self.options, schema)

    def simpleStreamReader(self, schema):
        return JsonlShardStreamReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return JsonlShardWriter(self.options, schema, overwrite)


def _passes(row_value, f: Filter) -> bool:
    if isinstance(f, IsNotNull):
        return row_value is not None
    if row_value is None:
        return False
    if isinstance(f, EqualTo):
        return row_value == f.value
    if isinstance(f, GreaterThan):
        return row_value > f.value
    if isinstance(f, GreaterThanOrEqual):
        return row_value >= f.value
    if isinstance(f, LessThan):
        return row_value < f.value
    if isinstance(f, LessThanOrEqual):
        return row_value <= f.value
    raise AssertionError(f"unpushable filter leaked through: {f}")


_PUSHABLE = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    IsNotNull,
)


class JsonlShardReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("bht_jsonl requires .option('path', <dir>)")
        self.fields = [f.name for f in schema.fields]
        self.filters: list[Filter] = []

    def partitions(self):
        shards = sorted(
            os.path.join(self.path, n)
            for n in os.listdir(self.path)
            if n.endswith((".jsonl", ".json"))
        )
        if not shards:
            raise FileNotFoundError(f"no .jsonl shards under {self.path}")
        return [InputPartition(p) for p in shards]

    def read(self, partition):
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)  # malformed line -> loud failure
                if all(
                    _passes(obj.get(f.attribute[0]), f)
                    for f in self.filters
                ):
                    yield tuple(obj.get(name) for name in self.fields)


class JsonlShardPushdownReader(JsonlShardReader):
    """The pushdown-capable variant (only instantiated when
    ``spark.sql.python.filterPushdown.enabled`` is true — see
    ``JsonlShardDataSource.reader``)."""

    def pushFilters(self, filters):
        """Accept simple comparisons on top-level columns; hand
        everything else back to Spark (returned = unsupported)."""
        unsupported = []
        for f in filters:
            # composite filters (Not, ...) carry no .attribute — check
            # the type FIRST, then the leaf column shape
            col = getattr(f, "attribute", None)
            if (
                isinstance(f, _PUSHABLE)
                and col is not None
                and len(col) == 1
                and col[0] in self.fields
            ):
                self.filters.append(f)
            else:
                unsupported.append(f)
        return iter(unsupported)


class JsonlShardStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the shard source: offsets are COUNTS OF
    CONSUMED SHARDS over the lexicographically-sorted listing, so a
    producer that appends later-named shards (part-000042…, the
    universal shard convention) gets exactly-once incremental
    ingestion — ``read`` picks up every shard past the last offset,
    ``readBetweenOffsets`` replays a committed range bit-identically
    on recovery (files are immutable once listed), and the engine's
    checkpoint persists the offset dict.

    The Simple API trades planning for convenience: each micro-batch
    reads driver-side (no per-partition planning) — right for
    control-plane-sized shard streams; the batch reader above is the
    bulk path.
    """

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("bht_jsonl requires .option('path', <dir>)")
        self.fields = [f.name for f in schema.fields]

    def _shards(self):
        return sorted(
            os.path.join(self.path, n)
            for n in os.listdir(self.path)
            if n.endswith((".jsonl", ".json"))
        )

    def initialOffset(self) -> dict:
        return {"n_shards": 0}

    def _rows(self, files):
        for path in files:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    obj = json.loads(line)
                    yield tuple(obj.get(name) for name in self.fields)

    def read(self, start: dict):
        # list-backed iterators, not generators: the engine's prefetch
        # cache copy.copy()s the iterator for replay, which generators
        # cannot survive. Micro-batches here are shard-stream-sized by
        # design (see class docstring), so materializing is the
        # correct trade.
        files = self._shards()
        n0 = int(start.get("n_shards", 0))
        return iter(list(self._rows(files[n0:]))), {"n_shards": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._shards()
        return iter(list(self._rows(
            files[int(start.get("n_shards", 0)): int(end.get("n_shards", 0))]
        )))


@dataclass
class _ShardCommit(WriterCommitMessage):
    staged: str
    final: str
    n_rows: int


class JsonlShardWriter(DataSourceWriter):
    """Write half of the shard source, with the two-phase commit every
    distributed writer needs: each task writes its partition to a
    STAGED file (``_staging/``), the driver's ``commit`` renames the
    full set into place only when EVERY task succeeded, and ``abort``
    deletes the staging area — a failed/speculated task can never
    leave a half-shard where a reader (or the streaming reader above,
    whose offsets are shard counts) would see it."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("bht_jsonl requires .option('path', <dir>)")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.jsonl"
        staged = os.path.join(staging, name)
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {f: row[i] for i, f in enumerate(self.fields)}
                    )
                    + "\n"
                )
                n += 1
        return _ShardCommit(
            staged=staged,
            final=os.path.join(self.path, name),
            n_rows=n,
        )

    def commit(self, messages):
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, name))
        for m in messages:
            os.replace(m.staged, m.final)
        self._cleanup()

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        self._cleanup()

    def _cleanup(self):
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)
