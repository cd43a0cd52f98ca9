"""Custom Python data sources (PySpark 4 DataSource API).

The reference's "source" is an in-memory ``InputVec`` split among N
worker threads (MapReduceFramework.cpp job setup); the Spark-native
generalization is a DataSource whose ``partitions()`` carve the input
into independent splits the scheduler fans out across executors. Two
sources here:

- ``docgen`` — a deterministic synthetic-documents generator with
  partition-level *filter pushdown*: range predicates on ``doc_id``
  prune whole generator partitions before any row exists. This is the
  Python-API mirror of parquet partition pruning, and the pattern for
  wrapping any shardable upstream (an API with cursor ranges, a
  keyspace scan) as a first-class parallel source.
- ``jsonl`` — newline-delimited-JSON reader/writer, the corpus
  interchange format. One split per file on read; one shard file per
  task on write (commit messages carry per-task row counts back to the
  driver, mirroring the reference's output-bag collection).

Registered per-session via :func:`register_python_sources`. Rows cross
the Python worker boundary batched — for heavy columns prefer the
parquet fixtures; these sources exist for *extensibility* parity, and
``docgen`` additionally as an unbounded-scale test-data fountain (no
bytes on disk, any SF).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_DOCGEN_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_VOCAB = (
    "the a spark table row scan hash join sort merge batch value key part "
    "window line fast slow agg data"
).split()
_LANGS = ("en", "de", "fr")


def _lcg(x: int) -> int:
    # deterministic 63-bit mix; same doc everywhere, every run
    return (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)


def _doc_row(doc_id: int):
    h = _lcg(doc_id)
    n_words = 10 + h % 40
    words = []
    w = h
    for _ in range(n_words):
        w = _lcg(w)
        words.append(_VOCAB[w % len(_VOCAB)])
    text = " ".join(words)
    return (doc_id, text, _LANGS[h % len(_LANGS)], f"gen{h % 7}", len(text))


class _DocGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.lo = 0
        self.hi = self.n_rows  # exclusive

    def pushFilters(self, filters):
        # accept range predicates on doc_id: they tighten [lo, hi) and
        # prune whole generator partitions in partitions()
        for f in filters:
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and f.attribute == ("doc_id",):
                v = f.value
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:
                    self.hi = min(self.hi, v + 1)
            else:
                yield f  # cannot handle -> Spark keeps it

    def partitions(self):
        step = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        out = []
        for i in range(self.n_parts):
            lo, hi = i * step, min((i + 1) * step, self.n_rows)
            # pruned: intersect the partition's natural range with the
            # pushed-down bounds, drop empty splits driver-side
            lo, hi = max(lo, self.lo), min(hi, self.hi)
            if lo < hi:
                out.append(InputPartition((lo, hi)))
        return out or [InputPartition((0, 0))]

    def read(self, partition):
        lo, hi = partition.value
        for doc_id in range(lo, hi):
            yield _doc_row(doc_id)


class _DocGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch form of the generator: the offset is just the next
    doc_id, so replay-from-checkpoint is exact by construction (the
    same offset range regenerates byte-identical rows — the property a
    real ingest source gets from a durable log)."""

    def __init__(self, options):
        self.batch_rows = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 1000))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        lo = start["offset"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return (iter([_doc_row(i) for i in range(lo, hi)]), {"offset": hi})

    def readBetweenOffsets(self, start, end):
        return iter([_doc_row(i) for i in range(start["offset"], end["offset"])])


class DocGenDataSource(DataSource):
    """`spark.read.format("docgen").option("rows", N).load()` or
    `spark.readStream.format("docgen").option("maxRows", N).load()`."""

    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return _DOCGEN_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _DocGenReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _DocGenStreamReader(self.options)


class _JsonlReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl source requires .option('path', dir) or load(dir)")
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        # skip _/.-prefixed names: metadata (manifests), hidden files —
        # the same convention hadoop FileInputFormat applies
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl") and not f.startswith(("_", "."))
        )
        return [InputPartition(f) for f in files] or [InputPartition(None)]

    def read(self, partition):
        if partition.value is None:
            return
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    obj = json.loads(line)
                    yield tuple(obj.get(name) for name in self.fields)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl sink requires .option('path', dir) or save(dir)")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.fields, row))) + "\n")
                n += 1
        return _JsonlCommit(out, n)

    def commit(self, messages):
        # driver-side: the reference collects the output bag after the
        # reduce barrier; here the commit messages carry shard manifests
        total = sum(m.rows for m in messages if m is not None)
        files = sorted(m.file for m in messages if m is not None)
        if self.overwrite:
            # an overwrite with fewer tasks than the previous write must
            # not leave stale shards behind for the reader to pick up
            keep = {os.path.basename(f) for f in files}
            for name in os.listdir(self.path):
                if (
                    name.endswith(".jsonl")
                    and not name.startswith(("_", "."))
                    and name not in keep
                ):
                    os.remove(os.path.join(self.path, name))
        manifest = {"rows": total, "files": files}
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming jsonl sink: one shard file per (micro-batch, task),
    named so batches never collide; ``commit`` appends a per-batch
    manifest line (exactly-once bookkeeping: a replayed batch id simply
    overwrites its own shard files and re-logs, the reader reconciles
    by the last manifest line per batch — the same idempotency contract
    as ``streaming/sinks.py::foreach_batch_parquet``)."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl stream sink requires .option('path', dir)")
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        # taskAttemptId is unique per attempt; the final name carries the
        # batch id in commit's manifest, files here carry partition id
        out = os.path.join(
            self.path, f"stream-{ctx.stageId()}-{ctx.partitionId():05d}.jsonl"
        )
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.fields, row))) + "\n")
                n += 1
        return _JsonlCommit(out, n)

    def commit(self, messages, batchId):
        entry = {
            "batch": batchId,
            "rows": sum(m.rows for m in messages if m is not None),
            "files": sorted(m.file for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_STREAM_MANIFEST.jsonl"), "a") as fh:
            fh.write(json.dumps(entry) + "\n")

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class JsonlDataSource(DataSource):
    """JSONL corpus interchange: `df.write.format("jsonl").save(dir)` /
    `spark.read.format("jsonl").schema(ddl).load(dir)`."""

    @classmethod
    def name(cls) -> str:
        return "jsonl"

    def schema(self) -> str:
        # reading requires an explicit schema (JSONL carries no types);
        # default to the documents contract so the common case just works
        return _DOCGEN_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _JsonlReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return _JsonlStreamWriter(self.options, schema)


def register_python_sources(spark) -> None:
    """Idempotently register docgen + jsonl on this session; enables
    Python-source filter pushdown (off by default, runtime-settable)
    so docgen's partition pruning actually fires."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocGenDataSource)
    spark.dataSource.register(JsonlDataSource)
