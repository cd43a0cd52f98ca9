"""Python DataSource API sources: docgen (deterministic generator with
filter pushdown -> partition pruning) and jsonl (reader/writer with
commit-manifest)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from multi_threaded_mapreduce_framework_spark.sources import register_python_sources

DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_python_sources(spark)


def test_docgen_counts_and_parallelism(spark):
    df = spark.read.format("docgen").option("rows", 500).option("partitions", 8).load()
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    assert df.select("doc_id").distinct().count() == 500


def test_docgen_deterministic_across_partitionings(spark):
    a = spark.read.format("docgen").option("rows", 200).load().collect()
    b = (
        spark.read.format("docgen")
        .option("rows", 200)
        .option("partitions", 3)
        .load()
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_docgen_pushdown_prunes_partitions(spark):
    df = spark.read.format("docgen").option("rows", 500).option("partitions", 8).load()
    pruned = df.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 163))
    # 500 rows / 8 partitions = 63-row splits; [100, 163) touches exactly 2
    assert pruned.rdd.getNumPartitions() == 2
    assert pruned.count() == 63
    # residual (non-range) predicates stay in Spark and still apply
    mixed = df.filter((F.col("doc_id") < 63) & (F.col("lang") == "en"))
    assert mixed.rdd.getNumPartitions() == 1
    assert mixed.count() == df.filter("doc_id < 63").filter("lang = 'en'").count()


def test_docgen_stream_converges_to_batch(spark):
    stream = (
        spark.readStream.format("docgen")
        .option("rowsPerBatch", 64)
        .option("maxRows", 300)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("docgen_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(map(tuple, spark.table("docgen_stream").collect()))
        batch = sorted(
            map(tuple, spark.read.format("docgen").option("rows", 300).load().collect())
        )
        assert got == batch
    finally:
        q.stop()


def test_jsonl_roundtrip_with_manifest(spark, tmp_path):
    d = str(tmp_path / "corpus")
    src = spark.read.format("docgen").option("rows", 120).option("partitions", 4).load()
    src.write.format("jsonl").mode("overwrite").option("path", d).save()

    manifest = json.load(open(os.path.join(d, "_MANIFEST.json")))
    assert manifest["rows"] == 120
    assert len(manifest["files"]) == 4

    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_jsonl_stream_sink_writes_manifest_per_batch(spark, tmp_path):
    d = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("docgen")
        .option("rowsPerBatch", 50)
        .option("maxRows", 150)
        .load()
    )
    q = (
        stream.writeStream.format("jsonl")
        .option("path", d)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    manifest = [
        json.loads(line)
        for line in open(os.path.join(d, "_STREAM_MANIFEST.jsonl"))
        if line.strip()
    ]
    assert sum(m["rows"] for m in manifest) == 150
    assert len({m["batch"] for m in manifest}) == len(manifest)  # one line per batch

    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    batch = spark.read.format("docgen").option("rows", 150).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, batch.collect()))


def test_jsonl_overwrite_sweeps_stale_shards(spark, tmp_path):
    d = str(tmp_path / "over")
    big = spark.read.format("docgen").option("rows", 100).option("partitions", 4).load()
    big.write.format("jsonl").mode("overwrite").option("path", d).save()
    small = (
        spark.read.format("docgen").option("rows", 30).option("partitions", 1).load()
    )
    small.write.format("jsonl").mode("overwrite").option("path", d).save()

    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    # a stale shard from the 4-task write would make this 100-ish
    assert back.count() == 30
    assert json.load(open(os.path.join(d, "_MANIFEST.json")))["rows"] == 30


def test_streaming_corpus_ingest_pipeline(spark, tmp_path):
    """End-to-end ingest: docgen stream -> exact dedup on doc_id ->
    jsonl sink. The full custom-source/custom-sink path with a stateful
    operator in the middle, converging to the batch read."""
    d = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ingest_ckpt")
    stream = (
        spark.readStream.format("docgen")
        .option("rowsPerBatch", 40)
        .option("maxRows", 120)
        .load()
        .dropDuplicates(["doc_id"])
    )
    q = (
        stream.writeStream.format("jsonl")
        .option("path", d)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    batch = spark.read.format("docgen").option("rows", 120).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, batch.collect()))


def test_docgen_stream_batches_are_partition_planned(spark, tmp_path):
    """The stream reader is the partition-based DataSourceStreamReader:
    each micro-batch's offset range is split into streamPartitions
    executor-side splits (visible as multiple sink shards per batch),
    never materialized on the driver."""
    d = str(tmp_path / "planned_out")
    ckpt = str(tmp_path / "planned_ckpt")
    stream = (
        spark.readStream.format("docgen")
        .option("rowsPerBatch", 64)
        .option("maxRows", 192)
        .option("streamPartitions", 4)
        .load()
    )
    q = (
        stream.writeStream.format("jsonl")
        .option("path", d)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    manifest = [
        json.loads(line)
        for line in open(os.path.join(d, "_STREAM_MANIFEST.jsonl"))
        if line.strip()
    ]
    non_empty = [m for m in manifest if m["rows"] > 0]
    assert non_empty, manifest
    for m in non_empty:
        assert len(m["files"]) == 4, m  # one shard per stream partition
        # shard names derive from the micro-batch id -> replay overwrites
        for f in m["files"]:
            assert os.path.basename(f).startswith(f"stream-{m['batch']:08d}-"), f
    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    batch = spark.read.format("docgen").option("rows", 192).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, batch.collect()))


def test_jsonl_reader_trusts_manifest_over_glob(spark, tmp_path):
    """A stray uncommitted shard (failed attempt, manual copy) is
    invisible to readers: the committed manifest scopes the file set."""
    d = str(tmp_path / "scoped")
    src = spark.read.format("docgen").option("rows", 50).option("partitions", 2).load()
    src.write.format("jsonl").mode("overwrite").option("path", d).save()
    with open(os.path.join(d, "stray-leftover.jsonl"), "w") as fh:
        fh.write(json.dumps(dict(zip(DDL.split(", "), [999]))) + "\n")
    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    assert back.count() == 50


def test_jsonl_append_mode_merges(spark, tmp_path):
    """mode('append') must add shards, not clobber same-named ones from
    the previous write, and the manifest merges files + row counts."""
    d = str(tmp_path / "app")
    a = spark.read.format("docgen").option("rows", 40).option("partitions", 2).load()
    a.write.format("jsonl").mode("overwrite").option("path", d).save()
    b = (
        spark.read.format("docgen")
        .option("rows", 70)
        .option("partitions", 2)
        .load()
        .filter("doc_id >= 40")
    )
    b.write.format("jsonl").mode("append").option("path", d).save()

    manifest = json.load(open(os.path.join(d, "_MANIFEST.json")))
    assert manifest["rows"] == 70
    # first write: 2 shards; append: doc_id>=40 pushdown prunes docgen
    # to a single partition -> 1 uuid-named shard, nothing clobbered
    assert len(manifest["files"]) == 3
    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    batch = spark.read.format("docgen").option("rows", 70).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, batch.collect()))


def test_jsonl_no_temp_files_after_commit(spark, tmp_path):
    d = str(tmp_path / "clean")
    src = spark.read.format("docgen").option("rows", 30).load()
    src.write.format("jsonl").mode("overwrite").option("path", d).save()
    leftovers = [f for f in os.listdir(d) if f.startswith(".")]
    assert leftovers == [], leftovers


def test_docgen_stream_restart_from_checkpoint(spark, tmp_path):
    """Checkpoint recovery for the partition-planned reader: a second
    run with a LARGER maxRows resumes from the committed offset — every
    doc appears exactly once across both runs, none are lost, and the
    pacer re-syncs even though the fresh reader starts with an empty
    in-memory high-water mark."""
    d = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")

    def run(max_rows):
        stream = (
            spark.readStream.format("docgen")
            .option("rowsPerBatch", 64)
            .option("maxRows", max_rows)
            .option("streamPartitions", 4)
            .load()
        )
        q = (
            stream.writeStream.format("jsonl")
            .option("path", d)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(120)
    run(240)
    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    batch = spark.read.format("docgen").option("rows", 240).load()
    # exactly once: equality as multisets (no dupes, no gaps)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, batch.collect()))


# ---------------------------------------------------- concurrent appends
def test_manifest_lock_serializes_concurrent_merges(tmp_path):
    """The lost-update race pinned directly (VERDICT r10 item 6): 8 raw
    threads x 25 read-merge-write cycles each against one manifest.
    Without the lock, two merges reading the same previous state drop
    each other's entries; with it, every one of the 200 unique files
    must survive into the final committed set."""
    import threading

    from multi_threaded_mapreduce_framework_spark.sources.pydatasource import (
        _with_manifest_lock,
    )

    path = str(tmp_path / "_MANIFEST.json")

    def merge_one(name):
        def body():
            manifest = {"rows": 0, "files": []}
            if os.path.exists(path):
                with open(path) as fh:
                    manifest = json.load(fh)
            manifest = {
                "rows": manifest["rows"] + 1,
                "files": sorted(set(manifest["files"]) | {name}),
            }
            tmp = path + ".tmp-" + name
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, path)

        _with_manifest_lock(path, body)

    def hammer(tid):
        for i in range(25):
            merge_one(f"part-{tid:02d}-{i:02d}.jsonl")

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    final = json.load(open(path))
    assert final["rows"] == 200
    assert len(final["files"]) == 200
    assert not os.path.exists(path + ".lock")  # released


def test_jsonl_concurrent_append_jobs_lose_nothing(spark, tmp_path):
    """Two APPEND jobs racing the manifest merge end to end: both jobs'
    shards (job-uuid names — never colliding) and both jobs' manifest
    entries must be visible to the committed-files reader afterwards."""
    import threading

    d = str(tmp_path / "race")
    lo = spark.read.format("docgen").option("rows", 60).option(
        "partitions", 3
    ).load().filter("doc_id < 30")
    hi = spark.read.format("docgen").option("rows", 60).option(
        "partitions", 3
    ).load().filter("doc_id >= 30")
    errs = []

    def append(df):
        try:
            # py4j pins each Python thread to its own JVM thread, whose
            # active-session ThreadLocal is unset — without it the JVM
            # can't see the session's Python data source registry
            spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            df.write.format("jsonl").mode("append").option("path", d).save()
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=append, args=(df,)) for df in (lo, hi)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    manifest = json.load(open(os.path.join(d, "_MANIFEST.json")))
    assert manifest["rows"] == 60
    back = spark.read.format("jsonl").schema(DDL).option("path", d).load()
    batch = spark.read.format("docgen").option("rows", 60).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, batch.collect()))
