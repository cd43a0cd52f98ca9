"""Ingestion robustness: malformed-record recovery (PERMISSIVE /
DROPMALFORMED) and parquet schema evolution (mergeSchema).

At 100 TB the ingest layer WILL see corrupt lines and schema drift;
the engine's contract is: never fail the job for a bad row, never
silently drop one either — quarantine via ``_corrupt_record`` — and
read old+new layout generations through one unioned schema.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def test_permissive_json_quarantines_corrupt_rows(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "v": 10.5}\n')
        f.write("{this is not json}\n")
        f.write('{"id": 2, "v": "not-a-number"}\n')
        f.write('{"id": 3, "v": 7.25}\n')
    df = (
        spark.read.schema("id long, v double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(p)
    )
    rows = df.collect()
    assert len(rows) == 4  # nothing dropped, nothing failed
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 3}
    assert len(bad) == 2  # quarantined with original text preserved
    assert any("not json" in r["_corrupt_record"] for r in bad)


def test_dropmalformed_json_keeps_only_clean_rows(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "v": 1.0}\n')
        f.write("garbage\n")
        f.write('{"id": 2, "v": 2.0}\n')
    df = (
        spark.read.schema("id long, v double")
        .option("mode", "DROPMALFORMED")
        .json(p)
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_permissive_csv_quarantines_bad_fields(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("id,v\n1,10.5\n2,oops\n3,7.0\n")
    df = (
        spark.read.schema("id long, v double, _corrupt_record string")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(p)
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[2]["v"] is None and rows[2]["_corrupt_record"] == "2,oops"
    assert rows[1]["v"] == 10.5 and rows[1]["_corrupt_record"] is None


def test_parquet_merge_schema_reads_both_generations(spark, tmp_path):
    base = str(tmp_path / "t")
    # generation 1: (id, a); generation 2 adds column b
    spark.range(0, 5).withColumn("a", F.col("id") * 2).write.parquet(
        os.path.join(base, "gen=1")
    )
    spark.range(5, 10).withColumn("a", F.col("id") * 2).withColumn(
        "b", F.lit("new")
    ).write.parquet(os.path.join(base, "gen=2"))
    merged = spark.read.option("mergeSchema", True).option("basePath", base).parquet(
        base + "/gen=*"
    )
    assert {"id", "a", "b", "gen"} <= set(merged.columns)
    assert merged.count() == 10
    # old-generation rows surface the new column as null, not an error
    assert merged.filter((F.col("gen") == 1) & F.col("b").isNull()).count() == 5
    assert merged.filter(F.col("b") == "new").count() == 5
