"""Reconciliation queries (q146-q147): Merkle-style snapshot diff
(find what changed between two table versions without comparing every
row pair) and survivorship merge (collapse duplicate clusters to one
golden record by deterministic precedence rules).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import load_table

# deterministic synthetic "second snapshot" of orders, built
# identically on the Spark and oracle sides: ~1% updated, ~1% deleted,
# ~1% inserted (keyed far above the live range)
_UPD, _DEL, _INS = 7, 13, 21
_INS_OFFSET = 10_000_000
_N_BUCKETS = 4096


@register(
    "q146_snapshot_diff_merkle",
    tier="T1",
    oracle=f"""
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
),
v2 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 97 = {_UPD} THEN round(o_totalprice + 10.0, 2)
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 97 != {_DEL}
  UNION ALL
  SELECT o_orderkey + {_INS_OFFSET}, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 97 = {_INS}
)
SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
       CASE WHEN v2.o_orderkey IS NULL THEN 'deleted'
            WHEN v1.o_orderkey IS NULL THEN 'inserted'
            ELSE 'updated' END AS change_type
FROM v1 FULL JOIN v2 ON v1.o_orderkey = v2.o_orderkey
WHERE v2.o_orderkey IS NULL OR v1.o_orderkey IS NULL
   OR v1.o_custkey != v2.o_custkey
   OR v1.o_orderstatus != v2.o_orderstatus
   OR v1.o_totalprice != v2.o_totalprice
""",
)
def q146_snapshot_diff_merkle(spark, sf_dir):
    """Snapshot reconciliation via Merkle-style bucket digests: find
    every inserted/deleted/updated key between two versions of orders
    WITHOUT row-comparing the unchanged 97% of the table.

    Phase 1 (digest): each side aggregates per hash-bucket (4096
    buckets on the key) a digest of (row count, XOR of full-row
    xxhash64, exact DECIMAL sum of row hashes) — two domain-bounded
    partial-agg passes whose output is 4096 rows per side regardless
    of table size.  Phase 2 (drill-down): only buckets whose digests
    disagree (broadcast set) are re-read row-level and full-outer
    key-joined to classify changes.  With a 1% change rate the
    drill-down touches a few percent of rows; with zero drift it
    touches none — this is how cross-region replicas and backup
    verifiers reconcile at 100 TB (rsync/Merkle logic on a shuffle
    engine).  Digest equality is probabilistic (XOR+sum collision
    ~2^-128); the oracle's exhaustive FULL JOIN diff proves it exact
    on this data.

    The second snapshot is derived deterministically from the fixture
    (~1% updated / deleted / inserted), identically in both engines.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    v1 = base
    v2 = (
        base.filter(F.col("o_orderkey") % 97 != _DEL)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 97 == _UPD,
                F.round(F.col("o_totalprice") + 10.0, 2),
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 97 == _INS).withColumn(
                "o_orderkey", F.col("o_orderkey") + _INS_OFFSET
            )
        )
    )

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]

    def digests(df):
        h = F.xxhash64(*[F.col(c) for c in cols])
        return (
            df.select(
                F.pmod(F.xxhash64("o_orderkey"), F.lit(_N_BUCKETS)).alias("bucket"),
                h.alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.bit_xor("h").alias("hx"),
                F.sum(F.col("h").cast("decimal(38,0)")).alias("hs"),
            )
        )

    d1, d2 = digests(v1), digests(v2)
    dirty = (
        d1.alias("a")
        .join(d2.alias("b"), "bucket", "full")
        .filter(
            F.coalesce(F.col("a.cnt") != F.col("b.cnt"), F.lit(True))
            | F.coalesce(F.col("a.hx") != F.col("b.hx"), F.lit(True))
            | F.coalesce(F.col("a.hs") != F.col("b.hs"), F.lit(True))
        )
        .select("bucket")
    )
    bucket_of = F.pmod(F.xxhash64("o_orderkey"), F.lit(_N_BUCKETS)).alias("bucket")
    v1d = v1.withColumn("bucket", bucket_of).join(
        F.broadcast(dirty), "bucket", "left_semi"
    )
    v2d = v2.withColumn("bucket", bucket_of).join(
        F.broadcast(dirty), "bucket", "left_semi"
    )
    a, b = v1d.alias("a"), v2d.alias("b")
    return (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full")
        .filter(
            F.col("b.o_orderkey").isNull()
            | F.col("a.o_orderkey").isNull()
            | (F.col("a.o_custkey") != F.col("b.o_custkey"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
        )
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("b.o_orderkey").isNull(), "deleted")
            .when(F.col("a.o_orderkey").isNull(), "inserted")
            .otherwise("updated")
            .alias("change_type"),
        )
    )


@register(
    "q147_survivorship_merge",
    tier="T2",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang, source, n_chars,
         md5(array_to_string(string_split(lower(trim(text)), ' ')[1:10], ' ')) AS k
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY k ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY k) AS dup_cnt,
         min(doc_id) OVER (PARTITION BY k) AS first_doc_id,
         max(n_chars) OVER (PARTITION BY k) AS max_chars
  FROM keyed
)
SELECT doc_id AS survivor_id, CAST(dup_cnt AS BIGINT) AS dup_cnt,
       CAST(first_doc_id AS BIGINT) AS first_doc_id,
       CAST(max_chars AS BIGINT) AS max_chars, lang, source
FROM ranked WHERE rn = 1 AND dup_cnt > 1
""",
)
def q147_survivorship_merge(spark, sf_dir):
    """Survivorship (golden-record) merge for duplicate document
    clusters keyed by a 10-token prefix fingerprint: within each
    cluster, the survivor is the longest doc (doc_id as the
    deterministic tiebreak), and merged attributes (first-seen id, max
    length) are consolidated from the whole cluster — the step after
    dedup DETECTION (q25/q35) that MDM / corpus-consolidation
    pipelines actually ship.

    Scale shape: one shuffle on the fingerprint key; the window runs
    per-cluster (bounded group size), and survivor choice + attribute
    merge happen in the same pass — no self-join of the cluster
    against itself.  Only multi-member clusters are emitted.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(
            F.concat_ws(" ", F.slice(F.split(F.lower(F.trim("text")), " "), 1, 10))
        ).alias("k"),
    )
    w = Window.partitionBy("k")
    wr = w.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("dup_cnt"),
            F.min("doc_id").over(w).cast("bigint").alias("first_doc_id"),
            F.max("n_chars").over(w).cast("bigint").alias("max_chars"),
        )
        .filter((F.col("rn") == 1) & (F.col("dup_cnt") > 1))
        .select(
            F.col("doc_id").alias("survivor_id"),
            "dup_cnt",
            "first_doc_id",
            "max_chars",
            "lang",
            "source",
        )
    )
