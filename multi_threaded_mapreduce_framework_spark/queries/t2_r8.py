"""Tier T2 — round-8 band: privacy audit, embedding truncation
fidelity, lakehouse OPTIMIZE verification.

- q238: k-anonymity census over quasi-identifiers — the re-identification
  audit a corpus release runs before publishing (Sweeney 2002): how many
  quasi-identifier groups (and what share of rows) fall below each
  anonymity threshold k.
- q239: Matryoshka truncation-fidelity census (Kusupati et al. 2022,
  "Matryoshka Representation Learning"): top-10 retrieval overlap
  between full 64-dim cosine ranking and the 16-dim-prefix ranking, per
  pinned probe — the measured answer to "can we serve 4x-cheaper
  truncated embeddings", q210's measure-don't-guess discipline applied
  to dimension reduction.
- q240: OPTIMIZE (small-file compaction) verified end to end: a real
  small-file layout is written, a real reader-atomic rewrite runs
  (operators/compact.py), and the census reports the POST-compaction
  on-disk state — hash-gated against the pure row-law plan, so the
  oracle proves the rewrite produced exactly the planned file count and
  lost zero rows.

Reference note: beyond-reference capabilities (the reference,
MapReduceFramework.cpp:1-377, is a single-shape map/sort/shuffle/reduce
library); declared per the builder brief's training-data-pipeline
rubric under the standard oracle conventions (FIXTURES.md).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import (
    layout_tag,
    load_table,
    spread_small_scan,
)

# ------------------------------------------------------------------ q238
_KANON_GRID = (2, 5, 10)


@register(
    "q238_k_anonymity_census",
    tier="T2",
    oracle=f"""
WITH g AS (
  SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
         CAST(count(*) AS BIGINT) AS grp
  FROM documents GROUP BY 1, 2, 3),
t AS (SELECT CAST(sum(grp) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_groups FROM g),
k AS (SELECT unnest([{", ".join(str(k) for k in _KANON_GRID)}]) AS k)
SELECT CAST(k AS BIGINT) AS k,
       CAST(count(*) FILTER (WHERE grp < k) AS BIGINT) AS groups_below_k,
       CAST(coalesce(sum(grp) FILTER (WHERE grp < k), 0) AS BIGINT)
         AS rows_below_k,
       CAST(1000 * coalesce(sum(grp) FILTER (WHERE grp < k), 0)
            // max(total) AS BIGINT) AS at_risk_milli,
       max(n_groups) AS n_groups
FROM g, t, k GROUP BY k
""",
)
def q238_k_anonymity_census(spark, sf_dir):
    """k-anonymity census (Sweeney 2002) over the release's
    quasi-identifier tuple (lang, source, 100-char length bucket): for
    each anonymity threshold k in {2, 5, 10}, how many quasi-identifier
    groups have fewer than k members, how many rows sit in them, and
    the at-risk share — the re-identification audit a corpus release
    (or its metadata card, q228) runs before publishing.  A row in a
    group of size 1 is uniquely re-identifiable from its
    quasi-identifiers alone; k-anonymity is the standard floor the
    release must state.

    Plan: the corpus collapses to the quasi-identifier census in ONE
    partial-agg shuffle (group count is bounded by the quasi-id domain,
    not the corpus); the k-grid (3 rows) and the 1-row total broadcast
    into the bounded group table; all-integer output — hash-exact at
    any scale."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(
        "lang",
        "source",
        F.expr("CAST(n_chars div 100 AS BIGINT)").alias("len_bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("grp"))
    t = g.agg(
        F.sum("grp").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    k = spark.createDataFrame([(int(x),) for x in _KANON_GRID], "k bigint")
    return (
        g.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(k))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("grp") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("groups_below_k"),
            F.sum(F.when(F.col("grp") < F.col("k"), F.col("grp")).otherwise(0))
            .cast("bigint")
            .alias("rows_below_k"),
            F.expr(
                "CAST(1000 * sum(CASE WHEN grp < k THEN grp ELSE 0 END)"
                " div max(total) AS BIGINT)"
            ).alias("at_risk_milli"),
            F.max("n_groups").alias("n_groups"),
        )
    )


# ------------------------------------------------------------------ q239
_MRL_PROBES = 5
_MRL_DIM = 16
_MRL_TOPK = 10


def _duck_dot(a: str, b: str, n: int) -> str:
    """Dot product as the SAME left-to-right fold Spark's ``aggregate``
    runs (list_reduce seeds with the first element, Spark with 0.0;
    IEEE 0 + x == x, so the folds are bit-identical)."""
    return (
        f"list_reduce(list_transform(range(1, {n + 1}),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def _mrl_oracle() -> str:
    d, k, p, top = _MRL_DIM, _MRL_TOPK, _MRL_PROBES, _MRL_TOPK
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (SELECT vec_id AS pid, v AS pv FROM e ORDER BY vec_id LIMIT {p}),
c AS (SELECT pid, vec_id,
        {_duck_dot("v", "pv", 64)}
          / (sqrt({_duck_dot("v", "v", 64)})
             * sqrt({_duck_dot("pv", "pv", 64)})) AS cf,
        {_duck_dot("v", "pv", d)}
          / (sqrt({_duck_dot("v", "v", d)})
             * sqrt({_duck_dot("pv", "pv", d)})) AS ct
      FROM e, p WHERE vec_id <> pid),
rf AS (SELECT pid, vec_id,
              row_number() OVER (PARTITION BY pid ORDER BY cf DESC, vec_id)
                AS r FROM c),
rt AS (SELECT pid, vec_id,
              row_number() OVER (PARTITION BY pid ORDER BY ct DESC, vec_id)
                AS r FROM c),
j AS (SELECT rf.pid, CAST(count(*) AS BIGINT) AS n_common
      FROM rf JOIN rt ON rf.pid = rt.pid AND rf.vec_id = rt.vec_id
      WHERE rf.r <= {top} AND rt.r <= {top} GROUP BY rf.pid)
SELECT p.pid AS probe_id,
       CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
       CAST(1000 * coalesce(n_common, 0)
            // ({2 * top} - coalesce(n_common, 0)) AS BIGINT) AS jaccard_milli
FROM p LEFT JOIN j ON p.pid = j.pid
"""


@register("q239_matryoshka_truncation", tier="T2", oracle=_mrl_oracle())
def q239_matryoshka_truncation(spark, sf_dir):
    """Matryoshka truncation-fidelity census (Kusupati et al. 2022):
    per pinned probe (the 5 lowest vec_ids), the top-10 retrieval
    overlap and Jaccard between the FULL 64-dim cosine ranking and the
    ranking under the first-16-dims truncation — the measured go/no-go
    for serving 4x-cheaper truncated embeddings (q210's
    measure-don't-guess discipline applied to dimension reduction; on
    this synthetic space the overlap is LOW, which is itself the
    deliverable: these embeddings are not MRL-trained, so prefix
    truncation destroys the ranking).

    Cross-engine exactness: both cosines are the identical
    left-to-right IEEE fold in both engines (see ``_duck_dot``;
    norms multiply before the division in the same shape), so the
    rankings — ordered by unrounded doubles with the vec_id integer
    tiebreak — are bit-identical (the q206/q209 accepted class,
    de-risked by bitwise-equal inputs).

    Plan: candidate norms (64-dim and 16-dim) are computed ONCE per
    vector map-side BEFORE the probe fan-out (HOF expressions get no
    CSE — the q213 discipline), the 5-row probe table broadcasts into
    the scan, and each ranking is a per-probe rank window that plans
    as WindowGroupLimit (per-task partial top-k before the exchange,
    q210's law) — the audit stays O(scan) at any corpus size with
    probe count pinned."""
    e = spread_small_scan(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    fold = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, w) -> acc + w)"
    e2 = e.select(
        "vec_id",
        "v",
        F.expr(f"slice(v, 1, {_MRL_DIM})").alias("vt"),
    ).select(
        "vec_id",
        "v",
        "vt",
        F.expr(f"sqrt({fold.format(a='v', b='v')})").alias("n64"),
        F.expr(f"sqrt({fold.format(a='vt', b='vt')})").alias("n16"),
    )
    p = (
        e2.orderBy(F.asc("vec_id"))
        .limit(_MRL_PROBES)
        .select(
            F.col("vec_id").alias("pid"),
            F.col("v").alias("pv"),
            F.col("vt").alias("pvt"),
            F.col("n64").alias("pn64"),
            F.col("n16").alias("pn16"),
        )
    )
    c = (
        e2.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            "vec_id",
            F.expr(f"{fold.format(a='v', b='pv')} / (n64 * pn64)").alias("cf"),
            F.expr(f"{fold.format(a='vt', b='pvt')} / (n16 * pn16)").alias(
                "ct"
            ),
        )
    )
    wf = Window.partitionBy("pid").orderBy(F.desc("cf"), F.asc("vec_id"))
    wt = Window.partitionBy("pid").orderBy(F.desc("ct"), F.asc("vec_id"))
    rf = c.select("pid", "vec_id", F.row_number().over(wf).alias("r")).filter(
        F.col("r") <= _MRL_TOPK
    )
    rt = c.select("pid", "vec_id", F.row_number().over(wt).alias("r")).filter(
        F.col("r") <= _MRL_TOPK
    )
    j = rf.join(rt, ["pid", "vec_id"]).groupBy("pid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common")
    )
    return (
        p.select("pid")
        .join(j, "pid", "left")
        .select(
            F.col("pid").alias("probe_id"),
            F.coalesce("n_common", F.lit(0)).cast("bigint").alias("n_common"),
            F.expr(
                f"CAST(1000 * coalesce(n_common, 0)"
                f" div ({2 * _MRL_TOPK} - coalesce(n_common, 0)) AS BIGINT)"
            ).alias("jaccard_milli"),
        )
    )


# ------------------------------------------------------------------ q240
_OPT_FILES_PER_PART = 8
_OPT_SMALL_FILES = 32

# (applicationId, sf_dir) -> census DataFrame; the rewrite ran once
_OPT_CACHE: dict = {}


@register(
    "q240_optimize_compaction_census",
    tier="T2",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST((count(*) + ((count(*) + {_OPT_FILES_PER_PART - 1})
                         // {_OPT_FILES_PER_PART}) - 1)
            // ((count(*) + {_OPT_FILES_PER_PART - 1})
                // {_OPT_FILES_PER_PART}) AS BIGINT) AS files_after
FROM events GROUP BY event_type
""",
)
def q240_optimize_compaction_census(spark, sf_dir):
    """OPTIMIZE verified end to end (the lakehouse small-file
    maintenance job next to q230's MERGE): the builder writes a REAL
    over-partitioned layout (events hive-partitioned by event_type,
    32 shuffle tasks -> up to 32 small files per partition), runs the
    reader-atomic row-targeted rewrite (operators/compact.py — temp
    sibling + directory-rename swap, shuffle-free coalesce) against
    every partition, and returns the POST-compaction on-disk census:
    rows read back from the rewritten files and the file count
    LISTED from disk.  The oracle is the pure row-law plan —
    target_rows = ceil(rows/8), files_after = ceil(rows/target_rows) —
    so the hash gate proves the physical rewrite produced EXACTLY the
    planned file count and lost zero rows; any half-written state,
    dropped row, or off-by-one in the plan breaks the hash.

    Scale shape: compaction lists and rewrites one partition
    directory at a time (at 100 TB each partition's rewrite is an
    independent shuffle-free coalesce job over that partition's files
    only — exactly Delta/Iceberg OPTIMIZE's per-partition bin-packing
    unit); the census the driver hashes is |event_type| rows.  The
    builder raises loudly if the small-file layout has fewer files
    than the plan needs (cannot-compact-upward guard) rather than
    returning a census the oracle would rightly fail."""
    import math as _math

    from multi_threaded_mapreduce_framework_spark.operators.compact import (
        _parquet_files,
        compact_parquet_dir_rows,
    )

    key = (spark.sparkContext.applicationId, sf_dir, "optimize")
    cached = _OPT_CACHE.get(key)
    if cached is not None:
        return cached
    base = os.path.join(
        tempfile.gettempdir(),
        "mtmrf_layout",
        layout_tag(spark, sf_dir),
        "optimize_census",
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    ev.repartition(_OPT_SMALL_FILES).write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(base)
    rows_out = []
    for d in sorted(os.listdir(base)):
        if not d.startswith("event_type="):
            continue
        part_dir = os.path.join(base, d)
        et = d.split("=", 1)[1]
        n = spark.read.parquet(part_dir).count()
        target = _math.ceil(n / _OPT_FILES_PER_PART)
        planned = _math.ceil(n / target)
        if len(_parquet_files(part_dir)) < planned:
            raise RuntimeError(
                f"small-file layout under {part_dir} has fewer files than "
                f"the plan ({planned}) — cannot compact upward"
            )
        compact_parquet_dir_rows(spark, part_dir, target_rows=target)
        n_after = spark.read.parquet(part_dir).count()
        files_after = len(_parquet_files(part_dir))
        rows_out.append((et, int(n_after), int(files_after)))
    cached = spark.createDataFrame(
        rows_out, "event_type string, n_rows bigint, files_after bigint"
    ).localCheckpoint()
    _OPT_CACHE[key] = cached
    return cached
