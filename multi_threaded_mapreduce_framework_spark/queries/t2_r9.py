"""Tier T2 — round-9 band: the banded threshold curve and the
lakehouse VACUUM census.

- q249: q243's Jaccard threshold curve re-based on q35's MinHash-LSH
  candidate generation — the decision curve's own 100 TB path (r8
  verdict item 8).  q243's exact tier is doc_id-capped by declaration;
  this variant folds the same t-grid over the BANDED candidate set
  with exact shingle-Jaccard verification, so the curve scales exactly
  as far as q35 does (and the q222 error census bounds the sketch bias
  of what banding misses below the band threshold).
- q250: VACUUM retention sweep verified end to end over planted crash
  leftovers — completes the lakehouse maintenance trio (q230 MERGE,
  q240 OPTIMIZE, q250 VACUUM; r8 verdict item 9's named option).

Reference note: beyond-reference capability (the reference,
MapReduceFramework.cpp:1-377, is a single-shape map/sort/shuffle/reduce
library); declared per the builder brief's training-data-pipeline
rubric under the standard oracle conventions (FIXTURES.md).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.functions.texthash import (
    lsh_band_keys,
    minhash_signature_np,
    word_shingle_hashes,
)
from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.queries.t2_dedup import (
    _DUCK_SHINGLES,
    BAND_MIX,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    P,
)
from multi_threaded_mapreduce_framework_spark.queries.t2_r8 import (
    _JT_GRID,
    _OPT_FILES_PER_PART,
    _OPT_SMALL_FILES,
)
from multi_threaded_mapreduce_framework_spark.sources import (
    layout_tag,
    load_table,
    spread_small_scan,
)


# ------------------------------------------------------------------ q249
@register(
    "q249_banded_threshold_curve",
    tier="T2",
    oracle=f"""
WITH sh AS ({_DUCK_SHINGLES}),
shf AS (SELECT * FROM sh WHERE len(hs) > 0),
sig AS (
  SELECT doc_id, hs, list_transform(generate_series(0, {MINHASH_K - 1}),
    i -> list_min(list_transform(hs, h -> ((17+13*i)*h + (91+7*i)) % {P}))) AS sig
  FROM shf),
bands AS (
  SELECT doc_id, t.b AS band,
         list_reduce(sig[t.b*{LSH_ROWS}+1 : t.b*{LSH_ROWS}+{LSH_ROWS}],
                     (a,x) -> (a*{BAND_MIX}+x) % {P}) AS key
  FROM sig CROSS JOIN unnest(generate_series(0, {LSH_BANDS - 1})) AS t(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                            AND a.doc_id < b.doc_id),
pairs0 AS (
  SELECT d1, d2, len(list_intersect(x.hs, y.hs)) AS i,
         len(x.hs) AS n1, len(y.hs) AS n2
  FROM cand JOIN shf x ON x.doc_id = d1 JOIN shf y ON y.doc_id = d2),
pairs AS (
  SELECT CAST(1000 * i // (n1 + n2 - i) AS BIGINT) AS j_milli FROM pairs0),
g AS (SELECT unnest([{", ".join(str(t) for t in _JT_GRID)}]) AS t_milli)
SELECT CAST(t_milli AS BIGINT) AS t_milli,
       CAST(count(*) FILTER (WHERE j_milli >= t_milli) AS BIGINT) AS n_pairs,
       CAST(coalesce(sum(j_milli) FILTER (WHERE j_milli >= t_milli), 0)
            // greatest(count(*) FILTER (WHERE j_milli >= t_milli), 1)
            AS BIGINT) AS mean_j_milli
FROM pairs, g GROUP BY t_milli
""",
)
def q249_banded_threshold_curve(spark, sf_dir):
    """Threshold-sensitivity curve over the BANDED candidate set — the
    100 TB path for the q243 decision curve (r8 verdict item 8): q35's
    MinHash(16) + LSH(4x4) banding generates candidates over the FULL
    corpus (no doc_id cap), exact shingle-Jaccard verifies each
    candidate once, and the {0.3, 0.5, 0.7} grid folds over the
    verified pair relation.  Above the band threshold the curve is
    q35's universe exactly — the t=500 point counts precisely q35's
    output pairs (law-tested); below it the curve reads as "what
    banding surfaces", with q222's sketch-error census bounding what
    it misses.  Jaccard is integer milli (1000*i div union) — exact
    both engines, same measure the candidates were generated under
    (3-word shingles), so curve and generator tune together.

    Plan shape: q35's narrow band join + join-back verify (never all
    pairs), then the 3-row grid fold — a bounded-broadcast BNLJ over
    the tiny verified relation.  Scales exactly as far as q35 does:
    candidates per doc are bounded by band collisions, not corpus
    size."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    sh = (
        docs.filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", word_shingle_hashes("text").alias("hs"))
        .localCheckpoint()
    )
    sig = sh.select(
        "doc_id", minhash_signature_np(F.col("hs"), MINHASH_K).alias("sig")
    )
    bands = sig.select(
        "doc_id",
        F.explode(lsh_band_keys(F.col("sig"), LSH_BANDS, LSH_ROWS)).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    s1 = sh.select(F.col("doc_id").alias("d1"), F.col("hs").alias("hs1"))
    s2 = sh.select(F.col("doc_id").alias("d2"), F.col("hs").alias("hs2"))
    inter = F.size(F.array_intersect("hs1", "hs2"))
    union = F.size("hs1") + F.size("hs2") - inter
    pairs = (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select(
            (F.lit(1000) * inter)
            .cast("bigint")
            .alias("i1000"),
            union.cast("bigint").alias("u"),
        )
        .select(F.expr("CAST(i1000 div u AS BIGINT)").alias("j_milli"))
    )
    grid = spark.createDataFrame([(int(t),) for t in _JT_GRID], "t_milli bigint")
    return (
        pairs.crossJoin(F.broadcast(grid))
        .groupBy("t_milli")
        .agg(
            F.sum(F.when(F.col("j_milli") >= F.col("t_milli"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs"),
            F.expr(
                "CAST(coalesce(sum(CASE WHEN j_milli >= t_milli THEN j_milli END), 0)"
                " div greatest(sum(CASE WHEN j_milli >= t_milli THEN 1 ELSE 0 END), 1)"
                " AS BIGINT)"
            ).alias("mean_j_milli"),
        )
    )


# ------------------------------------------------------------------ q250
# (applicationId, sf_dir) -> census DataFrame; the rewrite+vacuum ran once
_VAC_CACHE: dict = {}


@register(
    "q250_vacuum_retention_census",
    tier="T2",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST((count(*) + ((count(*) + {_OPT_FILES_PER_PART - 1})
                         // {_OPT_FILES_PER_PART}) - 1)
            // ((count(*) + {_OPT_FILES_PER_PART - 1})
                // {_OPT_FILES_PER_PART}) AS BIGINT) AS files_after,
       CAST(2 AS BIGINT) AS orphans_removed
FROM events GROUP BY event_type
""",
)
def q250_vacuum_retention_census(spark, sf_dir):
    """VACUUM verified end to end — the retention sweep that completes
    the lakehouse maintenance trio (q230 MERGE, q240 OPTIMIZE, q250
    VACUUM; r8 verdict item 9's named option): the builder writes
    q240's over-partitioned events layout, PLANTS two crash leftovers
    per partition (a half-written ``._compact-*`` rewrite and a
    stranded ``._old-*`` superseded copy — the two states the swap
    scheme can orphan), runs the REAL row-targeted compaction, then
    runs ``operators/compact.py::vacuum_swap_dirs`` and returns the
    post-vacuum census: rows READ BACK from the live files, file count
    LISTED from disk, and the orphan count the sweep removed.  The
    oracle is q240's pure row law plus the planted-orphan constant, so
    the hash gate proves the sweep removed EXACTLY the unreferenced
    directories and the live data survived byte-for-byte in row terms
    — a VACUUM that deletes one live row (or misses one orphan)
    breaks the hash.

    Scale shape: q240's concurrent per-partition discipline (bounded
    thread pool over independent shuffle-free jobs); the vacuum walk
    is one parent-dir listing per partition — O(entries), no data
    read.  Retention semantics (leftovers younger than ``min_age_s``
    survive — the in-flight-rewrite guard) are law-tested in
    tests/test_r9_queries.py rather than gated here, since mtime is
    wall-clock."""
    import math as _math
    import urllib.parse as _urlparse
    from concurrent.futures import ThreadPoolExecutor

    from multi_threaded_mapreduce_framework_spark.operators.compact import (
        _parquet_files,
        compact_parquet_dir_rows,
        vacuum_swap_dirs,
    )

    key = (spark.sparkContext.applicationId, sf_dir, "vacuum")
    cached = _VAC_CACHE.get(key)
    if cached is not None:
        return cached
    base = os.path.join(
        tempfile.gettempdir(),
        "mtmrf_layout",
        layout_tag(spark, sf_dir),
        "vacuum_census",
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    ev.repartition(_OPT_SMALL_FILES).write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(base)

    def _one(d: str) -> tuple:
        part_dir = os.path.join(base, d)
        et = _urlparse.unquote(d.split("=", 1)[1])
        # plant the two orphan states a crashed swap leaves behind
        for suffix in ("_compact-fakecrash", "_old-fakecrash"):
            orphan = f"{part_dir}.{suffix}"
            os.makedirs(orphan, exist_ok=True)
            with open(os.path.join(orphan, "part-junk.parquet"), "wb") as f:
                f.write(b"PAR1 half-written rewrite leftovers")
        n = spark.read.parquet(part_dir).count()
        target = _math.ceil(n / _OPT_FILES_PER_PART)
        planned = _math.ceil(n / target)
        if len(_parquet_files(part_dir)) < planned:
            raise RuntimeError(
                f"small-file layout under {part_dir} has fewer files than "
                f"the plan ({planned}) — cannot compact upward"
            )
        compact_parquet_dir_rows(spark, part_dir, target_rows=target)
        removed = vacuum_swap_dirs(part_dir, min_age_s=0.0)
        n_after = spark.read.parquet(part_dir).count()
        files_after = len(_parquet_files(part_dir))
        return (et, int(n_after), int(files_after), int(removed))

    parts = sorted(
        d for d in os.listdir(base) if d.startswith("event_type=")
    )
    with ThreadPoolExecutor(max_workers=min(8, max(1, len(parts)))) as pool:
        rows_out = list(pool.map(_one, parts))
    cached = spark.createDataFrame(
        rows_out,
        "event_type string, n_rows bigint, files_after bigint,"
        " orphans_removed bigint",
    ).localCheckpoint()
    _VAC_CACHE[key] = cached
    return cached


# ------------------------------------------------------------------ q251
_TRIM_ITERS = 3
_SCRIPT_SQL = f"""
BEGIN
  DECLARE m BIGINT DEFAULT 0;
  DECLARE lo BIGINT DEFAULT 0;
  DECLARE hi BIGINT DEFAULT 9223372036854775807;
  DECLARE i INT DEFAULT 0;
  WHILE i < {_TRIM_ITERS} DO
    SET m = (SELECT CAST(sum(n_chars) div count(*) AS BIGINT)
             FROM documents WHERE n_chars BETWEEN lo AND hi);
    SET lo = m div 2;
    SET hi = m * 2;
    SET i = i + 1;
  END WHILE;
  SELECT lang,
         CAST(sum(CASE WHEN n_chars BETWEEN lo AND hi THEN 1 ELSE 0 END)
              AS BIGINT) AS n_in,
         CAST(sum(CASE WHEN n_chars < lo THEN 1 ELSE 0 END)
              AS BIGINT) AS n_below,
         CAST(sum(CASE WHEN n_chars > hi THEN 1 ELSE 0 END)
              AS BIGINT) AS n_above,
         m AS m_final
  FROM documents GROUP BY lang;
END
"""


@register(
    "q251_sql_scripting_trimmed_census",
    tier="T2",
    oracle="""
WITH m0 AS (SELECT CAST(sum(n_chars) // count(*) AS BIGINT) AS m
            FROM documents),
m1 AS (SELECT CAST(sum(n_chars) // count(*) AS BIGINT) AS m
       FROM documents, m0 WHERE n_chars BETWEEN m0.m // 2 AND 2 * m0.m),
m2 AS (SELECT CAST(sum(n_chars) // count(*) AS BIGINT) AS m
       FROM documents, m1 WHERE n_chars BETWEEN m1.m // 2 AND 2 * m1.m)
SELECT lang,
       CAST(sum(CASE WHEN n_chars BETWEEN m2.m // 2 AND 2 * m2.m
                THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
       CAST(sum(CASE WHEN n_chars < m2.m // 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below,
       CAST(sum(CASE WHEN n_chars > 2 * m2.m THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above,
       CAST(m2.m AS BIGINT) AS m_final
FROM documents, m2 GROUP BY lang, m2.m
""",
)
def q251_sql_scripting_trimmed_census(spark, sf_dir):
    """Spark 4 SQL SCRIPTING (SPARK-48338, `BEGIN ... END` with
    DECLARE / WHILE / scalar-subquery SET) driving a REAL iterative
    statistic — q241's frontend-equivalence discipline applied to the
    scripting surface (r8 verdict item 9's second named option): an
    iteratively re-trimmed integer mean of doc length (3 rounds of
    "recompute the mean inside [m/2, 2m] of the previous mean" — the
    classic outlier-resistant estimator loop a curation team runs
    before fixing length gates), then a per-language census of docs
    inside/below/above the final window.  The DuckDB oracle UNROLLS
    the loop as nested scalar CTEs, so a hash match proves the
    scripting engine's control flow (variable state across
    iterations, subquery assignment, loop exit) computes exactly the
    declared fixed point — a new frontend, not a new evaluator.

    All-integer law (integer div at every step) — hash-exact with no
    rounding convention needed.  Plan: each loop iteration is ONE
    scan-side aggregate with the window pushed into the scan filter
    (3 tiny jobs), and the final census is one partial-agg pass;
    scripting saves the N driver round-trips a client-side loop would
    make.  Law caveat (docstring-declared): the loop is well-defined
    while every window keeps at least one doc — true whenever any doc
    lies within 2x of the running mean, which every real corpus (and
    the fixture law) satisfies."""
    from multi_threaded_mapreduce_framework_spark.sources import register_views

    spark.conf.set("spark.sql.scripting.enabled", "true")
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_SCRIPT_SQL)
