"""Tier T2 — Spark 4 engine-surface tier (q198-q202).

Five engine surfaces that exist in Spark 4.x and were not yet
oracle-declared anywhere in the registry, each expressed as a
hash-gated query over the shared fixtures:

- q198: ``DataFrame.unpivot`` (wide->long reshaping; the SQL UNPIVOT /
  pandas melt relational primitive),
- q199: batch ``session_window`` aggregation (the NATIVE session
  operator next to q23's manual gaps-and-islands and the streaming
  form in streaming/windowed.py),
- q200: ``WITH RECURSIVE`` — iteration pushed INTO Catalyst's
  UnionLoop operator, on the exact forest law q175 resolves by
  hand-rolled pointer jumping (three independent evaluations of one
  law: recursive CTE in Spark, pointer jumping in Spark, recursive
  CTE in DuckDB),
- q201: the VARIANT type (``parse_json`` -> ``variant_get``): the
  open-schema semi-structured column that survives shuffles as a
  typed binary value instead of a string,
- q202: native XML (``to_xml`` / ``from_xml``) proven LOSSLESS by
  round-tripping typed rows through XML text inside the scan stage
  and hash-matching the census of the PARSED values against an
  oracle that never sees XML at all.

Reference note: all beyond-reference capabilities (the reference
engine, MapReduceFramework.cpp:1-377, is a single-shape
map/sort/shuffle/reduce library); declared per the builder brief's
coverage rubric with the registry's oracle conventions (FIXTURES.md):
integer micro-units across engine boundaries, deterministic tiebreaks,
aliases identical in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.queries.t2_cluster import _PJ_PARENT_SQL
from multi_threaded_mapreduce_framework_spark.queries.t2_text import SESSION_GAP_US
from multi_threaded_mapreduce_framework_spark.sources import load_table


# ------------------------------------------------------------------ q198
@register(
    "q198_unpivot_doc_metrics",
    tier="T2",
    oracle="""
WITH w AS (
  SELECT lang,
         CAST(count(*) AS BIGINT)                 AS n_docs,
         CAST(sum(n_chars) AS BIGINT)             AS sum_chars,
         CAST(count(DISTINCT source) AS BIGINT)   AS n_sources,
         CAST(max(n_chars) AS BIGINT)             AS max_chars
  FROM documents GROUP BY lang)
SELECT lang, 'n_docs'    AS metric, n_docs    AS value FROM w
UNION ALL SELECT lang, 'sum_chars', sum_chars FROM w
UNION ALL SELECT lang, 'n_sources', n_sources FROM w
UNION ALL SELECT lang, 'max_chars', max_chars FROM w
""",
)
def q198_unpivot_doc_metrics(spark, sf_dir):
    """Wide->long reshaping via the native ``DataFrame.unpivot``
    operator (SQL UNPIVOT / pandas melt): a per-language documents
    metrics table with four measure columns becomes (lang, metric,
    value) rows — the canonical shape for metric stores, sparklines,
    and schema-stable exports whose measure set grows over time.

    Engine shape: unpivot is the Catalyst ``Expand`` operator — each
    input row is replicated once per measure INSIDE the scan/agg
    stage, never a join or an N-pass union over the table (the
    UNION-ALL formulation the oracle uses would scan the aggregate N
    times; Expand touches it once).  All measures are cast to one
    bigint value column so the long rows hash identically in both
    engines.

    Scale shape: the expansion happens AFTER the 5-key per-lang
    aggregate, so the Expand multiplies 5 rows x 4 metrics, not the
    corpus; on a 100 TB corpus the plan is one partial-agg shuffle
    plus an O(langs x metrics) reshape."""
    d = load_table(spark, sf_dir, "documents")
    wide = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    return wide.unpivot(
        ["lang"],
        ["n_docs", "sum_chars", "n_sources", "max_chars"],
        "metric",
        "value",
    )


# ------------------------------------------------------------------ q199
# The per-user session census law (gaps-and-islands, STRICTLY-greater
# gap break, duration = last - first + gap).  Named so q269 (the
# STREAMING session_window row, t2_streamq.py) can share it VERBATIM —
# one law, two engine paths (batch merging aggregate vs stateful
# streaming with watermark finalization).
SESSION_CENSUS_SQL = f"""
WITH x AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events),
y AS (
  SELECT user_id, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS st
  FROM x),
z AS (
  SELECT user_id, us,
         sum(st) OVER (PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM y),
s AS (
  SELECT user_id, sid, count(*) AS n_ev,
         max(us) - min(us) + {SESSION_GAP_US} AS dur_us
  FROM z GROUP BY user_id, sid)
SELECT user_id,
       CAST(count(*) AS BIGINT)   AS n_sessions,
       CAST(sum(n_ev) AS BIGINT)  AS n_events,
       CAST(sum(dur_us) AS BIGINT) AS sum_dur_us,
       CAST(max(n_ev) AS BIGINT)  AS max_session_events
FROM s GROUP BY user_id
"""


@register(
    "q199_session_window_native",
    tier="T2",
    oracle=SESSION_CENSUS_SQL,
)
def q199_session_window_native(spark, sf_dir):
    """Per-user session census via the NATIVE batch ``session_window``
    aggregation — Spark's built-in merging-interval operator — rather
    than q23's hand-rolled lag/gaps-and-islands: session count, event
    count, summed session duration, and the largest session per user.

    Law parity (verified empirically, pinned by the oracle): Spark
    merges an event exactly ``gap`` after the previous one into the
    same session (windows [t, t+g) and [t+g, ...) are coalesced), i.e.
    a NEW session starts only when the gap is STRICTLY greater — the
    identical ``> gap`` law q23 declares — and a session's window end
    is last_event + gap, so duration = (last - first) + gap.

    Engine shape: ONE shuffle on user_id feeds the session-merging
    aggregate (Spark sorts each user's events and coalesces
    intervals map-side per group); the per-user census folds the
    already-merged sessions with a second partial agg on the same
    key, so no second exchange.  Integer microsecond durations keep
    the census hash-exact vs the islands oracle.

    Scale shape: this is the operator the streaming sessionization
    (streaming/windowed.py, q190's timer variant) shares state logic
    with; in batch it needs no window over the raw corpus — state is
    per (user, open-interval run), so a 100 TB event log shards by
    user and merges locally."""
    ev = load_table(spark, sf_dir, "events")
    gap = f"{SESSION_GAP_US // 1_000_000} seconds"
    per_session = (
        ev.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ev"))
        .select(
            "user_id",
            "n_ev",
            (
                F.unix_micros(F.col("sw.end")) - F.unix_micros(F.col("sw.start"))
            ).alias("dur_us"),
        )
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_ev").cast("bigint").alias("n_events"),
        F.sum("dur_us").cast("bigint").alias("sum_dur_us"),
        F.max("n_ev").cast("bigint").alias("max_session_events"),
    )


# ------------------------------------------------------------------ q200
_Q200_WALK = f"""
WITH RECURSIVE p AS (
  SELECT c_custkey AS c, CAST({_PJ_PARENT_SQL} AS BIGINT) AS parent
  FROM customer WHERE c_custkey >= 2
),
walk AS (
  SELECT c, parent AS anc, CAST(1 AS BIGINT) AS d FROM p
  UNION ALL
  SELECT w.c, p.parent, w.d + 1
  FROM walk w JOIN p ON w.anc = p.c
),
depths AS (
  SELECT c AS custkey, d AS depth FROM walk WHERE anc = 1
  UNION ALL
  SELECT c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey <= 1
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(custkey) AS BIGINT) AS sum_custkey
FROM depths GROUP BY depth
"""


@register(
    "q200_recursive_cte_depths",
    tier="T2",
    oracle=_Q200_WALK,
)
def q200_recursive_cte_depths(spark, sf_dir):
    """Tree-depth census via ``WITH RECURSIVE`` — iteration pushed
    INTO the engine (Catalyst's UnionLoop operator plans the
    fixed-point itself) instead of q175's hand-rolled pointer-jumping
    driver loop, over the exact same deterministic parent forest
    (parent(c) = 1 + ((61c+17) mod (c-1)), strictly decreasing so
    every chain terminates at root 1; t2_cluster._PJ_PARENT_SQL).

    One law, three independent evaluations: this recursive CTE in
    Spark, q175's log-rounds pointer jumping in Spark, and the
    oracle's recursive CTE in DuckDB — the Spark SQL text IS the
    oracle text, so a hash match here proves Spark's recursion
    semantics (UNION ALL accumulation, per-step join) agree with the
    reference SQL engine bit-for-bit on bigint arithmetic.

    Engine/scale shape: each recursion step is ONE equi join of the
    frontier against the (broadcastable) parent relation keyed on the
    ancestor pointer — O(depth) steps of narrow 3-column rows, depth
    ~ ln n for this random-decreasing forest (~15 at 10^6 keys, under
    the default recursion limit of 100).  Chain-walking costs
    O(total path length) vs pointer jumping's O(n log depth) state
    rewrites — the CTE wins when depth is small and the engine plans
    the loop; q175 wins on deep chains.  The final census folds the
    per-node depths with one partial agg."""
    from multi_threaded_mapreduce_framework_spark.sources import register_views

    register_views(spark, sf_dir, tables=("customer",))
    return spark.sql(_Q200_WALK)


# ------------------------------------------------------------------ q201
@register(
    "q201_variant_payload",
    tier="T2",
    oracle="""
SELECT event_type,
       CAST(props ->> '$.k' AS BIGINT) // 25 AS k_bucket,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(count(DISTINCT CAST(props ->> '$.k' AS BIGINT)) AS BIGINT)
         AS n_distinct_k
FROM events
GROUP BY event_type, k_bucket
""",
)
def q201_variant_payload(spark, sf_dir):
    """Open-schema payload analytics through the VARIANT type:
    ``parse_json`` turns events.props into a typed binary variant
    ONCE, ``variant_get`` extracts a bigint path, and the extracted
    key both buckets the aggregation and feeds its measures — the
    Spark 4 shape for semi-structured columns, where the JSON text is
    parsed a single time and every downstream access is a typed path
    read instead of a per-access string re-parse
    (q22_json_extract is the legacy ``get_json_object`` counterpart).

    Engine shape: parse_json + both variant_get calls all live in the
    scan-stage projection; the shuffle carries only (event_type,
    k_bucket, k) narrow rows — the variant binary itself never crosses
    an exchange here, and the census is one partial agg.

    Scale shape: at 100 TB the parse-once property is the difference
    between O(accesses) and O(1) JSON scans per row; bucketed grouping
    (k div 25) keeps the output domain bounded regardless of the key
    cardinality underneath.

    Declared domain (r10 advisor): the bucketing law assumes k >= 0 —
    Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors,
    so the two sides diverge on negative k (-3 div 25 = 0 vs
    -3 // 25 = -1).  Every fixture pins props.k to 0..99; a signed-key
    deployment must bucket with an explicit floor on both sides."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.expr("k div 25").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )


# ------------------------------------------------------------------ q202
@register(
    "q202_xml_roundtrip_census",
    tier="T2",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS sum_id,
       CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
            AS BIGINT) AS sum_value_micro
FROM events GROUP BY event_type
""",
)
def q202_xml_roundtrip_census(spark, sf_dir):
    """Native XML functions proven LOSSLESS: every event row is
    serialized to an XML document with ``to_xml``, parsed back with
    ``from_xml``, and the census aggregates ONLY the parsed-back
    values — while the oracle aggregates the original columns and
    never sees XML.  A hash match therefore proves the
    serialize->parse cycle preserved every event_id, event_type, and
    micro-unit value exactly (the corpus-interchange guarantee an
    XML export/import path must give before it touches 100 TB).

    Engine shape: to_xml and from_xml are both expression-level
    (in-row, inside the scan stage's projection) — no UDF, no second
    pass; the double is moved as integer micros THROUGH the XML text
    so engine float-printing can never make roundtrip lossy-looking.

    Scale shape: one scan, one partial-agg exchange on the 5-key
    event_type domain; serialization cost is per-row CPU that shards
    with the scan."""
    ev = load_table(spark, sf_dir, "events")
    xml = F.expr(
        "to_xml(named_struct("
        "'event_id', event_id, "
        "'event_type', event_type, "
        "'value_micro', CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)))"
    )
    parsed = F.from_xml(
        xml, "event_id BIGINT, event_type STRING, value_micro BIGINT"
    )
    return (
        ev.select(parsed.alias("p"))
        .groupBy(F.col("p.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("p.event_id").cast("bigint").alias("sum_id"),
            F.sum("p.value_micro").cast("bigint").alias("sum_value_micro"),
        )
    )


# ------------------------------------------------------------------ q270
# (applicationId, sf_dir) -> census readback; the shredded write ran once
_SHRED_CACHE: dict = {}


@register(
    "q270_variant_shredded_write_census",
    tier="T2",
    oracle="""
SELECT event_type,
       CAST(props ->> '$.k' AS BIGINT) // 25 AS k_bucket,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS sum_id,
       CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(count(DISTINCT CAST(props ->> '$.k' AS BIGINT)) AS BIGINT)
         AS n_distinct_k
FROM events
GROUP BY event_type, k_bucket
""",
)
def q270_variant_shredded_write_census(spark, sf_dir):
    """VARIANT SHREDDING through the STORAGE layer, under the hash gate
    (the r9 verdict's sanctioned write-census class): events.props is
    parsed ONCE to a typed variant, WRITTEN to parquet with Spark 4's
    variant write-shredding enabled (``spark.sql.variant.
    writeShredding.enabled`` + ``inferShreddingSchema`` — the writer
    samples the data, infers a typed shredding schema, and stores each
    object field as its own parquet column group ``typed_value.k``/
    ``typed_value.s`` alongside the residual binary, per the parquet
    VARIANT spec), then read BACK through the shredded-variant reader
    and censused via ``variant_get`` paths.  q201 gates the in-memory
    expression path; THIS row gates the on-disk round trip: shredding
    inference, the typed-column writer, and read-side reassembly must
    compose to exactly the JSON law DuckDB computes from the original
    strings — one mis-shredded or mis-reassembled field anywhere
    breaks counts, sums, or the distinct census.  ``sum_id`` binds the
    non-variant column through the same files.

    The law test additionally reads the written file's PHYSICAL
    parquet footer (parquet-java) and asserts the ``typed_value``
    shredded group is really there — the gate cannot silently pass on
    an unshredded write.

    Scale shape: shredding is THE variant scan story at 100 TB —
    typed subcolumns give columnar encodings, stats, and (with
    ``pushVariantIntoScan``) pruned reads for path accesses, vs
    re-decoding a binary blob per row; the write is one pass, the
    census one partial agg over (event_type, k div 25) — q201's
    bounded output domain, under q201's declared k >= 0 domain
    (Spark ``div`` truncates, DuckDB ``//`` floors — they agree only
    on nonnegative k; fixtures pin props.k to 0..99)."""
    key = (spark.sparkContext.applicationId, sf_dir, "variant_shred")
    cached = _SHRED_CACHE.get(key)
    if cached is None:
        import os
        import tempfile

        from multi_threaded_mapreduce_framework_spark.sources import layout_tag

        out = os.path.join(
            tempfile.gettempdir(),
            "mtmrf_layout",
            layout_tag(spark, sf_dir),
            "variant_shred",
            "events",
        )
        ev = load_table(spark, sf_dir, "events").selectExpr(
            "event_id", "event_type", "parse_json(props) AS v"
        )
        prev = {
            c: spark.conf.get(c, None)
            for c in (
                "spark.sql.variant.writeShredding.enabled",
                "spark.sql.variant.inferShreddingSchema",
            )
        }
        try:
            spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
            spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
            ev.write.mode("overwrite").parquet(out)
        finally:
            for c, val in prev.items():
                if val is None:
                    spark.conf.unset(c)
                else:
                    spark.conf.set(c, val)
        back = spark.read.parquet(out)
        cached = (
            back.select(
                "event_id",
                "event_type",
                F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
            )
            .groupBy("event_type", F.expr("k div 25").alias("k_bucket"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum("event_id").cast("bigint").alias("sum_id"),
                F.sum("k").cast("bigint").alias("sum_k"),
                F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
            )
            .localCheckpoint()
        )
        _SHRED_CACHE[key] = cached
    return cached


# ------------------------------------------------------------------ q272
@register(
    "q272_collation_census",
    tier="T2",
    oracle="""
WITH src AS (SELECT CASE WHEN doc_id % 2 = 1 THEN upper(lang)
                         ELSE lang END AS lang_m,
                    doc_id
             FROM documents)
SELECT lower(lang_m) AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS upper_docs,
       CAST(sum(CASE WHEN lower(lang_m) = 'en' THEN 1 ELSE 0 END)
         AS BIGINT) AS en_matches
FROM src GROUP BY lower(lang_m)
""",
)
def q272_collation_census(spark, sf_dir):
    """String COLLATIONS (Spark 4's collation-aware comparison/
    grouping — the last headline Spark-4 SQL surface not yet
    oracle-declared; completes the t2_spark4 band: unpivot q198,
    session_window q199, recursive CTE q200, VARIANT q201/q270, XML
    q202, pipe syntax q241, SQL scripting q251): the corpus's lang
    column is deterministically case-MIXED in-query (odd doc_id ->
    ``upper(lang)``), declared ``COLLATE UTF8_LCASE``, and then
    GROUPED and COMPARED under the collation — mixed-case variants
    must land in one group, and the literal predicate
    ``lang_ci = 'EN'`` must match lower-case 'en' rows through
    collation-aware equality, not through any explicit fold.
    ``upper_docs`` proves the merged groups really contain both case
    families; the output key is ``lower(lang_ci)`` so the emitted
    row set is deterministic regardless of which variant the
    aggregate surfaces.

    Oracle law: UTF8_LCASE equality coincides with ``lower()``
    normalization on this ASCII lang domain, so DuckDB replays the
    census with an explicit case fold — one law, collation-aware
    engine path vs explicit-fold oracle path.

    Plan note (the honest cost of collations, visible in the plan
    snapshot): non-binary-collated group keys are NOT hash-aggregable
    in Spark 4.1 — the census plans as a partial/final SortAggregate
    pair sharing ONE hash exchange on the collated key (collation key
    hashing keeps partitioning correct; within-partition grouping
    sorts).  Still one shuffle of |lang| partial rows per partition —
    the scale shape is unchanged, the per-partition sort replaces the
    hash table.  At 100 TB the guidance this row pins: collate the
    COMPARISON columns, keep high-cardinality group keys binary."""
    from multi_threaded_mapreduce_framework_spark.sources import table_path

    path = table_path(sf_dir, "documents")
    return spark.sql(
        f"""
WITH src AS (
  SELECT CASE WHEN doc_id % 2 = 1 THEN upper(lang) ELSE lang END
           COLLATE UTF8_LCASE AS lang_ci,
         doc_id
  FROM parquet.`{path}`)
SELECT lower(lang_ci) AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS upper_docs,
       CAST(sum(CASE WHEN lang_ci = 'EN' THEN 1 ELSE 0 END) AS BIGINT)
         AS en_matches
FROM src GROUP BY lang_ci
"""
    )
