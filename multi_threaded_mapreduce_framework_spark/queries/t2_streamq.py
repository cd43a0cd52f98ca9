"""Streaming-backed declared queries: the batch oracle gate applied to
state produced BY A REAL STREAM.

Every other declared query computes its answer from the fixtures in one
batch job; the queries here first run a Structured Streaming pipeline
over a wire-format replay of the same fixture (micro-batches, restarts,
replays — the production ingest path from streaming/), then return the
state READBACK as the query result.  The oracle is the corresponding
batch SQL, so the driver's hash gate proves stream-maintained state ==
batch answer — the invariant the whole streaming tier exists to keep.

Reference note: the reference engine (MapReduceFramework.cpp:1-377) is
batch-only; this tier is part of the beyond-reference streaming surface
(SURVEY §2.2) promoted to the oracle-declared inventory per the r5
verdict (item 7).
"""

from __future__ import annotations

import os
import tempfile

from multi_threaded_mapreduce_framework_spark.queries.registry import register
from multi_threaded_mapreduce_framework_spark.sources import layout_tag

# (applicationId, sf_dir) -> state_dir whose stream already ran this
# session.  Same cache discipline as t2_cluster._PAIR_CACHE: the
# application id key cannot resurrect state from a dead context, and a
# re-run within one session reuses its own completed stream run.
_MATVIEW_STATE_CACHE: dict = {}


@register(
    "q186_bitmap_matview_readback",
    tier="T2",
    oracle="""
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events WHERE user_id IS NOT NULL
GROUP BY event_type
""",
)
def q186_bitmap_matview_readback(spark, sf_dir):
    """Exact distinct users per event type, maintained by a STATELESS
    STREAM over the Kafka wire replay of the events fixture and read
    back from the bitmap-word matview — the q153 answer (same oracle
    SQL), produced by streaming/matview.py instead of a batch scan.

    Pipeline under the readback: events -> Kafka wire bytes (JSON
    payload, epoch-micros) -> file-per-trigger readStream -> from_json
    parse -> per-micro-batch 64-bit bitmap-word partials written to
    ``batch_id=N`` dirs (OR-idempotent: replays cannot change the
    view) -> ``compact_bitmap_matview`` folds them into a versioned
    base snapshot behind the atomic ``_BASE`` pointer -> the readback
    OR-merges words and sums bit_counts.

    Scale shape: the stream itself is stateless (no state store, no
    watermark) — executor memory is bounded by one micro-batch, state
    on disk is keys x (ids/64) x 8 bytes of mergeable words, and the
    readback is one partial-aggregating merge.  The batch-dir layer
    partials re-aggregate exactly, so daily state folds into monthly
    state without re-reading raw events — the q153/q163 rollup law,
    here proven against state a real stream produced.
    """
    from multi_threaded_mapreduce_framework_spark.streaming import (
        kafka_wire_stream,
        parse_events,
        write_kafka_replay,
    )
    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        compact_bitmap_matview,
        read_bitmap_matview,
        start_bitmap_matview,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    state_dir = _MATVIEW_STATE_CACHE.get(key)
    if state_dir is None:
        base = os.path.join(
            tempfile.gettempdir(),
            "mtmrf_layout",
            layout_tag(spark, sf_dir),
            "bitmap_matview",
        )
        wire = os.path.join(base, "wire")
        state_dir = os.path.join(base, "state")
        ckpt = os.path.join(base, "ckpt")
        write_kafka_replay(spark, sf_dir, wire, n_chunks=3)
        q = start_bitmap_matview(
            parse_events(kafka_wire_stream(spark, wire)),
            ["event_type"],
            "user_id",
            state_dir,
            ckpt,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # fold the per-batch word partials into a base snapshot: the
        # readback below exercises the compacted path; pre-compaction
        # multi-batch merge equality is pinned in tests/test_matview.py
        compact_bitmap_matview(spark, state_dir, ["event_type"])
        _MATVIEW_STATE_CACHE[key] = state_dir
    return read_bitmap_matview(spark, state_dir, ["event_type"]).withColumnRenamed(
        "distinct_ids", "distinct_users"
    )
