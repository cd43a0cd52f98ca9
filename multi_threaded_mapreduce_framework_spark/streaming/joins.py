"""Stream-stream joins (SURVEY.md §2.4): correlating two unbounded
event streams with bounded state.

The reference's model joins nothing — but two MapReduce jobs whose
outputs meet on a key is the batch ancestor of this operator. In
Structured Streaming a stream-stream join buffers both sides in the
state store; the *event-time range condition* plus per-side watermarks
are what let Spark evict state (a row can be dropped once the other
side's watermark passes its join window). Without the time bound the
state grows without limit — that is the difference between a demo and
an operator that survives an unbounded 100 TB/day stream.

Semantics verified batch-vs-stream in ``tests/test_streaming_joins.py``:
the converged streaming answer equals the same join run as a batch
DataFrame query on the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _sides(left: DataFrame, right: DataFrame, watermark: str):
    l = left.withWatermark("ts", watermark).select(
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
    )
    return l, r


def _range_cond(max_lag: str):
    return (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"interval {max_lag}"))
    )


def stream_stream_inner_join(
    left: DataFrame,
    right: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join two event streams on user_id where the right event
    lands within ``[l_ts, l_ts + max_lag]`` — "purchase within an hour
    of the click". Matches are emitted as soon as both rows arrive;
    each side's buffered state is evicted once the opposite watermark
    clears its join window (watermark + range bound = bounded state).
    """
    l, r = _sides(left, right, watermark)
    return l.join(r, _range_cond(max_lag), "inner")


def stream_stream_left_join(
    left: DataFrame,
    right: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Left-outer variant: a left event with no match emits its
    null-padded row only after the watermark passes ``l_ts + max_lag``
    (until then a match could still arrive). Converging a replay to the
    exact batch answer therefore needs the watermark advanced past the
    last real event — the test appends a far-future sentinel row to
    both streams to flush the tail, which is how a production pipeline
    drains a historical backfill too.
    """
    l, r = _sides(left, right, watermark)
    return l.join(r, _range_cond(max_lag), "left_outer")


def stream_stream_full_join(
    left: DataFrame,
    right: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Full-outer variant: unmatched rows from BOTH sides emit
    null-padded once the watermark clears their join window — left
    rows after ``l_ts + max_lag``, right rows after their own ``r_ts``
    (a right event can only match earlier-or-equal left events). Same
    drain caveat as the left join for historical replays.
    """
    l, r = _sides(left, right, watermark)
    return l.join(r, _range_cond(max_lag), "full_outer")


def stream_stream_semi_join(
    left: DataFrame,
    right: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Left-SEMI variant — "which left events converted at all": each
    left event is emitted AT MOST ONCE (its own columns only, no right
    payload), as soon as its FIRST match arrives; unmatched left rows
    are silently dropped when the watermark clears their join window.
    Emission is eager like the inner join (no drain sentinel needed to
    converge a bounded replay) while the output volume is bounded by
    the LEFT stream, not the pair count — the shape of a 100 TB/day
    "converted clicks" feed where a hot user's N×M pair explosion
    (the inner join's output) is never materialized.
    """
    l, r = _sides(left, right, watermark)
    return l.join(r, _range_cond(max_lag), "left_semi")


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    cond,
    how: str = "left_outer",
) -> DataFrame:
    """STREAM-STATIC join — the stateless enrichment pattern (event
    stream decorated with a slowly-changing dimension table): unlike
    the stream-stream forms above this buffers NO state, because the
    static side is fully known every micro-batch — each batch plans an
    ordinary batch join against the dimension, and in a LEFT join the
    unmatched stream rows emit their null-padded form IMMEDIATELY (no
    watermark gate; contrast ``stream_stream_left_join``, where a null
    flush must wait for the watermark to prove no match can arrive).

    The dimension is broadcast-hinted: at 100 TB/day the stream side
    never shuffles for this join — every executor holds the dim copy
    and the enrichment rides the scan tasks.  Spark re-resolves the
    static relation's FILES each micro-batch, which is what makes the
    slowly-changing-dimension refresh pattern work without restarting
    the query (a swapped-in dim snapshot is picked up on the next
    trigger).
    """
    return stream.join(F.broadcast(dim), cond, how)


def funnel_daily_counts(
    left: DataFrame,
    right: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Chained stateful operators: the stream-stream inner join feeds a
    1-day tumbling-window aggregate — the streaming form of the q105
    funnel (clicks that converted, counted per click-day). Spark allows
    stateful-after-stateful in append mode because the join emits rows
    with an event-time column (l_ts) still governed by the watermark;
    the downstream window finalizes once the watermark passes the day
    boundary plus the join's lag allowance.
    """
    joined = stream_stream_inner_join(left, right, max_lag, watermark)
    return (
        joined.groupBy(F.window("l_ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_converted_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "n_converted_events",
        )
    )
