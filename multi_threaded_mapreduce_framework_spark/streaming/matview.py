"""Stateless streaming materialized view: algebraic partial-aggregate
maintenance with NO Spark state store.

The standard streaming aggregate (``groupBy().agg()`` in update mode)
keeps every group's running value in the state store — at billions of
keys the state store IS the job's memory bill and restore time.  This
module is the q144 pattern wired to a stream: each micro-batch writes
only its OWN partial aggregates (count + exact integer micro-unit sum
per key) to ``batch_id=N/``; the current view is reconstructed by
re-aggregating the partials at READ time.  The stream stays fully
stateless (append mode, no watermark, no state store), which means:

- executor memory is bounded by one micro-batch, never by key count;
- a replayed batch (same ``batch_id``) overwrites its own directory —
  idempotent, so delivery is exactly-once on top of the checkpoint's
  at-least-once (same discipline as ``streaming/sinks.py``);
- reads cost one merge over #batches x #keys-per-batch rows, which is
  why :func:`compact_matview` periodically folds everything into a
  versioned ``base-N/`` snapshot carrying a ``_watermark`` marker;
  batch dirs at or below the watermark are ignored by readers (so a
  pathological replay of an already-compacted batch cannot double
  count).

Reader-vs-ingest atomicity: readers (and the compactor) include only
COMMITTED batch dirs — ones carrying Spark's ``_SUCCESS`` marker — so
a batch being written concurrently (or re-written by a replay) is
never torn-read; it enters the view atomically at commit.  The
compactor additionally PINS its fold set before reading, so a batch
committing mid-compaction stays out of both the snapshot and the
watermark and is counted exactly once afterward.

Reader-vs-compactor atomicity: the current snapshot is named by a
``_BASE`` pointer file swapped with ``os.replace`` (atomic on POSIX).
A reader therefore always resolves to a COMPLETE snapshot — never a
half-renamed directory, never "no base => watermark -1" mid-swap.
Garbage collection is deferred one compaction: the previous base dir
and the batch dirs folded by the PREVIOUS compaction are removed only
by the NEXT one, so a reader holding the old pointer (or an old dir
listing) still finds every file it needs.  The remaining exposure —
a reader stalled across TWO full compactions — fails loudly on a
missing path; it cannot silently undercount.  One compactor at a time
is assumed (compaction is a maintenance action, not a data-path one).

Works because count/sum are ALGEBRAIC (mergeable): merged partials ==
one-pass aggregate, bit-exact thanks to integer micro-units.  avg is
derived at read; non-mergeable aggregates need sketches instead.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

_MICRO = "cast(cast(value as decimal(18,6)) * 1000000 as bigint)"
_WM = "_watermark"


def _partials(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.expr(_MICRO)).cast("bigint").alias("sum_micro"),
    )


def start_incremental_matview(
    stream_df: DataFrame,
    keys: list[str],
    state_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain a (cnt, sum_micro)-per-key view of ``stream_df``
    (needs a ``value`` column) under ``state_dir``.  Stateless: the
    stream itself carries no aggregation."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _partials(batch_df, keys).write.mode("overwrite").parquet(
            f"{state_dir}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )


_PTR = "_BASE"


def _base_dir(state_dir: str) -> str | None:
    """Resolve the current base snapshot directory via the ``_BASE``
    pointer file; fall back to the legacy unversioned ``base/`` (state
    written before the pointer discipline)."""
    ptr = os.path.join(state_dir, _PTR)
    if os.path.exists(ptr):
        with open(ptr) as f:
            name = f.read().strip()
        path = os.path.join(state_dir, name)
        if os.path.isdir(path):
            return path
    legacy = os.path.join(state_dir, "base")
    return legacy if os.path.isdir(legacy) else None


def _watermark_of(base: str | None) -> int:
    """Watermark recorded INSIDE an already-resolved base snapshot.

    Readers must resolve the ``_BASE`` pointer exactly once and derive
    the watermark from that same snapshot: calling ``_base_dir`` twice
    around a concurrent compaction could pair the OLD watermark with the
    NEW base, letting the deferred-GC-retained batch dirs in
    ``(wm_old, wm_new]`` pass the ``> wm`` filter and double count."""
    if base is not None:
        path = os.path.join(base, _WM)
        if os.path.exists(path):
            with open(path) as f:
                return int(f.read().strip())
    return -1


def _watermark(state_dir: str) -> int:
    return _watermark_of(_base_dir(state_dir))


def _committed_batch_ids(state_dir: str) -> list[int]:
    """Batch ids whose directory carries Spark's ``_SUCCESS`` commit
    marker.  Readers and the compactor must see only COMMITTED batches:
    a batch dir being written concurrently (foreachBatch ingest, or a
    replay overwrite) lists with partial part-files — including it
    would be a torn read (undercount or AnalysisException), exactly the
    class of bug the pointer-swap discipline exists to prevent on the
    snapshot side.  A replayed batch briefly loses its marker during
    its overwrite; skipping it until re-commit keeps every read a view
    over complete batches only."""
    out = []
    for d in os.listdir(state_dir):
        if d.startswith("batch_id=") and os.path.exists(
            os.path.join(state_dir, d, "_SUCCESS")
        ):
            out.append(int(d.split("=", 1)[1]))
    return out


def _publish_base(state_dir: str, tmp: str, wm_old: int, wm_new: int) -> None:
    """Atomically publish ``tmp`` (a complete snapshot dir already
    carrying its ``_watermark``) as the current base, then GC state
    made redundant by the PREVIOUS compaction.

    Order of operations is the whole point:

    1. rename tmp -> ``base-<wm_new>`` (invisible until the pointer
       names it; version = the watermark it folds, strictly monotonic);
    2. ``os.replace`` a fresh pointer file over ``_BASE`` — the single
       atomic instant at which readers switch snapshots;
    3. only THEN delete state a stale reader might still hold: base
       dirs OLDER than the one replaced in step 2, and batch dirs
       folded by the previous compaction (ids <= wm_old).  The
       immediately-previous base and the batch dirs folded JUST NOW —
       (wm_old, wm_new] — are retained until the next compaction: a
       reader that resolved the old pointer before step 2 still needs
       exactly that set, and post-swap readers ignore the retained
       batch dirs via the watermark, so retention is harmless.
    """
    prev_base = _base_dir(state_dir)
    prev_name = os.path.basename(prev_base) if prev_base else None
    new_base = os.path.join(state_dir, f"base-{wm_new}")
    os.rename(tmp, new_base)
    ptr_tmp = os.path.join(state_dir, f"._ptr-{uuid.uuid4().hex[:8]}")
    with open(ptr_tmp, "w") as f:
        f.write(f"base-{wm_new}")
    os.replace(ptr_tmp, os.path.join(state_dir, _PTR))
    tmp_name = os.path.basename(tmp)
    for d in os.listdir(state_dir):
        path = os.path.join(state_dir, d)
        is_base = d == "base" or d.startswith("base-")
        if is_base and d not in (f"base-{wm_new}", prev_name):
            shutil.rmtree(path, ignore_errors=True)
        elif d.startswith("batch_id=") and int(d.split("=", 1)[1]) <= wm_old:
            shutil.rmtree(path, ignore_errors=True)
        elif d.startswith("._base-") and d != tmp_name:
            # Orphaned snapshot tmp from a compaction that crashed
            # between write and publish: without this sweep it leaks
            # forever (nothing else matches the ._base- prefix).
            shutil.rmtree(path, ignore_errors=True)
        elif d.startswith("._ptr-"):
            # Orphaned pointer tmp (crash between write and replace).
            try:
                os.remove(path)
            except OSError:
                pass


def _merged_partials(spark, state_dir, keys, base, ids, cols):
    """Union of base snapshot + the EXPLICIT batch ids — the id set is
    pinned by the caller so a batch committing mid-operation cannot
    slip into the data but out of the recorded watermark (that tear
    would double count it after the compaction)."""
    parts = []
    if base is not None:
        parts.append(spark.read.parquet(base).select(*keys, *cols))
    if ids:
        dirs = [os.path.join(state_dir, f"batch_id={i}") for i in ids]
        parts.append(
            spark.read.option("basePath", state_dir)
            .parquet(*dirs)
            .select(*keys, *cols)
        )
    if not parts:
        raise FileNotFoundError(f"no matview state under {state_dir}")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def read_matview(spark, state_dir: str, keys: list[str]) -> DataFrame:
    """Current view = base snapshot + partials from COMMITTED batch
    dirs above the compaction watermark, re-aggregated.  Exact over
    committed batches at any moment."""
    base = _base_dir(state_dir)  # resolved ONCE; wm comes from this snapshot
    wm = _watermark_of(base)
    ids = [i for i in _committed_batch_ids(state_dir) if i > wm]
    u = _merged_partials(spark, state_dir, keys, base, ids, ["cnt", "sum_micro"])
    return (
        u.groupBy(*keys)
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("sum_micro").cast("bigint").alias("sum_micro"),
        )
        .withColumn("avg_micro", F.expr("sum_micro div cnt").cast("bigint"))
    )


def compact_matview(spark, state_dir: str, keys: list[str]) -> int:
    """Fold base + all batch partials into a fresh versioned base
    snapshot whose ``_watermark`` records the highest folded batch id,
    published with the atomic pointer swap + one-generation-deferred
    GC of :func:`_publish_base`.  Returns the new watermark (-1 if
    there was nothing to fold).

    The fold set is PINNED before reading: a batch that commits after
    the listing stays out of both the snapshot and the watermark, so
    it is counted exactly once by later reads."""
    base = _base_dir(state_dir)
    wm_old = _watermark_of(base)
    fold = [i for i in _committed_batch_ids(state_dir) if i > wm_old]
    if not fold:
        return wm_old
    wm_new = max(fold)
    snap = (
        _merged_partials(spark, state_dir, keys, base, fold, ["cnt", "sum_micro"])
        .groupBy(*keys)
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("sum_micro").cast("bigint").alias("sum_micro"),
        )
    )
    tmp = os.path.join(state_dir, f"._base-{uuid.uuid4().hex[:8]}")
    snap.coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _WM), "w") as f:
        f.write(str(wm_new))
    _publish_base(state_dir, tmp, wm_old, wm_new)
    return wm_new


# ---------------------------------------------------------------------------
# Bitmap-word distinct-count matview: the q153/q163 word layer maintained
# incrementally.  count(DISTINCT id) is NOT algebraic, so the partial-
# aggregate discipline above cannot express it — but the 64-bit bitmap
# word (wi = id >> 6, w = bit_or(1 << (id & 63))) IS: words OR-merge,
# and OR is additionally IDEMPOTENT, so a replayed or even double-
# counted batch cannot change the view (strictly stronger than the
# overwrite-idempotency the cnt/sum view relies on).  State per batch
# dir is keys x (ids/64) x 8 bytes; the state store stays empty.

def start_bitmap_matview(
    stream_df: DataFrame,
    keys: list[str],
    id_col: str,
    state_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain an exact distinct-``id_col``-per-key view of
    ``stream_df`` as mergeable bitmap words under ``state_dir``.
    Stateless stream; append mode; no watermark; no state store."""

    from multi_threaded_mapreduce_framework_spark.functions.bitmap import bitmap_layer

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        bitmap_layer(batch_df, keys, id_col).write.mode("overwrite").parquet(
            f"{state_dir}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )


def _bitmap_state(spark, state_dir: str, keys: list[str]) -> DataFrame:
    """Union of base + above-watermark COMMITTED batch word partials."""
    base = _base_dir(state_dir)  # resolved ONCE; wm comes from this snapshot
    wm = _watermark_of(base)
    ids = [i for i in _committed_batch_ids(state_dir) if i > wm]
    return _merged_partials(spark, state_dir, keys, base, ids, ["wi", "w"])


def read_bitmap_matview(spark, state_dir: str, keys: list[str]) -> DataFrame:
    """Current exact distinct count per key: OR-merge words, sum
    bit_counts.  Exact at any moment, under any replay history."""
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import (
        count_distinct_words,
        merge_words,
    )

    merged = merge_words(_bitmap_state(spark, state_dir, keys), keys)
    return count_distinct_words(merged, keys)


def compact_bitmap_matview(spark, state_dir: str, keys: list[str]) -> int:
    """Fold base + batch word partials into a fresh OR-merged versioned
    base snapshot (same atomic pointer swap + deferred-GC discipline as
    :func:`compact_matview`, via :func:`_publish_base`).  The snapshot
    keeps WORDS, not counts, so it stays mergeable with future batches
    forever.  The fold set is pinned before reading (see
    :func:`compact_matview`)."""
    base = _base_dir(state_dir)
    wm_old = _watermark_of(base)
    fold = [i for i in _committed_batch_ids(state_dir) if i > wm_old]
    if not fold:
        return wm_old
    wm_new = max(fold)
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import merge_words

    snap = merge_words(
        _merged_partials(spark, state_dir, keys, base, fold, ["wi", "w"]), keys
    )
    tmp = os.path.join(state_dir, f"._base-{uuid.uuid4().hex[:8]}")
    snap.coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _WM), "w") as f:
        f.write(str(wm_new))
    _publish_base(state_dir, tmp, wm_old, wm_new)
    return wm_new
