"""The reference client contract, re-expressed on Spark.

The reference engine's entire public surface is: a client supplies
``map(k1, v1) -> emit2(k2, v2)*`` and ``reduce(group) -> emit3(k3, v3)*``
(reference ``MapReduceClient.h:55-65``), the engine runs
map -> sort -> shuffle(group-by-key) -> reduce
(``MapReduceFramework.cpp:118-248``) and fills an unordered output bag.

Two execution paths:

- :func:`run_mapreduce` — *exact-semantics* path. Arbitrary Python
  ``map_fn``/``reduce_fn`` over rows, ``flatMap`` + ``groupByKey``.
  Preserves every reference behavior: flatMap map (0..n emits per input,
  ``MapReduceClient.h:57-59``), multiset groups (duplicates preserved,
  ``MapReduceFramework.cpp:198-201``), per-group flatMap reduce
  (``MapReduceClient.h:62-64``), unordered output bag
  (``MapReduceFramework.cpp:368-369``).
- :func:`run_mapreduce_arrow` — *fast path*. Same contract but the user
  functions are pandas-batch functions; execution is Arrow-vectorized
  (``mapInPandas`` + ``applyInPandas``), ~10-100x less Python overhead.

Scale notes: ``groupByKey`` materializes each group on one executor —
semantically required by the contract (reduce sees the whole group), and
identical to the reference's per-key IntermediateVec. For aggregations
that are associative, use the DataFrame API instead (partial aggregation
bounds shuffle volume); this adapter exists for contract parity and for
genuinely per-group imperative logic.
"""

from __future__ import annotations

import threading
import time
import uuid
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession


def run_mapreduce(
    df: DataFrame,
    map_fn: Callable[[Row], Iterable[tuple[Any, Any]]],
    reduce_fn: Callable[[Any, list[Any]], Iterable[tuple[Any, Any]]],
    output_schema: str = "k3 string, v3 long",
    num_partitions: int | None = None,
) -> DataFrame:
    """Run a reference-contract MapReduce job over ``df``.

    ``map_fn(row)`` yields ``(k2, v2)`` pairs (0..n per row — emit2);
    ``reduce_fn(k2, [v2, ...])`` yields ``(k3, v3)`` pairs (0..n per
    group — emit3). The group's value list is a *multiset in arbitrary
    order* (the reference sorts only to implement grouping; group-internal
    order is a merge artifact clients cannot rely on).

    Returns an unordered DataFrame with ``output_schema``.
    """
    spark = df.sparkSession
    pairs = df.rdd.flatMap(lambda row: list(map_fn(row)))
    grouped = pairs.groupByKey(numPartitions=num_partitions)

    def _reduce(kv):
        k, vals = kv
        return list(reduce_fn(k, list(vals)))

    out = grouped.flatMap(_reduce)
    return spark.createDataFrame(out, schema=output_schema)


def run_mapreduce_arrow(
    df: DataFrame,
    map_batches_fn: Callable[[Iterator["pd.DataFrame"]], Iterator["pd.DataFrame"]],
    reduce_group_fn: Callable[["pd.DataFrame"], "pd.DataFrame"],
    intermediate_schema: str,
    output_schema: str,
    key_cols: tuple[str, ...] = ("k2",),
) -> DataFrame:
    """Arrow-vectorized MapReduce: ``mapInPandas`` (map phase, batch
    flatMap) -> ``groupBy(key).applyInPandas`` (reduce phase, one pandas
    frame per key group — the reference's IntermediateVec as a DataFrame).

    This is the shape to use when the per-group logic is vectorizable:
    the shuffle still carries every intermediate pair (like the
    reference), but Python crossing costs are Arrow-batched.
    """
    inter = df.mapInPandas(map_batches_fn, schema=intermediate_schema)
    return inter.groupBy(*key_cols).applyInPandas(
        lambda pdf: reduce_group_fn(pdf), schema=output_schema
    )


# --------------------------------------------------------------------------
# Job-handle / progress facade (reference R12/R13/R14 parity)
# --------------------------------------------------------------------------


class Stage(Enum):
    """Reference ``stage_t`` (``MapReduceFramework.h:8-13``)."""

    UNDEFINED = 0
    MAP = 1
    SHUFFLE = 2
    REDUCE = 3


@dataclass
class JobState:
    """Reference ``JobState`` {stage, percentage} (``MapReduceFramework.h``)."""

    stage: Stage = Stage.UNDEFINED
    percentage: float = 0.0


@dataclass
class JobHandle:
    """Async MapReduce job, mirroring ``startMapReduceJob``'s contract:
    returns immediately, job runs in the background, progress pollable,
    ``wait`` idempotent (reference CAS join-once,
    ``MapReduceFramework.cpp:294-295``)."""

    spark: SparkSession
    group_id: str
    _thread: threading.Thread
    _result: list = field(default_factory=list)
    _error: list = field(default_factory=list)
    _done: threading.Event = field(default_factory=threading.Event)

    def get_job_state(self) -> JobState:
        """Reference ``getJobState`` — decode {stage, percentage} from the
        Spark status tracker instead of the reference's bit-packed atomic
        (``MapReduceFramework.cpp:103-114``).

        Mapping: Spark runs map and reduce tasks of one shuffle in two
        stages; the earliest active stage of the job group is labeled MAP,
        later stages REDUCE (Spark's exchange subsumes the reference's
        single-threaded SHUFFLE phase — there is no instant where a
        dedicated shuffle thread runs, so SHUFFLE never surfaces).
        """
        if self._done.is_set():
            return JobState(Stage.REDUCE, 100.0)
        tracker = self.spark.sparkContext.statusTracker()
        job_ids = tracker.getJobIdsForGroup(self.group_id)
        if not job_ids:
            return JobState(Stage.UNDEFINED, 0.0)
        total = done = 0
        n_stages = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is None:
                    continue
                n_stages += 1
                total += sinfo.numTasks
                done += sinfo.numCompletedTasks
        stage = Stage.MAP if n_stages <= 1 else Stage.REDUCE
        pct = 100.0 * done / total if total else 0.0
        return JobState(stage, min(pct, 100.0))

    def wait(self, timeout: float | None = None) -> bool:
        """Reference ``waitForJob`` — blocks until done; safe to call from
        multiple threads / multiple times (join-once semantics). Waits on
        the completion event rather than ``Thread.join`` so a timed wait
        can never block behind another caller's untimed wait. Returns
        True iff the job completed within ``timeout`` (always True for
        ``timeout=None``)."""
        return self._done.wait(timeout)

    def result(self) -> list[Row]:
        """The output bag (reference ``OutputVec``); blocks until done."""
        self.wait()
        if self._error:
            raise self._error[0]
        return self._result[0] if self._result else []

    def close(self) -> None:
        """Reference ``closeJobHandle`` — wait + release."""
        self.wait()
        self._result.clear()


def start_mapreduce_job(
    df: DataFrame,
    map_fn: Callable[[Row], Iterable[tuple[Any, Any]]],
    reduce_fn: Callable[[Any, list[Any]], Iterable[tuple[Any, Any]]],
    output_schema: str = "k3 string, v3 long",
) -> JobHandle:
    """Async form of :func:`run_mapreduce` — the reference's
    ``startMapReduceJob`` (returns immediately; poll ``get_job_state``,
    then ``wait``/``result``). Empty input short-circuits like the
    reference (``MapReduceFramework.cpp:256-261``) by simply producing an
    empty bag."""
    spark = df.sparkSession
    group_id = f"mapreduce-{uuid.uuid4().hex[:12]}"
    out_df = run_mapreduce(df, map_fn, reduce_fn, output_schema)

    handle_box: list[JobHandle] = []

    def _run():
        sc = spark.sparkContext
        sc.setJobGroup(group_id, "run_mapreduce job", interruptOnCancel=True)
        try:
            handle_box[0]._result.append(out_df.collect())
        except Exception as e:  # noqa: BLE001
            handle_box[0]._error.append(e)
        finally:
            sc.setJobGroup(None, None)
            handle_box[0]._done.set()

    thread = threading.Thread(target=_run, daemon=True)
    handle = JobHandle(spark=spark, group_id=group_id, _thread=thread)
    handle_box.append(handle)
    thread.start()
    return handle
