"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's reduce phase sees the complete per-key group at once
(reference ``MapReduceClient.h:62-64``) — impossible on an unbounded
stream. This operator is the streaming generalization: per-key state
carried across micro-batches with arbitrary Python update logic, the
Spark primitive for operators that windowed aggregation can't express
(running aggregates with custom merge, decaying counters, online
sketches).

Scale posture: state lives in the state store partitioned by key (RocksDB
provider in production), update logic is Arrow-batched per key-group, and
a timeout (``ProcessingTimeTimeout``/``EventTimeTimeout``) bounds state
for keys that go quiet — the knobs that keep per-key state viable at
100 TB/day.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum), one update row per
    user per micro-batch — the streaming form of q04's batch aggregate.

    After the stream drains, the latest row per user equals the batch
    answer (asserted in tests/test_streaming.py).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "cnt": [cnt], "sum_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, cnt bigint, sum_value double",
        stateStructType="cnt bigint, sum_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum) on the
    ``transformWithStateInPandas`` API (Spark 4 state-v2): same
    semantics as :func:`running_user_totals`, but state is a named
    ``ValueState`` in the state store rather than an opaque
    ``GroupState`` tuple.

    Why the new API matters at scale: named state variables
    (value/list/map) are stored and evicted independently, TTL is per
    state variable instead of per key-group timeout, and timers are
    first-class — the shape Spark is converging on for custom stateful
    operators. Convergence to the q04 batch answer is asserted in
    tests/test_streaming.py alongside the v1 operator.

    Transport: the transformWithState worker speaks protobuf to the JVM
    state server, and querying it needs the RocksDB state store provider
    conf (per-state-variable column families). This container ships no
    protobuf wheel, so ``streaming/protoshim.py`` installs the vendored
    clean-room wire-format runtime (``vendor/google/protobuf``) before
    the JVM launches; the convergence test in tests/test_streaming.py
    runs END TO END against the real state server — every message on
    that socket cross-validates the vendored runtime against
    protobuf-java.
    """
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_running_totals_processor()(),
        outputStructType="user_id bigint, cnt bigint, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def running_user_totals_tws_micro(stream: DataFrame) -> DataFrame:
    """Integer-exact state-v2 running totals: per-user (event count,
    value sum in INTEGER MICRO-UNITS) via transformWithStateInPandas.
    The micro-unit state makes the converged answer bit-identical to
    the batch aggregate regardless of accumulation order — which is
    what lets q189 put a TWS run behind the driver's HASH gate, not a
    tolerance check.  Input needs columns (user_id, vm: bigint)."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_micro_totals_processor()(),
        outputStructType="user_id bigint, cnt bigint, sum_micro bigint",
        outputMode="Update",
        timeMode="None",
    )


def _make_micro_totals_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MicroTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "cnt bigint, sum_micro bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            cnt, total = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                cnt += len(pdf)
                # null vm -> 0 (oracle's sum() skips nulls, count(*)
                # doesn't); sum in int64 so exactness never rests on
                # float partial sums
                total += int(pdf["vm"].fillna(0).astype("int64").sum())
            self._totals.update((cnt, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "cnt": [cnt], "sum_micro": [total]}
            )

        def close(self) -> None:
            pass

    return MicroTotalsProcessor


def _make_running_totals_processor():
    """Build the state-v2 processor class. Module-level so the update
    logic is unit-testable against a fake handle in-container (where the
    protobuf transport needed to RUN a TWS query is unavailable) — the
    class itself only needs ``pyspark.sql.streaming.stateful_processor``,
    which imports fine without protobuf."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "cnt bigint, sum_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            cnt, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((cnt, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "cnt": [cnt], "sum_value": [total]}
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor


def __getattr__(name):
    # PEP 562 lazy export: building the class imports
    # pyspark.sql.streaming.stateful_processor, which a pyspark build
    # without state-v2 lacks — that must fail on USE of the TWS
    # surface, not on `import ...streaming` (which pulls this module)
    if name == "RunningTotalsProcessor":
        cls = _make_running_totals_processor()
        globals()[name] = cls
        return cls
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
