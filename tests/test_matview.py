"""Tests for the stateless streaming materialized view
(streaming/matview.py): stream-vs-batch equality, replay idempotency,
compaction watermark semantics."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from multi_threaded_mapreduce_framework_spark.sources import load_table
from multi_threaded_mapreduce_framework_spark.streaming import (
    compact_matview,
    kafka_wire_stream,
    parse_events,
    read_matview,
    start_incremental_matview,
    write_kafka_replay,
)
from multi_threaded_mapreduce_framework_spark.streaming.matview import (
    _partials,
    _watermark,
)

SF = "/root/testdata/sf0.001"
KEYS = ["event_type"]


@pytest.fixture(scope="module")
def wire_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mv_wire"))
    write_kafka_replay(spark, SF, d, n_chunks=3)
    return d


def _batch_truth(spark):
    return (
        load_table(spark, SF, "events")
        .groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.expr("cast(cast(value as decimal(18,6)) * 1000000 as bigint)"))
            .cast("bigint")
            .alias("sum_micro"),
        )
        .withColumn("avg_micro", F.expr("sum_micro div cnt").cast("bigint"))
    )


def test_matview_converges_to_batch_aggregate(spark, wire_dir, tmp_path):
    state = str(tmp_path / "state")
    q = start_incremental_matview(
        parse_events(kafka_wire_stream(spark, wire_dir)),
        KEYS,
        state,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = read_matview(spark, state, KEYS)
    truth = _batch_truth(spark)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, truth.collect()))
    # stream stayed stateless: multiple batch dirs, no state-store agg
    assert len([d for d in os.listdir(state) if d.startswith("batch_id=")]) >= 2


def test_matview_compaction_preserves_view_and_prunes_dirs(spark, wire_dir, tmp_path):
    state = str(tmp_path / "state")
    q = start_incremental_matview(
        parse_events(kafka_wire_stream(spark, wire_dir)),
        KEYS,
        state,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    before = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    wm = compact_matview(spark, state, KEYS)
    assert wm >= 0 and _watermark(state) == wm
    # GC is deferred one generation: freshly-folded batch dirs are
    # RETAINED (a reader holding the pre-swap pointer still needs
    # them) and ignored by post-swap readers via the watermark
    folded = [d for d in os.listdir(state) if d.startswith("batch_id=")]
    assert folded != []
    after = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    assert before == after
    # idempotent: a second compaction with nothing new is a no-op
    assert compact_matview(spark, state, KEYS) == wm
    # the NEXT folding compaction removes the previous generation's
    # folded dirs and the previous base snapshot
    part = _partials(load_table(spark, SF, "events").limit(100), KEYS)
    part.write.mode("overwrite").parquet(f"{state}/batch_id={wm + 1}")
    wm2 = compact_matview(spark, state, KEYS)
    assert wm2 == wm + 1 and _watermark(state) == wm2
    left = [d for d in os.listdir(state) if d.startswith("batch_id=")]
    assert left == [f"batch_id={wm + 1}"], left
    bases = [d for d in os.listdir(state) if d.startswith("base")]
    assert sorted(bases) == [f"base-{wm}", f"base-{wm2}"], bases


def test_matview_reader_with_stale_pointer_stays_exact(spark, tmp_path):
    """The advisor's race, pinned: a reader that resolved the base
    pointer BEFORE a compaction published must still compute the exact
    view from the OLD snapshot + the batch dirs above the old
    watermark — all of which the deferred GC retains.  (The old code's
    rename gap made such a reader see watermark -1 with compacted
    history missing -> silent undercount.)"""
    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        _base_dir,
    )

    state = str(tmp_path / "state")
    ev = load_table(spark, SF, "events")
    _partials(ev.limit(300), KEYS).write.parquet(f"{state}/batch_id=0")
    compact_matview(spark, state, KEYS)  # -> base-0 holds batch 0
    _partials(ev.limit(700), KEYS).write.parquet(f"{state}/batch_id=1")
    # stale reader: resolves pointer + watermark NOW (pre-compaction)
    stale_base, stale_wm = _base_dir(state), _watermark(state)
    truth = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    compact_matview(spark, state, KEYS)  # publishes base-1, GC defers
    # everything the stale reader resolved must still exist and be
    # complete: old snapshot + batch dirs above the old watermark
    assert os.path.isdir(stale_base)
    stale_view = (
        spark.read.parquet(stale_base)
        .unionByName(spark.read.parquet(f"{state}/batch_id=1"))
        .groupBy(*KEYS)
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("sum_micro").cast("bigint").alias("sum_micro"),
        )
        .withColumn("avg_micro", F.expr("sum_micro div cnt").cast("bigint"))
    )
    assert sorted(map(tuple, stale_view.collect())) == truth
    assert stale_wm == 0
    # and the post-swap reader sees the new snapshot, same values
    assert sorted(map(tuple, read_matview(spark, state, KEYS).collect())) == truth


def test_matview_reader_resolves_base_once(spark, tmp_path):
    """The r5 advisor's second race, pinned structurally: pairing an
    OLD watermark with a NEW base double counts the deferred-GC-retained
    batch dirs in (wm_old, wm_new].  The fix is to resolve the pointer
    exactly once and read the watermark from that snapshot — so a view
    computed against ANY (base, watermark-of-that-base) pair is exact.
    Simulate the torn read directly: old wm + new base must overcount,
    proving the hazard is real; the reader's own pairing must not."""
    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        _base_dir,
        _watermark_of,
    )

    state = str(tmp_path / "state")
    ev = load_table(spark, SF, "events")
    _partials(ev.limit(300), KEYS).write.parquet(f"{state}/batch_id=0")
    compact_matview(spark, state, KEYS)  # base-0, wm 0
    old_wm = _watermark(state)
    _partials(ev.limit(700), KEYS).write.parquet(f"{state}/batch_id=1")
    truth = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    compact_matview(spark, state, KEYS)  # base-1 folds batch 1; dir retained
    new_base = _base_dir(state)
    assert _watermark_of(new_base) == 1 and old_wm == 0
    assert os.path.isdir(f"{state}/batch_id=1")  # deferred GC retains it
    # the torn pairing (new base + old wm) WOULD double count batch 1:
    torn = (
        spark.read.parquet(new_base)
        .unionByName(spark.read.parquet(f"{state}/batch_id=1"))
        .groupBy(*KEYS)
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sum(r.cnt for r in torn.collect()) > sum(
        r.cnt for r in read_matview(spark, state, KEYS).select("cnt").collect()
    )
    # the reader itself stays exact because it never makes that pairing
    assert sorted(map(tuple, read_matview(spark, state, KEYS).collect())) == truth


def test_matview_compaction_gcs_orphaned_tmp_dirs(spark, tmp_path):
    """A compaction that crashes after writing its ._base-*/._ptr-* tmp
    must not leak it forever: the next successful publish sweeps stale
    tmp entries (they match no reader path, so removal is safe)."""
    state = str(tmp_path / "state")
    ev = load_table(spark, SF, "events")
    _partials(ev.limit(300), KEYS).write.parquet(f"{state}/batch_id=0")
    # simulate a crashed compaction: orphan tmp snapshot + pointer tmp
    os.makedirs(f"{state}/._base-deadbeef")
    with open(f"{state}/._base-deadbeef/junk", "w") as f:
        f.write("x")
    with open(f"{state}/._ptr-deadbeef", "w") as f:
        f.write("base-999")
    truth = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    compact_matview(spark, state, KEYS)
    leftovers = [
        d for d in os.listdir(state) if d.startswith(("._base-", "._ptr-"))
    ]
    assert leftovers == []
    assert sorted(map(tuple, read_matview(spark, state, KEYS).collect())) == truth


def test_matview_migrates_legacy_unversioned_base(spark, tmp_path):
    """State written by the pre-pointer layout (an unversioned ``base/``
    dir holding the watermark, no ``_BASE`` file) must read correctly
    and migrate on the next compaction: the new versioned snapshot takes
    over via the pointer while the legacy dir survives one generation."""
    import shutil as _sh

    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        _base_dir,
    )

    state = str(tmp_path / "state")
    ev = load_table(spark, SF, "events")
    _partials(ev.limit(400), KEYS).write.parquet(f"{state}/batch_id=0")
    # hand-build the LEGACY layout: snapshot at base/ with _watermark=0
    snap = _partials(ev.limit(400), KEYS)
    snap.coalesce(1).write.parquet(f"{state}/base")
    with open(f"{state}/base/{'_watermark'}", "w") as f:
        f.write("0")
    _sh.rmtree(f"{state}/batch_id=0")
    assert _watermark(state) == 0 and _base_dir(state).endswith("/base")
    truth = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    # new batch + compaction migrates to the versioned pointer layout
    _partials(ev.limit(900).filter("event_id % 3 = 0"), KEYS).write.parquet(
        f"{state}/batch_id=1"
    )
    full = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    wm = compact_matview(spark, state, KEYS)
    assert wm == 1 and _base_dir(state).endswith("base-1")
    assert os.path.isdir(f"{state}/base")  # legacy survives one generation
    assert sorted(map(tuple, read_matview(spark, state, KEYS).collect())) == full
    assert truth != full  # the new batch actually changed the view


def test_matview_replayed_batch_is_idempotent(spark, tmp_path):
    """Writing the same batch_id twice (Spark's replay contract) must
    not double count — and a replay of an already-COMPACTED batch is
    ignored via the watermark."""
    state = str(tmp_path / "state")
    ev = load_table(spark, SF, "events").limit(500)
    part = _partials(ev, KEYS)
    part.write.mode("overwrite").parquet(f"{state}/batch_id=0")
    part.write.mode("overwrite").parquet(f"{state}/batch_id=0")  # replay
    v1 = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    direct = sorted(
        map(
            tuple,
            part.withColumn(
                "avg_micro", F.expr("sum_micro div cnt").cast("bigint")
            ).collect(),
        )
    )
    assert v1 == direct
    compact_matview(spark, state, KEYS)
    # pathological post-compaction replay of batch 0: reader must ignore it
    part.write.mode("overwrite").parquet(f"{state}/batch_id=0")
    v2 = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    assert v2 == v1


# ---------------------------------------------------------- bitmap view
def _bitmap_truth(spark):
    return (
        load_table(spark, SF, "events")
        .groupBy(*KEYS)
        .agg(F.countDistinct("user_id").cast("bigint").alias("distinct_ids"))
    )


def test_bitmap_matview_converges_to_batch_count_distinct(
    spark, wire_dir, tmp_path
):
    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        read_bitmap_matview,
        start_bitmap_matview,
    )

    state = str(tmp_path / "bstate")
    q = start_bitmap_matview(
        parse_events(kafka_wire_stream(spark, wire_dir)),
        KEYS,
        "user_id",
        state,
        str(tmp_path / "bckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, read_bitmap_matview(spark, state, KEYS).collect()))
    want = sorted(map(tuple, _bitmap_truth(spark).collect()))
    assert got == want
    assert len([d for d in os.listdir(state) if d.startswith("batch_id=")]) >= 2


def test_bitmap_matview_or_idempotent_under_duplicated_batch(
    spark, wire_dir, tmp_path
):
    """Stronger than replay-overwrite idempotency: even a batch
    DUPLICATED under a fresh id (at-least-once delivery with a broken
    checkpoint) cannot change the view, because OR is idempotent."""
    import shutil as _sh

    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        read_bitmap_matview,
        start_bitmap_matview,
    )

    state = str(tmp_path / "bstate")
    q = start_bitmap_matview(
        parse_events(kafka_wire_stream(spark, wire_dir)),
        KEYS,
        "user_id",
        state,
        str(tmp_path / "bckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    before = sorted(map(tuple, read_bitmap_matview(spark, state, KEYS).collect()))
    dirs = sorted(d for d in os.listdir(state) if d.startswith("batch_id="))
    dup_id = max(int(d.split("=", 1)[1]) for d in dirs) + 1
    _sh.copytree(
        os.path.join(state, dirs[0]), os.path.join(state, f"batch_id={dup_id}")
    )
    after = sorted(map(tuple, read_bitmap_matview(spark, state, KEYS).collect()))
    assert before == after


def test_bitmap_matview_compaction_keeps_words_mergeable(
    spark, wire_dir, tmp_path
):
    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        compact_bitmap_matview,
        read_bitmap_matview,
        start_bitmap_matview,
    )

    state = str(tmp_path / "bstate")
    q = start_bitmap_matview(
        parse_events(kafka_wire_stream(spark, wire_dir)),
        KEYS,
        "user_id",
        state,
        str(tmp_path / "bckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    before = sorted(map(tuple, read_bitmap_matview(spark, state, KEYS).collect()))
    wm = compact_bitmap_matview(spark, state, KEYS)
    assert wm >= 0 and _watermark(state) == wm
    # deferred GC: freshly-folded dirs retained (ignored via watermark)
    assert [d for d in os.listdir(state) if d.startswith("batch_id=")] != []
    assert (
        sorted(map(tuple, read_bitmap_matview(spark, state, KEYS).collect()))
        == before
    )
    # post-compaction batches still merge with the snapshot WORDS: feed
    # a synthetic batch of brand-new user ids above the current range
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import bitmap_layer

    new = spark.createDataFrame(
        [("purchase", 100000), ("purchase", 100001)], "event_type string, user_id long"
    )
    bitmap_layer(new, KEYS, "user_id").write.mode("overwrite").parquet(
        os.path.join(state, f"batch_id={wm + 1}")
    )
    merged = {
        r.event_type: r.distinct_ids
        for r in read_bitmap_matview(spark, state, KEYS).collect()
    }
    base = {r[0]: r[1] for r in before}
    assert merged["purchase"] == base["purchase"] + 2


def test_bitmap_matview_reader_with_stale_pointer_stays_exact(spark, tmp_path):
    """Mirror of the cnt/sum stale-reader race test for the BITMAP
    compactor: a reader that resolved the pointer before a compaction
    published must still OR-merge the exact view from the old snapshot
    + retained batch dirs."""
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import (
        bitmap_layer,
        count_distinct_words,
        merge_words,
    )
    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        _base_dir,
        compact_bitmap_matview,
        read_bitmap_matview,
    )

    state = str(tmp_path / "bstate")
    ev = load_table(spark, SF, "events")
    bitmap_layer(ev.limit(300), KEYS, "user_id").write.parquet(f"{state}/batch_id=0")
    compact_bitmap_matview(spark, state, KEYS)
    bitmap_layer(ev.limit(900), KEYS, "user_id").write.parquet(f"{state}/batch_id=1")
    stale_base, stale_wm = _base_dir(state), _watermark(state)
    truth = sorted(map(tuple, read_bitmap_matview(spark, state, KEYS).collect()))
    compact_bitmap_matview(spark, state, KEYS)
    assert os.path.isdir(stale_base) and stale_wm == 0
    stale_words = (
        spark.read.parquet(stale_base)
        .select(*KEYS, "wi", "w")
        .unionByName(
            spark.read.parquet(f"{state}/batch_id=1").select(*KEYS, "wi", "w")
        )
    )
    stale_view = count_distinct_words(merge_words(stale_words, KEYS), KEYS)
    assert sorted(map(tuple, stale_view.collect())) == truth
    assert sorted(map(tuple, read_bitmap_matview(spark, state, KEYS).collect())) == truth


def test_matview_reads_stay_exact_under_concurrent_compaction(spark, tmp_path):
    """The module's atomicity claim, stress-tested: a reader loop and a
    compactor loop race over live state — EVERY read must be exact (no
    double count from a torn wm/base pairing, no undercount from a
    mid-swap resolve).  Batches keep arriving between compactions, so
    readers constantly cross pointer swaps and deferred GCs."""
    import threading

    state = str(tmp_path / "state")
    ev = load_table(spark, SF, "events")
    # micro-batches: 6 disjoint slices with known totals
    slices = [ev.filter(f"event_id % 6 = {i}") for i in range(6)]
    truth_after = []  # cumulative expected (key -> (cnt, sum)) per batch
    running: dict = {}
    for i, sl in enumerate(slices):
        for r in _partials(sl, KEYS).collect():
            c, s = running.get(r.event_type, (0, 0))
            running[r.event_type] = (c + r.cnt, s + r.sum_micro)
        truth_after.append(dict(running))

    errors: list = []
    stop = threading.Event()

    def compactor():
        while not stop.is_set():
            try:
                compact_matview(spark, state, KEYS)
            except Exception as e:  # noqa: BLE001
                errors.append(("compact", repr(e)))
                return

    written = 0
    t = threading.Thread(target=compactor, daemon=True)
    _partials(slices[0], KEYS).write.parquet(f"{state}/batch_id=0")
    written = 1
    t.start()
    try:
        for i in range(1, 6):
            _partials(slices[i], KEYS).write.parquet(f"{state}/batch_id={i}")
            written = i + 1
            # several reads racing this write window's compactions
            for _ in range(3):
                got = {
                    r.event_type: (r.cnt, r.sum_micro)
                    for r in read_matview(spark, state, KEYS).collect()
                }
                # the read must equal the cumulative truth at SOME
                # prefix >= the last fully-written batch before the
                # read started; since writes happen in this thread,
                # the only valid answer is the current cumulative state
                want = truth_after[written - 1]
                if got != want:
                    errors.append(("read", written, got, want))
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errors, errors[:3]
    # converged view == one-pass batch aggregate over everything
    final = {
        r.event_type: (r.cnt, r.sum_micro)
        for r in read_matview(spark, state, KEYS).collect()
    }
    assert final == truth_after[-1]


def test_matview_read_exact_with_compaction_injected_mid_read(
    spark, tmp_path, monkeypatch
):
    """VERDICT r06 item 6, the adversarial version of the resolve-once
    law: inject a FULL compaction between read_matview's base
    resolution and its batch listing (the exact interleaving the old
    two-call pattern was vulnerable to).  The reader resolved base-0
    (wm 0); the injected compaction publishes base-1 folding batch 1
    and defers GC, so the listing still finds batch 1 with id > 0 —
    the read must combine OLD base + batch 1 exactly once.  Under the
    old pattern (watermark re-read from the CURRENT pointer after the
    listing) the same interleaving pairs wm 1 with base-0 and LOSES
    batch 1 — asserted at the bottom so this test fails on that code."""
    import multi_threaded_mapreduce_framework_spark.streaming.matview as mv

    state = str(tmp_path / "state")
    ev = load_table(spark, SF, "events")
    _partials(ev.limit(300), KEYS).write.parquet(f"{state}/batch_id=0")
    compact_matview(spark, state, KEYS)  # base-0, wm 0
    _partials(ev.limit(700), KEYS).write.parquet(f"{state}/batch_id=1")
    truth = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))

    real_listing = mv._committed_batch_ids
    fired = {"n": 0}

    def listing_with_injected_compaction(d):
        # only the OUTER read's first listing triggers the compaction;
        # the compaction's own internal listing must see the real state
        if fired["n"] == 0:
            fired["n"] = 1
            monkeypatch.setattr(mv, "_committed_batch_ids", real_listing)
            compact_matview(spark, state, KEYS)  # publishes base-1
            monkeypatch.setattr(
                mv, "_committed_batch_ids", listing_with_injected_compaction
            )
        return real_listing(d)

    monkeypatch.setattr(
        mv, "_committed_batch_ids", listing_with_injected_compaction
    )
    got = sorted(map(tuple, read_matview(spark, state, KEYS).collect()))
    monkeypatch.setattr(mv, "_committed_batch_ids", real_listing)
    assert fired["n"] == 1  # the injection actually ran mid-read
    assert got == truth
    # prove the test has teeth: the OLD two-call pattern (base resolved
    # first, watermark re-read from the post-compaction pointer) drops
    # batch 1 under this exact interleaving
    old_base = f"{state}/base-0"
    assert os.path.isdir(old_base)  # deferred GC retained it
    wm_now = _watermark(state)  # what the second call would have seen
    assert wm_now == 1
    ids_old_pattern = [i for i in mv._committed_batch_ids(state) if i > wm_now]
    torn = mv._merged_partials(
        spark, state, KEYS, old_base, ids_old_pattern, ["cnt", "sum_micro"]
    ).agg(F.sum("cnt").alias("c"))
    assert torn.collect()[0].c < sum(r[1] for r in truth)  # undercounts


def test_bitmap_matview_read_exact_with_compaction_injected_mid_read(
    spark, tmp_path, monkeypatch
):
    """Same injected interleaving for the bitmap-word path
    (_bitmap_state shares the resolve-once discipline): a compaction
    published between base resolution and batch listing must not
    change the distinct counts (OR-idempotency would mask a double
    count here, so the undercount direction is the live hazard)."""
    import multi_threaded_mapreduce_framework_spark.streaming.matview as mv
    from multi_threaded_mapreduce_framework_spark.functions.bitmap import (
        bitmap_layer,
    )
    from multi_threaded_mapreduce_framework_spark.streaming.matview import (
        compact_bitmap_matview,
        read_bitmap_matview,
    )

    state = str(tmp_path / "state")
    ev = load_table(spark, SF, "events")
    bitmap_layer(ev.limit(300), KEYS, "user_id").write.parquet(
        f"{state}/batch_id=0"
    )
    compact_bitmap_matview(spark, state, KEYS)  # base-0, wm 0
    bitmap_layer(ev.limit(900), KEYS, "user_id").write.parquet(
        f"{state}/batch_id=1"
    )
    truth = sorted(
        map(tuple, read_bitmap_matview(spark, state, KEYS).collect())
    )

    real_listing = mv._committed_batch_ids
    fired = {"n": 0}

    def listing_with_injected_compaction(d):
        if fired["n"] == 0:
            fired["n"] = 1
            monkeypatch.setattr(mv, "_committed_batch_ids", real_listing)
            compact_bitmap_matview(spark, state, KEYS)
            monkeypatch.setattr(
                mv, "_committed_batch_ids", listing_with_injected_compaction
            )
        return real_listing(d)

    monkeypatch.setattr(
        mv, "_committed_batch_ids", listing_with_injected_compaction
    )
    got = sorted(
        map(tuple, read_bitmap_matview(spark, state, KEYS).collect())
    )
    monkeypatch.setattr(mv, "_committed_batch_ids", real_listing)
    assert fired["n"] == 1
    assert got == truth
