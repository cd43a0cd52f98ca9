"""bump_new_file_mtimes contract (r10 advisor, mechanized in r11):
after the helper returns, EVERY later write — another stamped wave or a
naive append with a natural mtime — must sort strictly after the wave
just stamped, because the helper never returns while its stamp is in
the future.  Pure-filesystem tests, no Spark."""

from __future__ import annotations

import os
import time

from multi_threaded_mapreduce_framework_spark.streaming.windowed import (
    bump_new_file_mtimes,
)


def _write(d, name, body="x"):
    p = os.path.join(d, name)
    with open(p, "w") as fh:
        fh.write(body)
    return p


def _mtimes(d):
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if not f.startswith(("_", "."))
    }


def test_empty_dir_chain_anchors_in_the_past(tmp_path):
    d = str(tmp_path)
    _write(d, "a.parquet")
    bump_new_file_mtimes(d, before=set())
    m = _mtimes(d)
    # past-anchored: a later NATURAL write automatically sorts after
    assert m["a.parquet"] < time.time() - 3000
    _write(d, "b.parquet")
    assert _mtimes(d)["b.parquet"] > m["a.parquet"]


def test_waves_are_strictly_ordered(tmp_path):
    d = str(tmp_path)
    seen: set = set()
    maxes = []
    for i in range(3):
        _write(d, f"w{i}.parquet")
        bump_new_file_mtimes(d, seen)
        seen = set(os.listdir(d))
        maxes.append(_mtimes(d)[f"w{i}.parquet"])
    assert maxes == sorted(maxes)
    assert len(set(maxes)) == 3  # strict, no ties


def test_stamp_over_natural_mtimes_never_returns_in_the_future(tmp_path):
    # the r10 advisor's window: stamping ON TOP of ~now natural mtimes
    d = str(tmp_path)
    _write(d, "natural.parquet")  # natural ~now mtime, never stamped
    before = set(os.listdir(d))
    _write(d, "wave.parquet")
    bump_new_file_mtimes(d, before)
    m = _mtimes(d)
    # strict order over the natural file...
    assert m["wave.parquet"] > m["natural.parquet"]
    # ...and the stamp is NOT in the future once the helper returns, so
    # a naive append RIGHT NOW already sorts after it
    assert m["wave.parquet"] < time.time()
    _write(d, "naive_append.parquet")
    assert _mtimes(d)["naive_append.parquet"] > m["wave.parquet"]
