"""bench.py contamination self-enforcement (VERDICT r10 item 3): a run
whose own interleaved probe track shows host interference must refuse to
become the committed BENCH.json record.

Pure-python unit tests — no Spark, no timing; the guard is exercised on
synthetic probe tracks shaped like the real artifact classes (flat clean
track vs the r10 drift-cluster spike)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_track_ratio_flat_track_is_clean():
    track = {"__start__": 0.080, "q10_x": 0.082, "q20_y": 0.079, "__end__": 0.081}
    assert bench.track_ratio(track) == 1.04
    assert not bench.is_contaminated(track)


def test_track_ratio_spike_marks_contamination():
    # the r10 signature: probes in one suite segment read ~1.8x the rest
    track = {"__start__": 0.080, "q90_x": 0.145, "q100_y": 0.139, "__end__": 0.081}
    assert bench.track_ratio(track) > bench.CALIB_TRACK_CLEAN_MAX_OVER_MIN
    assert bench.is_contaminated(track)


def test_guideline_boundary_is_inclusive_clean():
    # exactly at the guideline: still blessed (the guideline is a strict
    # upper bound; BASELINE.md says "under ~1.5")
    track = {"__start__": 0.100, "__end__": 0.150}
    assert bench.track_ratio(track) == 1.5
    assert not bench.is_contaminated(track)


def test_bless_record_writes_clean_payload(tmp_path):
    path = str(tmp_path / "BENCH.json")
    payload = {"value": 1.0, "contaminated": False}
    assert bench.bless_record(payload, path)
    assert json.load(open(path)) == payload
    assert not os.path.exists(path + ".dirty")


def test_bless_record_refuses_contaminated_payload(tmp_path):
    path = str(tmp_path / "BENCH.json")
    clean = {"value": 1.0, "contaminated": False}
    bench.bless_record(clean, path)
    dirty = {"value": 9.9, "contaminated": True}
    assert not bench.bless_record(dirty, path)
    # the committed record is untouched; the dirty payload is preserved
    # beside it for adjudication
    assert json.load(open(path)) == clean
    assert json.load(open(path + ".dirty")) == dirty
