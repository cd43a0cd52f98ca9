"""Property-based invariants of the round-10 video-tier laws — the
pure-arithmetic cores of q271 (frame-selection closed form, P6
container size law) and the byte-level stream/slice round trip of
``ppm_stream_bytes`` / ``_parse_ppm_at``, exercised over randomized
inputs WITHOUT Spark: the laws are engine-independent by design
(that is what makes the q271 oracle gate exact), so their invariants
must hold for any input, not just the fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from multi_threaded_mapreduce_framework_spark.operators.multimodal import (
    _parse_ppm,
    _parse_ppm_at,
    ppm_stream_bytes,
)

_SETTINGS = settings(max_examples=150, deadline=None)


@given(n_frames=st.integers(min_value=1, max_value=1000))
@_SETTINGS
def test_selection_law_closed_form(n_frames):
    """The kernel's selection loop (ts grid + min clamp) equals the
    oracle's closed form at 4 fps / 500 ms grid: the EVEN-indexed
    frames, ceil(n/2) of them — the equivalence q271's oracle rests
    on, for every frame count (not just the fixture's 2..5)."""
    duration = 250 * n_frames
    picked = [
        min(ts * n_frames // max(duration, 1), n_frames - 1)
        for ts in range(0, duration, 500)
    ]
    assert picked == [2 * j for j in range((n_frames + 1) // 2)]
    assert len(picked) == (n_frames + 1) // 2


@given(
    w=st.integers(min_value=1, max_value=120),
    h=st.integers(min_value=1, max_value=120),
)
@_SETTINGS
def test_ppm_container_size_law(w, h):
    """byte_len of a single-frame P6 payload is exactly
    9 + len(str(w)) + len(str(h)) + 3*w*h — the bytes_sum law q271's
    oracle encodes (with the fixture's single-digit heights folded to
    10 + len(str(w)) + 3*w*h)."""
    frame = np.zeros((h, w, 3), dtype=np.uint8)
    raw = ppm_stream_bytes([frame])
    assert len(raw) == 9 + len(str(w)) + len(str(h)) + 3 * w * h


@given(
    dims=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=16),
            st.integers(min_value=1, max_value=12),
        ),
        min_size=1,
        max_size=6,
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@_SETTINGS
def test_stream_slice_round_trip(dims, seed):
    """extract_frames' byte-level core: walking a concatenated-P6
    stream's headers and slicing [offset[i], offset[i+1]) yields
    standalone P6 images that parse back to the EXACT original
    pixels — for frames of heterogeneous random dims and content
    (the fixture keeps dims constant per doc; the law must not)."""
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)
        for (w, h) in dims
    ]
    raw = ppm_stream_bytes(frames)
    offsets = []
    pos = 0
    while pos < len(raw):
        _, _, _, nxt = _parse_ppm_at(raw, pos)
        offsets.append(pos)
        pos = nxt
    assert len(offsets) == len(frames)
    ends = offsets[1:] + [len(raw)]
    for (w, h), frame, start, end in zip(dims, frames, offsets, ends):
        piece = raw[start:end]
        pw, ph, px = _parse_ppm(piece)
        assert (pw, ph) == (w, h)
        assert (px.reshape(h, w, 3) == frame).all()
