"""Multimodal (image/audio/video) column plumbing.

Media is modeled the way a 100 TB training-data lake stores it: an
opaque ``binary`` payload column plus typed metadata, processed with
Arrow-batched ``mapInPandas`` so payload bytes never take the
row-at-a-time Python path. The decode kernels themselves are STUBBED —
this container has no image/audio libraries — behind
:func:`_require_codec`, with a deterministic fake used by tests so the
Spark-side plumbing (schema, batch shape, partitioning, UDF signatures)
is real and verified even though the pixel math is fake.

Schema convention::

    media_id  bigint
    kind      string            -- 'image' | 'audio' | 'video'
    payload   binary            -- encoded bytes (opaque)
    meta      struct<width:int, height:int, format:string,
                     duration_ms:int, sample_rate:int>

At scale: payloads dominate bytes, so operators below select only the
columns they need (column pruning keeps untouched payloads out of I/O
when metadata-only queries run), and every kernel is a mapInPandas pass
— embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, format:string, "
    "duration_ms:int, sample_rate:int>"
)

FEATURE_DIM = 8


def _require_codec(name: str):
    """Gate on a real media library; raise the documented stub error.

    Production deployments install the codec (PIL / torchaudio / pyav)
    on executors and this resolves; this container has none, so
    operators fall back to the deterministic fake kernels below when
    ``fake=True`` and raise otherwise.
    """
    try:
        module = __import__(name)
        return module
    except ImportError as e:
        raise NotImplementedError(
            f"media codec '{name}' not available in this environment; "
            "run with fake=True for the deterministic stub kernel"
        ) from e


def synthesize_media(spark: SparkSession, n: int = 64, parts: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes with
    the declared width/height packed into the header) — the stand-in for
    ``spark.read.format('binaryFile')`` over a real media lake."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = 16 + (i % 5) * 8, 16 + (i % 3) * 8
        body = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        payload = struct.pack("<ii", w, h) + body
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (w, h, "fake", 1000 + i * 10, 16_000),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(parts)


def decode_images(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode image payloads -> (media_id, width, height, mean_intensity).

    Real path: PIL decode per payload inside the Arrow batch. Stub path:
    header-packed dims + byte-mean as 'intensity' — deterministic, so
    tests can assert exact values while exercising the identical
    mapInPandas batch shape the real kernel uses.
    """
    if not fake:
        _require_codec("PIL")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "mean_intensity": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                w, h = struct.unpack_from("<ii", raw, 0)
                body = raw[8:]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_intensity"].append(round(sum(body) / len(body), 2))
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema="media_id bigint, width int, height int, mean_intensity double"
    )


def extract_features(df: DataFrame, dim: int = FEATURE_DIM, fake: bool = True) -> DataFrame:
    """Payload -> fixed-dim float feature vector (the embed step of a
    multimodal pipeline). Stub kernel: sha256-seeded deterministic
    pseudo-floats in [0, 1); real kernel: a model forward pass over the
    decoded tensor (same signature, same output schema)."""
    if not fake:
        _require_codec("torch")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.sha256(bytes(payload)).digest()
                vec = [
                    round(int.from_bytes(digest[4 * j : 4 * j + 4], "little") / 2**32, 6)
                    for j in range(dim)
                ]
                ids.append(mid)
                feats.append(vec)
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return df.mapInPandas(kernel, schema="media_id bigint, feature array<float>")


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize kernel. Stub path re-packs the header with the target dims
    (payload body untouched); real path is a PIL resize + re-encode."""
    if not fake:
        _require_codec("PIL")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                ids.append(mid)
                payloads.append(struct.pack("<ii", width, height) + raw[8:])
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema="media_id bigint, payload binary"
    )


def sample_frames(df: DataFrame, every_ms: int = 500, fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_idx, frame_ts_ms) — a flatMap-shaped kernel (rows
    out > rows in), driven by the metadata duration. Stub path emits
    frame stubs; real path decodes frames with pyav."""
    if not fake:
        _require_codec("av")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": []}
            for mid, meta in zip(pdf["media_id"], pdf["meta"]):
                duration = int(meta["duration_ms"])
                for k, ts in enumerate(range(0, duration, every_ms)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["frame_ts_ms"].append(ts)
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(
        kernel, schema="media_id bigint, frame_idx int, frame_ts_ms int"
    )
