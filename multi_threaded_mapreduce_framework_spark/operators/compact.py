"""Small-file compaction for parquet directories (the lakehouse
OPTIMIZE / bin-packing maintenance job).

Streaming sinks, frequent small batch appends, and over-partitioned
writes all leave directories with thousands of kilobyte-scale files;
at 100 TB that turns every scan into a file-listing + task-scheduling
storm (one Spark task per tiny split) and wrecks parquet's row-group
statistics.  Compaction rewrites the directory into
``ceil(total_bytes / target_file_bytes)`` files:

- output file count is computed from the ACTUAL on-disk bytes, not a
  guessed ``coalesce(n)``;
- the rewrite goes to a temp sibling directory first and is swapped in
  with directory renames, so readers never observe a half-written
  state (same temp+rename discipline as the jsonl sink's two-phase
  commit, ``sources/pydatasource.py``);
- ``coalesce`` (not ``repartition``) does the merge: no shuffle, each
  output task concatenates whole input splits, preserving any
  within-file sort the layout had.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from dataclasses import dataclass


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int


def _parquet_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]


def compact_parquet_dir(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> CompactionStats:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total/target)`` files.  Returns before/after stats.  No-op
    (stats only) if the directory already meets the target count."""
    files = _parquet_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if len(files) <= n_out:
        return CompactionStats(len(files), len(files), total)

    tmp = f"{path.rstrip('/')}._compact-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}._old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return CompactionStats(len(files), len(_parquet_files(path)), total)


def compact_parquet_dir_rows(
    spark, path: str, target_rows: int
) -> "CompactionStats":
    """Row-targeted variant of :func:`compact_parquet_dir`: rewrite the
    directory into ``ceil(rows / target_rows)`` files.  Byte targets
    are the production knob (row-group sizing follows bytes), but the
    ROW law is deterministic from the data alone, which makes the
    rewrite's outcome oracle-verifiable (q240): files_after equals the
    planned count exactly, so an engine-independent SQL replay can
    gate the real on-disk rewrite.  Same temp+rename reader-atomic
    swap and shuffle-free ``coalesce`` as the byte-targeted form."""
    files = _parquet_files(path)
    total = sum(os.path.getsize(f) for f in files)
    rows = spark.read.parquet(path).count()
    n_out = max(1, math.ceil(rows / target_rows))
    if len(files) <= n_out:
        return CompactionStats(len(files), len(files), total)

    tmp = f"{path.rstrip('/')}._compact-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}._old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return CompactionStats(len(files), len(_parquet_files(path)), total)
