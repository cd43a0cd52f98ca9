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
  with directory renames (same temp+rename discipline as the jsonl
  sink's two-phase commit, ``sources/pydatasource.py``).  Each rename
  is atomic, but the swap as a whole is not: between the two renames
  the directory briefly does not exist, and a crash in that window
  leaves the data under the ``._old-*`` suffix — recoverable, never
  half-written, but readers racing the swap can see ENOENT.  True
  reader atomicity needs a pointer/manifest indirection (what Delta /
  Iceberg's metadata layer provides);
- ``coalesce`` (not ``repartition``) does the merge when the scan has
  enough partitions: no shuffle, each output task concatenates whole
  input splits, preserving any within-file sort the layout had.
  ``coalesce`` can only REDUCE partition count, and the scan's
  partition count over many tiny files depends on file bin-packing
  (``maxPartitionBytes`` / ``openCostInBytes`` / default parallelism)
  — on a low-core executor a 32-small-file directory may scan as
  fewer partitions than the planned output count, silently emitting
  fewer files.  When that happens the merge falls back to
  ``repartition(n_out)`` (one round-robin shuffle) so the planned
  file count is always produced.
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


def _merged(df, n_out: int):
    """Merge ``df`` down/up to exactly ``n_out`` partitions.

    ``coalesce`` is the fast path (no shuffle) but can only reduce the
    partition count; when the scan bin-packed the small files into
    FEWER partitions than the planned output (low-core machines, large
    ``maxPartitionBytes``), fall back to ``repartition`` so the
    rewrite emits exactly the planned file count."""
    n_scan = df.rdd.getNumPartitions()
    return df.coalesce(n_out) if n_scan >= n_out else df.repartition(n_out)


def _swap_in(spark, path: str, df, n_out: int) -> None:
    """Write ``df`` as ``n_out`` files to a temp sibling, then swap it
    in with two renames (atomic per rename, not per swap — see module
    docstring)."""
    tmp = f"{path.rstrip('/')}._compact-{uuid.uuid4().hex[:8]}"
    _merged(df, n_out).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}._old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


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

    _swap_in(spark, path, spark.read.parquet(path), n_out)
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
    gate the real on-disk rewrite.  Same temp+rename swap (atomic per
    rename) and shuffle-free ``coalesce`` (with the ``repartition``
    fallback when the scan under-partitions) as the byte-targeted
    form."""
    files = _parquet_files(path)
    total = sum(os.path.getsize(f) for f in files)
    rows = spark.read.parquet(path).count()
    n_out = max(1, math.ceil(rows / target_rows))
    if len(files) <= n_out:
        return CompactionStats(len(files), len(files), total)

    _swap_in(spark, path, spark.read.parquet(path), n_out)
    return CompactionStats(len(files), len(_parquet_files(path)), total)


def vacuum_swap_dirs(path: str, min_age_s: float = 0.0) -> int:
    """Retention sweep for rewrite leftovers (the VACUUM to
    :func:`compact_parquet_dir`'s OPTIMIZE): remove ``._compact-*``
    (half-written rewrite) and ``._old-*`` (superseded data a crash
    stranded mid-swap) sibling directories of ``path`` whose mtime is
    at least ``min_age_s`` old.  Returns the number removed.

    This is the lakehouse VACUUM contract scoped to this module's swap
    scheme: only UNREFERENCED directories (the two reserved suffixes)
    are candidates — the live dataset directory is never touched — and
    the retention clock protects a rewrite that is still in flight
    (its temp dir is younger than the retention), exactly why Delta
    refuses VACUUM retention below its default window.
    """
    import time

    target = path.rstrip("/")
    parent, base = os.path.split(os.path.abspath(target))
    now = time.time()
    removed = 0
    for entry in os.listdir(parent):
        if not (
            entry.startswith(f"{base}._compact-")
            or entry.startswith(f"{base}._old-")
        ):
            continue
        full = os.path.join(parent, entry)
        if not os.path.isdir(full):
            continue
        if now - os.path.getmtime(full) >= min_age_s:
            shutil.rmtree(full)
            removed += 1
    return removed
