"""Installer for the vendored minimal protobuf runtime.

``transformWithStateInPandas`` is the last declared surface of this
engine whose EXECUTION needs a package the container lacks: the state-v2
Python worker speaks protobuf to the JVM state server
(``pyspark/sql/streaming/stateful_processor_api_client.py`` imports the
generated ``StateMessage_pb2``, which imports ``google.protobuf``).
``vendor/google/protobuf`` in this repo is a clean-room implementation
of exactly the runtime subset that import chain needs (public wire
format; see ``vendor/google/protobuf/internal/pshim.py``).

:func:`ensure_protobuf` makes ``google.protobuf`` importable — in THIS
process (sys.path) and in Spark's Python WORKER processes (PYTHONPATH,
which must therefore be set before the first SparkSession/JVM launch;
the JVM snapshots the driver environment at startup and passes it to
the workers it forks).  A real protobuf installation always wins: the
vendor path is only appended when the import fails.
"""

from __future__ import annotations

import importlib.util
import os
import sys

VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "vendor",
)


def _find_protobuf():
    try:
        return importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:  # no `google` parent package at all
        return None


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.
    Returns True iff the runtime in use is the vendored shim."""
    spec = _find_protobuf()
    if spec is not None:
        return "vendor" in (spec.origin or "")
    if VENDOR_DIR not in sys.path:
        sys.path.append(VENDOR_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    if VENDOR_DIR not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{existing}{os.pathsep}{VENDOR_DIR}" if existing else VENDOR_DIR
        )
    importlib.invalidate_caches()
    if _find_protobuf() is None:
        raise ImportError(f"vendored protobuf not importable from {VENDOR_DIR}")
    return True
