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


_SHIPPED_APPS: set[str] = set()


def ensure_protobuf_on_workers(spark) -> None:
    """Make ``google.protobuf`` importable in every Python process an
    ALREADY-RUNNING session spawns (one whose JVM launched before
    :func:`ensure_protobuf` could seed the environment — e.g. the
    verify driver's vanilla session).  Two complementary channels:

    - ``sc.environment['PYTHONPATH']`` — travels in each Python
      function's envVars, which is what the TWS *driver worker*
      (``StreamingPythonRunner``) builds its interpreter env from;
      verified live: patching it post-launch fixes a session whose JVM
      env lacks the vendor path;
    - ``addPyFile`` of the vendored package zip — lands on ordinary
      task workers' sys.path.

    No-op when a real protobuf wheel exists."""
    if not ensure_protobuf():  # real runtime present everywhere
        return
    sc = spark.sparkContext
    env = sc.environment
    current = env.get("PYTHONPATH", "")
    if VENDOR_DIR not in current.split(os.pathsep):
        env["PYTHONPATH"] = (
            f"{VENDOR_DIR}{os.pathsep}{current}" if current else VENDOR_DIR
        )
    app = sc.applicationId
    if app in _SHIPPED_APPS:
        return
    import tempfile
    import zipfile

    zip_path = os.path.join(tempfile.gettempdir(), "mtmrf_protoshim.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(os.path.join(VENDOR_DIR, "google")):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        zf.write(full, os.path.relpath(full, VENDOR_DIR))
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    _SHIPPED_APPS.add(app)
