"""Environment compatibility shims.

``ensure_protobuf`` unblocks the ``transformWithState`` runtime on
containers that ship no ``protobuf`` wheel: the state server between
the JVM and the Python stateful-processor worker speaks protobuf
(``pyspark/sql/streaming/proto``), so without ``google.protobuf`` the
streaming runner crashes at query start.  Standard cluster images
ship protobuf with pyspark's connect extras; some dev containers
don't, but DO carry a vendored pure-Python copy inside other tooling
(e.g. the google-cloud-sdk app-engine platform dir).  This helper
finds such a copy and exposes it to BOTH the driver and the
JVM-spawned Python workers.

Call it BEFORE the SparkSession / JVM gateway is created: the worker
processes inherit the JVM's environment, which inherits the driver's
at gateway launch — mutating ``os.environ`` afterwards is invisible
to them.
"""

from __future__ import annotations

import importlib
import os
import sys

# Known vendored pure-Python protobuf locations, probed in order.
# Extend via the PROTOBUF_VENDOR_PATH environment variable.
_VENDOR_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/lib64/google-cloud-sdk/platform/google_appengine",
    "/opt/google-cloud-sdk/platform/google_appengine",
)

_probed: bool | None = None
# set when the import was satisfied by a vendored copy (vs a wheel)
_vendor_used: str | None = None


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable if at all possible.

    Returns True when protobuf is (or becomes) importable.  Order:

    1. Already installed -> nothing to do.
    2. A vendored copy from ``PROTOBUF_VENDOR_PATH`` or the known
       candidate dirs -> prepend to ``sys.path`` AND ``PYTHONPATH``
       (workers), and set the official
       ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch:
       pyspark's generated proto stubs may carry a different gencode
       major than the vendored runtime, and the pure-Python runtime
       handles the wire format of every message pyspark exchanges
       (verified end-to-end by tests/test_stateful_tws.py's
       cross-restart state test).

    Idempotent; the probe result is cached.
    """
    global _probed
    if _probed is not None:
        return _probed
    try:
        importlib.import_module("google.protobuf")
        _probed = True
        return True
    except ImportError:
        pass

    env_path = os.environ.get("PROTOBUF_VENDOR_PATH")
    candidates = ((env_path,) if env_path else ()) + _VENDOR_CANDIDATES
    for cand in candidates:
        if not cand or not os.path.isdir(os.path.join(cand, "google", "protobuf")):
            continue
        sys.path.insert(0, cand)
        try:
            importlib.import_module("google.protobuf")
        except ImportError:
            sys.path.remove(cand)
            importlib.invalidate_caches()
            continue
        # Workers are separate processes: they need the path and the
        # version-check bypass in their ENV, not just our sys.path.
        prev = os.environ.get("PYTHONPATH", "")
        if cand not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                cand + (os.pathsep + prev if prev else "")
            )
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        global _vendor_used
        _vendor_used = cand
        _probed = True
        return True
    _probed = False
    return False


def tws_runtime_executable(spark) -> bool:
    """Can ``transformWithState`` EXECUTE on this session — not just
    import on the driver?  The state-server worker is a separate
    process spawned by the JVM, so it sees the JVM's environment, not
    our ``sys.path``:

    - a real protobuf wheel: workers share site-packages -> yes;
    - a vendored copy: only if the JVM was launched AFTER
      ``ensure_protobuf`` exported PYTHONPATH (``get_spark`` does
      this; a session built elsewhere may not have) — verified by
      reading the JVM's actual environment, not assumed.
    """
    if not ensure_protobuf():
        return False
    if _vendor_used is None:
        return True
    try:
        jvm_pp = spark._jvm.java.lang.System.getenv("PYTHONPATH") or ""
    except Exception:
        return False
    return _vendor_used in jvm_pp.split(os.pathsep)
