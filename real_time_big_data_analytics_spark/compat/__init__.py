"""Environment-compat shims. Currently: the pure-Python protobuf
runtime subset (purepb/) that unblocks Spark's transformWithState
Python state client in containers without google.protobuf."""

from __future__ import annotations

import os
import sys

PUREPB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "purepb")


def enable_protobuf_shim() -> bool:
    """Make ``google.protobuf`` importable via the pure-Python shim —
    ONLY when the real library is absent (never shadow a real
    install). Prepends the shim dir to BOTH this interpreter's
    ``sys.path`` and ``os.environ['PYTHONPATH']``; the latter matters
    because Spark's python workers (including the transformWithState
    state-server runner) are separate processes spawned by the JVM,
    which inherits the driver environment — so this must run BEFORE
    the SparkSession/JVM starts to reach them. Returns True when the
    shim (or a real protobuf) is importable afterwards."""
    try:
        import google.protobuf  # noqa: F401

        return True  # real library (or already-active shim): hands off
    except ImportError:
        pass
    if PUREPB_DIR not in sys.path:
        sys.path.insert(0, PUREPB_DIR)
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if PUREPB_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            PUREPB_DIR + (os.pathsep + os.environ["PYTHONPATH"])
            if os.environ.get("PYTHONPATH")
            else PUREPB_DIR
        )
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
