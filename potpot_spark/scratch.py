"""Per-run scratch-dir registry (r3 verdict #6: no leaked /tmp dirs).

Sink/layout/format queries return DataFrames that read their written
files LAZILY, so a query can never rmtree its own output — the driver
or a test may collect the frame long after the function returned.  The
resolution: every scratch location lives under ONE per-process root,
and the root is removed at interpreter exit (after every lazy read has
happened).  A clean run leaves a /tmp delta of zero potpot_* dirs.

``scratch_dir(prefix)``   — fresh unique dir per call (mkdtemp semantics).
``scratch_path(name)``    — deterministic-within-the-run path for ops
                            that overwrite + reuse one location per
                            session to bound their on-disk footprint
                            (codec/versioned-snapshot sinks).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading

_LOCK = threading.Lock()
_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    with _LOCK:
        if _ROOT is None:
            _ROOT = tempfile.mkdtemp(prefix="potpot_run_")
            atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
        return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under the per-run root."""
    return tempfile.mkdtemp(prefix=prefix, dir=_root())


def scratch_path(name: str) -> str:
    """A deterministic (per run) scratch path under the per-run root;
    created on first use by whoever writes to it."""
    return os.path.join(_root(), name)
