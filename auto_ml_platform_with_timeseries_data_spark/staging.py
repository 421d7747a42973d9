"""Process-scoped staging directories for sink/round-trip queries.

Queries that exercise real on-disk formats (q146 xls, q149 streaming
sink, q151 csv, q153 shards, q157 compaction, ...) need scratch
directories. Raw ``tempfile.mkdtemp`` per invocation leaks: the
returned DataFrame reads the directory LAZILY, so the query can't
remove it before returning, and repeated bench/driver passes then
accumulate unbounded temp data (q157 alone rewrites the documents
table twice per call).

Contract here: every staging dir lives under ONE per-process root that
``atexit`` removes, and a stable ``tag`` maps to a stable path that is
WIPED before reuse — so disk usage is bounded by one copy per tag per
process no matter how many times the bench loops, and nothing survives
process exit. ``fresh=True`` yields a new subdirectory per call (for
memoized inputs whose path must not be recycled mid-process, e.g.
streaming checkpoints cached in ``_STAGE_CACHE``); those still vanish
with the root. Queries run sequentially under the driver/bench
harness, so tag reuse is not racy.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="sparkgraft_run_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def staging_dir(tag: str, fresh: bool = False) -> str:
    """A scratch directory under the atexit-cleaned per-process root.

    Stable mode (default): same tag → same path, emptied before each
    reuse. Fresh mode: a new unique subdirectory every call."""
    if fresh:
        return tempfile.mkdtemp(prefix=f"{tag}_", dir=_root())
    d = os.path.join(_root(), tag)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d
