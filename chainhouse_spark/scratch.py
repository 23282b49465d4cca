"""Process-scoped scratch directories with guaranteed cleanup.

Several queries materialize intermediate at-rest state (IVF partitioned
indexes, training shards, streaming landing/checkpoint dirs). A bare
`tempfile.mkdtemp` leaks one directory per call in a resident session
(ADVICE r04); every site now allocates through `scratch_dir`, which
registers a single atexit sweep of everything it handed out.

The dirs still live under the system temp root (driver-local scratch, the
same place Spark spills); at real scale these would be explicit
warehouse/checkpoint URIs supplied by the caller — the helper is the
local-session convenience path only.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ALLOCATED: list[str] = []
_REGISTERED = False


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit."""
    global _REGISTERED
    d = tempfile.mkdtemp(prefix=prefix)
    _ALLOCATED.append(d)
    if not _REGISTERED:
        atexit.register(_cleanup)
        _REGISTERED = True
    return d


def _cleanup() -> None:
    for d in _ALLOCATED:
        shutil.rmtree(d, ignore_errors=True)
    _ALLOCATED.clear()
