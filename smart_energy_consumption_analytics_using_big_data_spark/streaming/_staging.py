"""Testdata staging for the file stream source.

Spark's file stream source only accepts directories; the testdata
ships bare parquet files, so queries stage them into a temp directory
(the stand-in for the landing directory a real ingest would tail).
This is a TEST SHIM - production entry points receive real landing
directories and never touch this module.

Two leak guards (the naive mkdtemp-per-invocation copied files on
every call and left them behind):

* memoized per (prefix, source set): re-running the same query reuses
  the same staging dir instead of copying again;
* all staged dirs are removed at interpreter exit (atexit).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from pathlib import Path

_STAGED: dict[tuple, Path] = {}


def _cleanup() -> None:  # pragma: no cover - exercised at interpreter exit
    for path in _STAGED.values():
        shutil.rmtree(path, ignore_errors=True)
    _STAGED.clear()


atexit.register(_cleanup)


def staged_stream_dir(prefix: str, copies: dict[str, str]) -> str:
    """Return a directory containing ``{target_name: source_file}``
    copies, created once per distinct (prefix, copies) and removed at
    interpreter exit (memoized_landing provides the cache, the exit
    cleanup, and removal of a half-populated dir on copy failure)."""

    def build(staging: str) -> None:
        for target, source in copies.items():
            shutil.copy(source, Path(staging) / target)

    return memoized_landing(prefix, tuple(sorted(copies.items())), build)


def memoized_landing(prefix: str, key: tuple, builder) -> str:
    """Memoized landing-directory factory for the batch-staging
    helpers (stage_keyed_batches and friends): ``builder(dir)``
    populates a fresh mkdtemp dir exactly once per distinct
    (prefix, key); repeat calls — the registered q_stream_*_mb
    queries re-stage on every driver/bench invocation — reuse the
    same dir instead of writing another full copy of the events
    table, and every dir is removed at interpreter exit. Without
    this, repeated runs accumulated unbounded /tmp usage."""
    cache_key = (prefix, key)
    hit = _STAGED.get(cache_key)
    if hit is not None and hit.is_dir():
        return str(hit)
    staging = Path(tempfile.mkdtemp(prefix=prefix))
    try:
        builder(str(staging))
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    _STAGED[cache_key] = staging
    return str(staging)
