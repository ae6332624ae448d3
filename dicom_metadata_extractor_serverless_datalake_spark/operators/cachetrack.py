"""Operator-internal cache lifecycle (VERDICT r09 #2).

Several operators persist an intermediate frame that feeds multiple
consumers inside the ONE plan they return (the shingle-set frame both
sides of jaccard_verify's intersection join read, the MinHash signature
frame the estimate path scores against, containment's distinct-shingle
frame). They cannot unpersist before the caller's action runs — the
returned DataFrame still depends on the cached plan lazily — so in a
long-lived session those cached partitions accumulate. The query
harness clears them at query construction (queries/corpus.py), but a
direct library user driving ``TextCorpus.dedup_near`` has no such hook.

This module closes that gap without changing any operator's laziness:

- :func:`tracked_persist` is a drop-in for ``df.persist()``. When a
  :class:`CacheScope` is active on this thread it records the frame;
  with no scope active it degrades to a plain persist (standalone
  operator calls behave exactly as before).
- :class:`CacheScope` is a reentrant context manager facades hold for
  the lifetime of a pipeline chain. ``TextCorpus`` enters it around
  every operator call and shares ONE scope across ``_with``-derived
  stages, so ``free_intermediates()`` (or ``materialize()``, which
  pins the result first) releases every cache the whole chain
  accumulated in one call — after the caller's action, which is the
  earliest correct moment.

Unpersisting an already-unpersisted frame is a Spark no-op, so a scope
freeing a frame an operator also freed itself is harmless.

Threading contract (ADVICE r10): scope activation is THREAD-LOCAL —
``tracked_persist`` registers with the innermost scope entered *on the
calling thread*. A facade chain must therefore build its plans on the
thread that entered the scope (the normal case: ``TextCorpus`` enters
the scope inline around each operator call, so construction and
registration share one thread). Driving operator *construction* from a
worker thread while the scope was entered elsewhere degrades
``tracked_persist`` to a plain persist — no corruption, but that
frame escapes ``free_intermediates()``. Submitting Spark *actions*
from a thread pool is unaffected (registration happened at plan
construction). For multi-threaded construction, enter the corpus's
own ``_caches`` scope on each building thread.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCAL = threading.local()


def _stack() -> list["CacheScope"]:
    st = getattr(_LOCAL, "stack", None)
    if st is None:
        st = []
        _LOCAL.stack = st
    return st


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` that registers the frame with the innermost
    active :class:`CacheScope` (if any) so a facade can free it after
    materialization."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    st = _stack()
    if st:
        st[-1]._frames.append(out)
    return out


class CacheScope:
    """Collects frames persisted (via :func:`tracked_persist`) while the
    scope is entered; ``free()`` unpersists them all. Reentrant: a
    facade enters the same scope around each of its operator calls."""

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def __enter__(self) -> "CacheScope":
        _stack().append(self)
        return self

    def __exit__(self, *exc) -> bool:
        st = _stack()
        # remove the innermost occurrence (reentrant enters stack twice)
        for i in range(len(st) - 1, -1, -1):
            if st[i] is self:
                del st[i]
                break
        return False

    def __len__(self) -> int:
        return len(self._frames)

    def free(self, blocking: bool = False) -> int:
        """Unpersist every tracked frame; returns how many were freed."""
        n = len(self._frames)
        for df in self._frames:
            df.unpersist(blocking)
        self._frames.clear()
        return n
