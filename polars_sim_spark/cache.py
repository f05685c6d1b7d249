"""Session-scoped cache registry.

Operators in this package ``persist()`` intermediate frames whose blocks
must outlive the operator call — the returned DataFrame's lineage still
references them, so the operator itself can never safely unpersist
(contrast ``dedup.remove_near_dups``, which localCheckpoints past its
postings and unpersists inline). In a one-shot job those blocks die with
the session; in a long-lived session (streaming, a notebook, a query
server) they would accumulate in executor storage memory until eviction
pressure.

The contract: every such persist is routed through :func:`track`, and the
session owner calls :func:`unpersist_all` whenever the frames returned by
prior operator calls are no longer needed (typically after their terminal
action). This frees exactly the blocks this package created — unlike
``spark.catalog.clearCache()`` it never touches caches the application
itself manages. Two caveats to that promise:

* operators only ever ``track`` frames DERIVED from caller input (a
  ``withColumn``/``select``/``distinct`` of it, never the caller's
  DataFrame object itself), and ``DataFrame.unpersist`` is non-cascading,
  so a cache the application holds on the same source is a separate
  CacheManager entry and survives ``unpersist_all``. If an application
  persists the *identical derived plan* an operator builds internally,
  Spark canonicalizes them to one entry and ``unpersist_all`` will drop
  it — pathological, but possible;
* the registry is guarded by a process-wide lock, so concurrent threads
  sharing one SparkSession may interleave ``track``/``unpersist_all``
  safely — but ``unpersist_all`` releases EVERY tracked frame, including
  those another thread still computes over (whose results then silently
  recompute from lineage). Scope one registry epoch per logical job if
  you run operators concurrently.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_LOCK = threading.Lock()


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK — spills rather than OOMs) and
    register it for :func:`unpersist_all`. Returns the persisted frame."""
    df = df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every frame this package cached since the last call.

    Safe to call at any time: results already materialized stay valid
    (unpersist only drops cached blocks; lineage recomputes on re-use).
    Returns the number of frames released.
    """
    with _LOCK:
        drained = list(_TRACKED)
        _TRACKED.clear()
    n = 0
    for df in drained:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            # A frame whose SparkSession already stopped has nothing to
            # release; never let cleanup raise.
            pass
    return n
