"""PySpark worker daemon with the scientific stack preloaded (guide
§4.5 — heavyweight init once, amortized over every worker).

Stock PySpark forks Python workers from a daemon process that imports
only pyspark itself; every forked worker then imports pandas / numpy /
pyarrow — and the operator module its function references — from
scratch.  A pipelined chain of N ``mapInPandas`` nodes holds N live
workers PER TASK, so the first query with a multi-stage Python
pipeline after a cold (or killed) pool spawns 2-3× ``defaultParallelism``
workers at once; under that concurrent burst each import chain took
seconds, and the burst landed inside the timed query
(``multimodal_media_meta`` measured 14.5-28.5 s across four full bench
runs with the idle pool at 3-5 workers immediately before it, vs
2.3-2.7 s with a warm pool — optimization round 14).

Importing the stack HERE, before ``pyspark.daemon``'s accept/fork loop
starts, makes every forked worker inherit the ready modules via
copy-on-write: spawn cost collapses to the fork itself, and the
modules' memory pages are SHARED across the whole pool instead of
duplicated per worker (~150 MB × pool size reclaimed).  This is the
documented use of ``spark.python.daemon.module`` (set in
``session.py``; opt out with ``SPARK_GRAFT_NO_DAEMON_PRELOAD=1``).

Fork-safety: the imports create no Python threads, and numpy's bundled
OpenBLAS (≥0.3) re-initializes its native thread pool via
``pthread_atfork``, so BLAS-backed ops remain safe in forked children
— verified by the full test suite and the media/ANN worker paths
running under this daemon.

The repo operator import pulls the package's operator surface
(multimodal decode tables included — their build is the import-time
cost round 14 Change 3 moved out of the batch loop) with no Spark
session or JVM interaction at import time.
"""

# The preload is an OPTIMIZATION, never a requirement: a broken import
# in the worker environment (stale wheel, missing native lib) must
# degrade to stock-daemon behavior — workers re-import per fork as
# before — instead of killing every Python task in the session with an
# opaque daemon-startup error. SPARK_GRAFT_NO_DAEMON_PRELOAD therefore
# stays a perf knob, not a recovery requirement (round-15 ADVICE).
try:
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    import polars_sim_spark.operators.multimodal  # noqa: F401
except Exception as _preload_err:  # pragma: no cover - env-dependent
    import sys as _sys

    print(
        f"polars_sim_spark.worker_preload: preload skipped ({_preload_err!r}); "
        "workers fall back to per-fork imports",
        file=_sys.stderr,
    )

import pyspark.daemon as _daemon

if __name__ == "__main__":
    _daemon.manager()
