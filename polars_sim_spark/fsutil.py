"""Filesystem-scheme-aware helpers for index/marker existence checks.

Engine entry points that gate a build on a committed ``_SUCCESS`` marker
must resolve the marker through Hadoop's FileSystem API, not
``os.path.exists``: Spark writes through whatever filesystem the path's
scheme (or ``fs.defaultFS``) selects, so on HDFS/S3 a driver-local stat
is always False and the gate silently rebuilds the full index on every
call. Contract-query helpers that construct repo-local paths may keep
the cheap local stat; anything documented for production use goes
through here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def hadoop_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the filesystem its scheme selects
    (falling back to ``fs.defaultFS`` for scheme-less paths) — the same
    resolution Spark's own writers use, so a marker written by
    ``df.write`` is visible here on local disk, HDFS, and S3A alike."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def hadoop_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` through the same scheme resolution as
    :func:`hadoop_exists` (no-op if absent) — the remote-safe replacement
    for ``shutil.rmtree`` in build-gate recovery paths."""
    fs, hpath = _fs_and_path(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def hadoop_list_names(spark: SparkSession, path: str) -> list:
    """Child entry names (basenames) of directory ``path`` under the
    scheme-selected filesystem; [] if the directory is absent — the
    remote-safe replacement for ``os.listdir`` in sink bootstrap gates."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]
