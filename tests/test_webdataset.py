"""WebDataset tar shard sink (sources/webdataset.py): byte-level pinning
the SQL oracle can't do — tarfile read-back of member names/contents,
run-to-run byte identity, and the closed-form USTAR size law.
"""

from __future__ import annotations

import io
import tarfile

import pytest
from pyspark.sql import functions as F

from polars_sim_spark.sources.webdataset import pack_webdataset_shards


def _docs(spark, n=25):
    rows = [(i, f"text body {i} " + "x" * (i * 37 % 900), f"src{i % 3}") for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_tar_read_back_members_and_contents(spark):
    df = _docs(spark)
    out = pack_webdataset_shards(
        df,
        id_col="doc_id",
        members=[("txt", "text"), ("src", "source")],
        docs_per_shard=10,
        keep_tar=True,
    ).collect()
    assert sum(r.n_samples for r in out) == 25
    seen = {}
    for r in out:
        assert r.n_bytes == len(r.tar)
        assert r.n_bytes % 10240 == 0  # record-size padding
        with tarfile.open(fileobj=io.BytesIO(bytes(r.tar))) as tf:
            names = tf.getnames()
            # members come in (id, suffix) order, two per sample
            assert len(names) == 2 * r.n_samples
            for m in tf.getmembers():
                assert m.mtime == 0 and m.uid == 0 and m.gid == 0
                seen[m.name] = tf.extractfile(m).read().decode("utf-8")
    expected = {r.doc_id: (r.text, r.source) for r in df.collect()}
    assert len(seen) == 50
    for doc_id, (text, source) in expected.items():
        assert seen[f"{doc_id}.txt"] == text
        assert seen[f"{doc_id}.src"] == source


def test_run_to_run_byte_identity(spark):
    df = _docs(spark, 30)
    kw = dict(id_col="doc_id", members=[("txt", "text")], docs_per_shard=7)
    a = {r.shard_id: r.sha256 for r in pack_webdataset_shards(df, **kw).collect()}
    b = {r.shard_id: r.sha256 for r in pack_webdataset_shards(df, **kw).collect()}
    assert a == b and len(a) == 5  # ceil(30/7)


def test_closed_form_size_matches(spark):
    # The oracle's USTAR size law, checked in Python against real bytes.
    df = _docs(spark, 12)
    out = pack_webdataset_shards(
        df,
        id_col="doc_id",
        members=[("txt", "text"), ("src", "source")],
        docs_per_shard=100,
        keep_tar=True,
    ).collect()
    assert len(out) == 1
    r = out[0]
    sizes = df.select(
        F.expr("octet_length(text)").alias("ob"), F.expr("octet_length(source)").alias("os")
    ).collect()
    raw = sum(1024 + ((x.ob + 511) // 512) * 512 + ((x.os + 511) // 512) * 512 for x in sizes)
    assert r.n_bytes == ((raw + 1024 + 10239) // 10240) * 10240


def test_rejects_bad_args(spark):
    df = _docs(spark, 3)
    with pytest.raises(ValueError):
        pack_webdataset_shards(df, id_col="doc_id", members=[], docs_per_shard=5)
    with pytest.raises(ValueError):
        pack_webdataset_shards(df, id_col="doc_id", members=[("txt", "text")], docs_per_shard=0)
