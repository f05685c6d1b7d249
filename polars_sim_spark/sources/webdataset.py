"""WebDataset-style tar shard sink — deterministic USTAR archives built
distributedly, one task per shard.

WebDataset (public convention: tar archives of ``{key}.{suffix}``
members, consumed sequentially by training loaders) is the de-facto
container for multimodal training corpora.  The reference has no sink
formats at all (its one operator returns a DataFrame, reference
``python/polars_sim/dataframe/join.py:15-30``); this extends the
engine's curation surface the same way ``operators/curation.pack_shards``
did for token-budget packing — and reuses exactly that assignment:
shards are ``docs_per_shard`` consecutive samples in the deterministic
global order ``(md5-part of id, id)``, so the assignment is reproducible
in any SQL engine.

Determinism contract (what makes the output testable byte-for-byte):

* USTAR format, mtime=0, uid=gid=0, uname=gname="", mode 0644;
* members emitted in (id, suffix) order within a shard;
* string payloads encode UTF-8; binary payloads pass through.

Because USTAR overhead is closed-form — 512-byte header + payload
padded to 512 per member, 1024 zero bytes at end-of-archive, archive
padded to the 10240-byte record size — the per-shard byte size is
computable in pure SQL, which is how the contract query's DuckDB oracle
verifies (shard_id, n_samples, n_bytes) without being able to build a
tar itself.  The tar BYTES are pinned by tests/test_webdataset.py
(tarfile read-back + run-to-run identity).

Scale: one ``applyInPandas`` task per shard holds ``docs_per_shard``
samples in memory — bounded state by construction; shard assignment is
the two-level cumsum (no global window).  Writing the archives is
``result.write.parquet`` (tar bytes as a binary column) or any
foreachPartition uploader; the build itself never funnels through the
driver.
"""

from __future__ import annotations

import hashlib
import io
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_SCHEMA = "shard_id long, n_samples long, n_bytes long, sha256 string"


def _build_tar(pdf, id_col: str, members: list[tuple[str, str]]) -> tuple[bytes, int]:
    pdf = pdf.sort_values(id_col)
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for _, row in pdf.iterrows():
            key = row[id_col]
            for suffix, col in members:
                payload = row[col]
                if payload is None:
                    payload = b""
                elif isinstance(payload, str):
                    payload = payload.encode("utf-8")
                else:
                    payload = bytes(payload)
                info = tarfile.TarInfo(name=f"{key}.{suffix}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(payload))
    return bio.getvalue(), len(pdf)


def pack_webdataset_shards(
    df: DataFrame,
    *,
    id_col: str,
    members: list[tuple[str, str]],
    docs_per_shard: int = 100,
    num_parts: int = 16,
    keep_tar: bool = False,
) -> DataFrame:
    """(shard_id, n_samples, n_bytes, sha256[, tar]): deterministic tar
    shards of ``docs_per_shard`` samples each.

    ``members`` is an ordered list of ``(suffix, column)`` pairs — each
    sample contributes one ``{id}.{suffix}`` member per pair (string
    columns UTF-8-encoded, binary columns raw).  ``keep_tar=True`` adds
    the archive bytes as a ``tar`` binary column (drop it when only the
    manifest is needed — the column is the whole corpus).
    """
    if not members:
        raise ValueError("pack_webdataset_shards: members must be non-empty")
    if docs_per_shard < 1:
        raise ValueError(
            f"pack_webdataset_shards: docs_per_shard must be >= 1, got {docs_per_shard}"
        )
    from polars_sim_spark.operators.curation import pack_shards

    cols = [id_col] + [c for _, c in members]
    assigned = pack_shards(
        df.select(*cols).withColumn("__one", F.lit(1).cast("long")),
        id_col=id_col,
        token_col="__one",
        shard_tokens=docs_per_shard,
        num_parts=num_parts,
        out_col="__shard",
    )

    mem = list(members)
    schema = RESULT_SCHEMA + (", tar binary" if keep_tar else "")

    def build(key, pdf):
        tar_bytes, n = _build_tar(pdf, id_col, mem)
        row = {
            "shard_id": int(key[0]),
            "n_samples": int(n),
            "n_bytes": len(tar_bytes),
            "sha256": hashlib.sha256(tar_bytes).hexdigest(),
        }
        if keep_tar:
            row["tar"] = tar_bytes
        import pandas as pd

        return pd.DataFrame([row])

    return assigned.groupBy("__shard").applyInPandas(build, schema=schema)
