"""WebDataset-style tar shard export/ingest for training pipelines.

The multimodal-training convention (webdataset.github.io; the format is
just POSIX tar): a dataset is a directory of ``shard-00000.tar`` files,
each holding samples as adjacent members ``<key>.<ext>`` — all members
sharing a key form one sample. Loaders stream shards sequentially, so
WHAT matters at scale is (a) contiguous, curriculum-preserving shard
slicing, (b) one writer task per shard (tar members must be laid down
serially), and (c) byte-deterministic output so re-runs are diffable.

The reference engine has no export surface like this (it serves bytes per
object, src/storage/backend/ — SURVEY §2.9); this is extension surface
for the training-data story, built Spark-first:

- ``write_webdataset_shards``: ``assign_shards`` (grouped prefix-sum
  global order — no single-task sort) slices the corpus into contiguous
  shards; ``groupBy(shard).applyInPandas`` makes each shard exactly one
  Arrow-batched task which streams its members into the tar via stdlib
  ``tarfile``. No driver data path — the driver only sees the returned
  manifest (one row per shard). Tar metadata (mtime/uid/gid) is zeroed so
  identical input ⇒ identical bytes.
- ``read_webdataset_shards``: ``binaryFile`` scan of the shard files +
  ``mapInPandas`` unpack — one task per shard, samples re-grouped by key.

A 100-TB export = n_shards sized so each tar lands ~1-10 GiB (loader
sweet spot); the only shuffle is the one repartition-by-shard.
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storage_spark.operators.ordering import assign_shards

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _to_bytes(v) -> bytes:
    if v is None:
        return b""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return str(v).encode("utf-8")


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    payload_cols: Sequence[str],
    n_shards: int,
    order_by: list[Column] | None = None,
    group_col: str | Column | None = None,
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard-%05d.tar`` WebDataset shards and
    return the manifest DataFrame (shard, path, n_samples, n_bytes).

    Each sample contributes one tar member per payload column, named
    ``<key>.<col>`` (binary columns raw, everything else UTF-8). Samples
    appear in global ``order_by`` order (default: ``key_col`` — pass a
    curriculum ordering to preserve it across shards), contiguous slices
    per shard. Writes are executor-side; re-running on identical input
    produces byte-identical tars (zeroed tar metadata, stable ordering).

    ``group_col`` is forwarded to ``assign_shards``' grouped prefix-sum
    (the leading order key must equal it) — at real scale pick a grouping
    whose largest group fits one task.

    ``out_dir`` must be a POSIX path mounted identically on every
    executor (NFS/local in tests, a shared mount on a cluster) — each
    shard task creates it if missing and writes its tar there via stdlib
    ``tarfile``. Object-store URIs raise up front; route those through a
    staging mount (or extend the writer with the Hadoop FS API).
    """
    # driver-side fail-fast: out_dir is a plain string — rejecting an
    # object-store URI here beats n_shards identical Py4J task failures
    # after the prefix-sum shuffle has already run
    if "://" in out_dir and not out_dir.startswith("file://"):
        raise ValueError(
            f"write_webdataset_shards needs a shared POSIX path, got "
            f"{out_dir!r} — stage to a mounted filesystem (or extend "
            "the writer through the Hadoop FS API for object stores)"
        )
    order = order_by or [F.col(key_col)]
    sharded = assign_shards(df, order, n_shards, group_col=group_col)
    cols = [key_col, "global_id", *payload_cols]
    payload = list(payload_cols)

    def _write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import os

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values("global_id")
        # tarfile.open() needs a POSIX path — create the directory on
        # THIS executor (every task may be first on its host) and fail
        # with a legible message on object-store URIs instead of the
        # opaque OSError tarfile would raise
        if "://" in out_dir and not out_dir.startswith("file://"):
            raise ValueError(
                f"write_webdataset_shards needs a shared POSIX path, got "
                f"{out_dir!r} — stage to a mounted filesystem (or extend "
                "the writer through the Hadoop FS API for object stores)"
            )
        local_dir = out_dir.removeprefix("file://")
        os.makedirs(local_dir, exist_ok=True)
        path = f"{local_dir}/shard-{shard:05d}.tar"
        n_bytes = 0
        # positional column access, NOT itertuples()._asdict(): pandas
        # renames keyword / non-identifier / underscore-leading column
        # names to _N in namedtuples, which would KeyError on perfectly
        # legal Spark column names like 'class' or 'content-type'
        keys_vals = pdf[key_col].tolist()
        col_vals = {col: pdf[col].tolist() for col in payload}
        with tarfile.open(path, "w") as tar:
            for i in range(len(pdf)):
                for col in payload:
                    data = _to_bytes(col_vals[col][i])
                    info = tarfile.TarInfo(name=f"{keys_vals[i]}.{col}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
                    n_bytes += len(data)
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "path": path,
                    "n_samples": len(pdf),
                    "n_bytes": n_bytes,
                }
            ]
        )

    return (
        sharded.select("shard", *cols)
        .groupBy("shard")
        .applyInPandas(_write_shard, MANIFEST_SCHEMA)
    )


SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("shard_path", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def read_webdataset_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """Ingest WebDataset shards: one row per tar member, with the sample
    key split off the member name (``<key>.<ext>`` → key, ext). One task
    per shard file (binaryFile scan keeps each tar whole); unpacking is
    an Arrow-batched mapInPandas, no driver data path."""
    blobs = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                with tarfile.open(fileobj=io.BytesIO(row.content)) as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        key, _, member = info.name.rpartition(".")
                        out.append(
                            {
                                "shard_path": row.path,
                                "key": key,
                                "member": member,
                                "content": tar.extractfile(info).read(),
                            }
                        )
            yield pd.DataFrame(
                out, columns=["shard_path", "key", "member", "content"]
            )

    return blobs.mapInPandas(_unpack, SAMPLE_SCHEMA)
