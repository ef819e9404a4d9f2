"""Training-corpus export: sharded JSONL with a verifiable manifest.

The delivery format LLM training stacks actually consume: N JSONL
shards of roughly equal size plus a ``manifest.json`` recording per-
shard row counts and byte sizes, so the consumer can (a) schedule one
reader per shard, (b) detect truncated/partial transfers, and (c)
reproduce the exact shard membership — assignment is the engine's
md5-bucket of the id (datapipe/splits.py convention), NOT Spark's
physical partitioning, so re-running the export on a differently
partitioned upstream produces byte-compatible shard membership.

Scale shape: one hash-repartition shuffle (the shard assignment) and a
streaming JSON write — no driver-side rows; the manifest is built from
filesystem metadata (file counts/lengths), which is partition-count
sized, not row sized.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _shard_col(id_col: str, n_shards: int, salt: str) -> F.Column:
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 7
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_shards),
    ).cast("int")


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "export",
) -> dict:
    """Write ``df`` as ``shard=K/*.json`` JSONL directories plus
    ``manifest.json``. Returns the manifest dict
    ``{n_rows, n_shards, shards: {K: {rows, bytes}}}``."""
    spark = df.sparkSession
    out = df.withColumn("shard", _shard_col(id_col, n_shards, salt))
    (
        out.repartition(n_shards, F.col("shard"))  # one file set per shard
        .write.partitionBy("shard")
        .mode("overwrite")
        .json(path)
    )
    # manifest from FS metadata + one count pass over the written data
    # (reading back what landed, not what we intended to write)
    written = spark.read.json(path)
    counts = {
        int(r["shard"]): int(r["rows"])
        for r in written.groupBy("shard").agg(F.count(F.lit(1)).alias("rows")).collect()
    }
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    sizes: dict[int, int] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("shard="):
            k = int(name.split("=", 1)[1])
            sizes[k] = sum(
                f.getLen()
                for f in fs.listStatus(st.getPath())
                if f.isFile() and not f.getPath().getName().startswith(("_", "."))
            )
    manifest = {
        "n_rows": sum(counts.values()),
        "n_shards": n_shards,
        "id_col": id_col,
        "salt": salt,
        "shards": {
            str(k): {"rows": counts.get(k, 0), "bytes": sizes.get(k, 0)}
            for k in range(n_shards)
        },
    }
    mpath = jvm.org.apache.hadoop.fs.Path(f"{path}/manifest.json")
    stream = fs.create(mpath, True)
    stream.write(bytearray(json.dumps(manifest, indent=1).encode()))
    stream.close()
    return manifest


def read_jsonl_shards(
    spark: SparkSession, path: str, verify: bool = True
) -> DataFrame:
    """Read an exported corpus back; with ``verify`` the row count is
    checked against the manifest (truncated-transfer detection)."""
    df = spark.read.json(f"{path}/shard=*/")
    if verify:
        # engine-native manifest read (works on any Hadoop FS; a py4j
        # byte-buffer read would not round-trip through the gateway)
        lines = [r[0] for r in spark.read.text(f"{path}/manifest.json").collect()]
        manifest = json.loads("\n".join(lines))
        actual = df.count()
        if actual != manifest["n_rows"]:
            raise ValueError(
                f"shard corpus at {path} has {actual} rows; manifest says "
                f"{manifest['n_rows']} — truncated or partially overwritten export"
            )
    return df
