"""Deterministic training-shard layout for dataset export.

A training run doesn't read a table — it reads SHARDS: fixed-count,
near-equal files a data loader can assign to workers, with stable
membership so a resumed or re-sharded job sees the same split.
Reference-scope parity: the reference exports curated tables to GCS
for downstream consumers (sql/export/*); this is the export shape an
LLM data loader actually consumes.

Layout: ``out_dir/shard=K/*.parquet`` (hive-partitioned), one file
per shard, membership = ``pmod(xxhash64(id), n_shards)`` — a pure
function of the row id, so it is reproducible across runs, Spark
versions, and input partitionings (no RNG, no round-robin). A
``_shards.json`` manifest records per-shard row counts/bytes (and an
optional per-shard sum, e.g. token counts) from parquet footers — the
loader can plan epochs without opening data files.

Scale: one shuffle (repartition on the shard id) and one write pass;
each of the ``n_shards`` tasks writes exactly its own file. Reading
one shard is partition-pruned to that directory.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str,
    sort_within: list[str] | None = None,
    sum_col: str | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` deterministic hash shards;
    returns the manifest (also persisted as ``_shards.json``).
    ``sort_within`` orders rows inside each shard (e.g. by length for
    bucketed batching); ``sum_col`` adds a per-shard sum (e.g. token
    counts) to the manifest."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    ).repartition(n_shards, "shard")
    if sort_within:
        sharded = sharded.sortWithinPartitions("shard", *sort_within)
    if sum_col is not None:
        # cache so write + per-shard sums are one source scan (and
        # the sums describe exactly the rows written, even over a
        # mutable source)
        sharded = sharded.persist()
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_dir)

    import pyarrow.parquet as pq

    shards: dict[str, dict] = {}
    for entry in sorted(os.listdir(out_dir)):
        if not entry.startswith("shard="):
            continue
        k = entry.split("=", 1)[1]
        rows = 0
        size = 0
        files = []
        # deterministic file names: Spark's part-...-<task-uuid> names
        # differ run to run; rename so the same input produces a
        # byte-identical layout and manifest (reproducible exports)
        originals = sorted(
            n
            for n in os.listdir(os.path.join(out_dir, entry))
            if n.endswith(".parquet")
        )
        for i, orig in enumerate(originals):
            name = f"part-{i:05d}.parquet"
            if orig != name:
                os.replace(
                    os.path.join(out_dir, entry, orig),
                    os.path.join(out_dir, entry, name),
                )
            p = os.path.join(out_dir, entry, name)
            rows += pq.ParquetFile(p).metadata.num_rows
            size += os.path.getsize(p)
            files.append(name)
        shards[k] = {"rows": rows, "bytes": size, "files": files}
    # a fixed-count layout promises ALL n_shards entries — a hash
    # bucket left empty on small data still gets a manifest row (and
    # read_shard returns a typed empty frame for it), so a loader
    # planning n workers never hits a missing key
    for k in range(n_shards):
        shards.setdefault(str(k), {"rows": 0, "bytes": 0, "files": []})
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "assignment": "pmod(xxhash64(id), n_shards)",
        "total_rows": sum(s["rows"] for s in shards.values()),
        # the data schema (sans the shard key): read_shard's typed
        # empty frame for a zero-row bucket needs it even when NO
        # bucket materialized on disk (fully empty export)
        "schema": df.schema.json(),
        "shards": shards,
    }
    if sum_col is not None:
        sums = {
            str(r["shard"]): r["s"]
            for r in sharded.groupBy("shard")
            .agg(F.sum(sum_col).alias("s"))
            .collect()
        }
        sharded.unpersist()
        for k in shards:
            shards[k][f"sum_{sum_col}"] = sums.get(k, 0)
    with open(os.path.join(out_dir, "_shards.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def write_training_shards_from_table(
    spark: SparkSession,
    table,
    out_dir: str,
    n_shards: int,
    id_col: str,
    tag: str | None = None,
    snapshot_id: int | None = None,
    **kwargs,
) -> dict:
    """Export a lakehouse snapshot as training shards — ``table`` is
    a ``LakehouseTable``; pin the input with ``tag`` (snapshot tags
    are GC-protected, so the export stays reproducible even after
    expiry) or an explicit ``snapshot_id``; default latest.

    "training set v3" becomes ONE call: tag v3 + this export. The
    manifest records the resolved ``source`` (table path, tag,
    snapshot id), and because shard membership is a pure hash of the
    id and data files are immutable, the SAME tag always produces a
    byte-identical ``_shards.json``."""
    if tag is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or tag, not both")
        tags = table.tags()
        if tag not in tags:
            raise ValueError(f"tag {tag!r} not found")
        resolved = tags[tag]
    elif snapshot_id is not None:
        resolved = snapshot_id
    else:
        resolved = table.current_snapshot_id()
    df = table.read(spark, snapshot_id=resolved)
    manifest = write_training_shards(
        df, out_dir, n_shards, id_col, **kwargs
    )
    manifest["source"] = {
        "table": table.path,
        "tag": tag,
        "snapshot_id": resolved,
    }
    with open(os.path.join(out_dir, "_shards.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def read_shard(spark: SparkSession, out_dir: str, shard: int) -> DataFrame:
    """One shard's rows — a directory-pruned read, never a full-
    dataset scan. A shard with zero rows (hash bucket empty on small
    data) has no directory on disk; return a typed empty frame with
    the dataset's schema instead of raising."""
    path = os.path.join(out_dir, f"shard={shard}")
    if os.path.isdir(path):
        return spark.read.parquet(path)
    # typed empty frame from the manifest's recorded schema — works
    # even when the whole export is empty (zero directories on disk,
    # where a footer-based inference would raise); older manifests
    # without a schema fall back to footer inference
    manifest = shard_manifest(out_dir)
    if manifest.get("schema"):
        import json as _json

        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(_json.loads(manifest["schema"]))
        )
    base = spark.read.parquet(out_dir).drop("shard")
    return spark.createDataFrame([], base.schema)


def shard_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "_shards.json")) as fh:
        return json.load(fh)
