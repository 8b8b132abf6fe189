"""Snapshot-versioned lakehouse tables (Iceberg semantics on plain
parquet + a JSON manifest).

Parity: the reference stores bronze/silver as BigQuery Iceberg tables
on GCS (terraform/bigquery_tables.tf, loader
services/loader/bigquery_manager.py creates/appends). This container
has no Iceberg runtime jar, so the same contract — atomic snapshot
commits, append/overwrite, time travel, small-file compaction,
snapshot expiry, schema-evolution on append — is implemented directly:

    table_dir/
      _manifest.json        # snapshot log (append-only commits)
      data/snap-000001/*.parquet
      data/snap-000002/*.parquet

A snapshot lists the parquet files that constitute the table at that
version; readers take the file list from the manifest (never directory
listing, so concurrent writers can't corrupt reads) — the same
metadata-driven-scan idea as Iceberg's manifest lists.

Scale notes: reads pass the explicit file list to spark.read.parquet →
partition pruning and pushdown work unchanged; compaction rewrites
files with coalesce to the target count without shuffling rows.
On a real deployment swap this module for Spark's Iceberg catalog
(spark.sql.catalog.* config) — the operator surface is identical.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.schema_evolution import (
    align_for_append,
    widening_plan,
)


class LakehouseTable:
    def __init__(self, path: str):
        self.path = path
        self.manifest_path = os.path.join(path, "_manifest.json")

    # ------------------------------------------------------------ manifest

    def _read_manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"snapshots": [], "schema": None}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        """Atomic manifest swap (write temp + rename)."""
        os.makedirs(self.path, exist_ok=True)
        tmp = self.manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)

    @property
    def snapshots(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    def current_snapshot_id(self) -> int | None:
        snaps = self.snapshots
        return snaps[-1]["id"] if snaps else None

    # ----------------------------------------------------------- writes

    def _write_data(self, df: DataFrame, snap_id: int) -> list[str]:
        out = os.path.join(self.path, "data", f"snap-{snap_id:06d}")
        df.write.mode("overwrite").parquet(out)
        return sorted(
            os.path.join(out, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )

    @staticmethod
    def _file_stats(files: list[str]) -> dict[str, dict[str, list]]:
        """Per-file column min/max from the parquet footers (numeric
        and string columns) — the manifest-level stats Iceberg keeps in
        its manifest files. Footer-only reads: no data pages touched,
        so stats collection is O(files), not O(rows)."""
        import pyarrow.parquet as pq

        stats: dict[str, dict[str, list]] = {}
        for path in files:
            meta = pq.ParquetFile(path).metadata
            per_col: dict[str, list] = {}
            for rg_i in range(meta.num_row_groups):
                rg = meta.row_group(rg_i)
                for c_i in range(rg.num_columns):
                    col = rg.column(c_i)
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo, hi = st.min, st.max
                    if not isinstance(lo, (int, float, str)) or isinstance(
                        lo, bool
                    ):
                        continue
                    name = col.path_in_schema
                    if name in per_col:
                        per_col[name] = [
                            min(per_col[name][0], lo),
                            max(per_col[name][1], hi),
                        ]
                    else:
                        per_col[name] = [lo, hi]
            stats[path] = per_col
        return stats

    def _next_id(self, manifest: dict) -> int:
        snaps = manifest["snapshots"]
        return (snaps[-1]["id"] + 1) if snaps else 1

    def append(self, df: DataFrame) -> int:
        """Append with loader-style schema evolution: incompatible
        columns raise; new/widenable columns are aligned."""
        manifest = self._read_manifest()
        if manifest["schema"] is not None:
            spark = df.sparkSession
            target = spark.read.parquet(*manifest["snapshots"][-1]["files"]) \
                if manifest["snapshots"] else None
            if target is not None:
                bad = [
                    p
                    for p in widening_plan(df, target)
                    if p["action"] == "incompatible"
                ]
                if bad:
                    raise ValueError(f"incompatible append: {bad}")
                df = align_for_append(df, target)
        snap_id_new = self._next_id(manifest)
        files = self._write_data(df, snap_id_new)
        manifest.setdefault("file_stats", {}).update(self._file_stats(files))
        prev = manifest["snapshots"][-1]["files"] if manifest["snapshots"] else []
        manifest["snapshots"].append(
            {
                "id": snap_id_new,
                "operation": "append",
                "ts": time.time(),
                "files": prev + files,
            }
        )
        manifest["schema"] = df.schema.json()
        self._commit(manifest)
        return snap_id_new

    def overwrite(self, df: DataFrame) -> int:
        manifest = self._read_manifest()
        snap_id = self._next_id(manifest)
        files = self._write_data(df, snap_id)
        manifest.setdefault("file_stats", {}).update(self._file_stats(files))
        manifest["snapshots"].append(
            {
                "id": snap_id,
                "operation": "overwrite",
                "ts": time.time(),
                "files": files,
            }
        )
        manifest["schema"] = df.schema.json()
        self._commit(manifest)
        return snap_id

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Small-file compaction: rewrite the current file set into
        ``target_files`` files (no shuffle — coalesce only) and commit
        as a 'replace' snapshot. Iceberg's rewrite_data_files."""
        manifest = self._read_manifest()
        if not manifest["snapshots"]:
            raise ValueError("empty table")
        df = spark.read.parquet(*manifest["snapshots"][-1]["files"])
        snap_id = self._next_id(manifest)
        files = self._write_data(df.coalesce(target_files), snap_id)
        manifest.setdefault("file_stats", {}).update(self._file_stats(files))
        manifest["snapshots"].append(
            {
                "id": snap_id,
                "operation": "replace",
                "ts": time.time(),
                "files": files,
            }
        )
        self._commit(manifest)
        return snap_id

    def merge(
        self, spark: SparkSession, source: DataFrame, keys: list[str]
    ) -> int:
        """MERGE (upsert) by key: source rows replace matching target
        rows; unmatched source rows are inserted (Iceberg
        MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT,
        copy-on-write path).

        Plan: target left-anti source-keys (drops rows being updated)
        ∪ source. One shuffle on the key for the anti join; at 100 TB
        the real Iceberg runtime would prune the rewrite to affected
        partitions — here the snapshot rewrite is whole-table, same
        semantics. Duplicate keys in source are rejected (Iceberg
        errors on multi-row matches too: nondeterministic update).
        """
        dup = (
            source.groupBy(*keys).count().where(F.col("count") > 1).limit(1)
        )
        if dup.count() > 0:
            raise ValueError(f"source has duplicate merge keys on {keys}")
        target = self.read(spark)
        kept = target.join(source.select(*keys), keys, "left_anti")
        merged = kept.unionByName(align_for_append(source, target))
        manifest = self._read_manifest()
        snap_id = self._next_id(manifest)
        files = self._write_data(merged, snap_id)
        manifest.setdefault("file_stats", {}).update(self._file_stats(files))
        manifest["snapshots"].append(
            {
                "id": snap_id,
                "operation": "merge",
                "ts": time.time(),
                "files": files,
            }
        )
        manifest["schema"] = merged.schema.json()
        self._commit(manifest)
        return snap_id

    def delete_where(self, spark: SparkSession, condition) -> int:
        """DELETE FROM ... WHERE condition (copy-on-write rewrite of
        the surviving rows; condition is a Column or SQL string)."""
        target = self.read(spark)
        if isinstance(condition, str):
            condition = F.expr(condition)
        remaining = target.where(~condition)
        manifest = self._read_manifest()
        snap_id = self._next_id(manifest)
        files = self._write_data(remaining, snap_id)
        manifest.setdefault("file_stats", {}).update(self._file_stats(files))
        manifest["snapshots"].append(
            {
                "id": snap_id,
                "operation": "delete",
                "ts": time.time(),
                "files": files,
            }
        )
        self._commit(manifest)
        return snap_id

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Drop old snapshot entries (and their no-longer-referenced
        data dirs); returns expired ids."""
        manifest = self._read_manifest()
        snaps = manifest["snapshots"]
        if len(snaps) <= keep_last:
            return []
        expired, kept = snaps[:-keep_last], snaps[-keep_last:]
        live = {f for s in kept for f in s["files"]}
        for s in expired:
            for f in s["files"]:
                if f not in live and os.path.exists(f):
                    os.remove(f)
        manifest["snapshots"] = kept
        if "file_stats" in manifest:
            manifest["file_stats"] = {
                f: st
                for f, st in manifest["file_stats"].items()
                if f in live
            }
        self._commit(manifest)
        return [s["id"] for s in expired]

    # ------------------------------------------------------------ reads

    def read(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        """Read latest or time-travel to a snapshot id."""
        snaps = self.snapshots
        if not snaps:
            raise ValueError(f"no snapshots in {self.path}")
        if snapshot_id is None:
            snap = snaps[-1]
        else:
            matches = [s for s in snaps if s["id"] == snapshot_id]
            if not matches:
                raise ValueError(f"snapshot {snapshot_id} not found")
            snap = matches[0]
        return spark.read.parquet(*snap["files"])

    def pruned_files(
        self,
        ranges: dict[str, tuple],
        snapshot_id: int | None = None,
    ) -> list[str]:
        """File-level skip list for range predicates: keep a file only
        if its footer [min, max] intersects every requested range.
        ``ranges`` maps column → (lo, hi), either bound None for open.
        Files without stats for a column are conservatively kept."""
        manifest = self._read_manifest()
        snaps = manifest["snapshots"]
        if not snaps:
            raise ValueError(f"no snapshots in {self.path}")
        snap = (
            snaps[-1]
            if snapshot_id is None
            else next(s for s in snaps if s["id"] == snapshot_id)
        )
        stats = manifest.get("file_stats", {})
        out = []
        for f in snap["files"]:
            fstats = stats.get(f, {})
            keep = True
            for col, (lo, hi) in ranges.items():
                if col not in fstats:
                    continue
                fmin, fmax = fstats[col]
                if (hi is not None and fmin > hi) or (
                    lo is not None and fmax < lo
                ):
                    keep = False
                    break
            if keep:
                out.append(f)
        return out

    def scan(
        self,
        spark: SparkSession,
        ranges: dict[str, tuple] | None = None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Read with manifest-level data skipping (Iceberg file
        pruning): files whose footer min/max can't satisfy ``ranges``
        are never opened — at 100 TB on time- or key-sorted data this
        is the difference between scanning a partition and scanning
        the table. The exact range filter is re-applied on the
        surviving rows, so results equal read()+filter regardless of
        how coarse the file stats are."""
        if not ranges:
            return self.read(spark, snapshot_id)
        files = self.pruned_files(ranges, snapshot_id)
        if not files:
            df = self.read(spark, snapshot_id)
        else:
            df = spark.read.parquet(*files)
        cond = F.lit(True)
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                cond = cond & (F.col(col) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(col) <= F.lit(hi))
        if not files:
            return df.where(cond).limit(0)
        return df.where(cond)

    def history(self) -> list[dict]:
        return [
            {k: s[k] for k in ("id", "operation", "ts")}
            for s in self.snapshots
        ]
