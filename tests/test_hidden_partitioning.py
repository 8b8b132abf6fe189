"""Hidden partitioning (F32; Iceberg partition transforms): the spec
can be a TRANSFORM of a column — days(ts)/months(ts)/hours(ts),
bucket(N,col), truncate(W,col). The derived value exists only in the
hive path: data files don't store it, reads never surface it, and
predicates on the SOURCE column prune the derived directories — the
user never has to know the table's layout (Iceberg's signature design
point; the reference's BigQuery tables expose the same idea as
date(ts) time-partitioning).
"""

from __future__ import annotations

import datetime
import os
import zlib

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
    LakehouseTable,
    _parse_spec_entry,
)


def _events(spark, n=48, start_id=0):
    rows = [
        (
            start_id + i,
            datetime.datetime(2024, 1, 1 + i // 24, i % 24, 30),
            f"u{i % 7}",
            float(i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "id long, ts timestamp, user string, v double"
    )


def test_days_transform_layout_and_hidden_read(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["days(ts)"])
    t.append(_events(spark))
    files = t.snapshots[-1]["files"]
    assert all("p_ts_day=" in f for f in files)
    days = {f.split("p_ts_day=")[1].split(os.sep)[0] for f in files}
    assert days == {"2024-01-01", "2024-01-02"}
    out = t.read(spark)
    # hidden: the derived column never surfaces
    assert set(out.columns) == {"id", "ts", "user", "v"}
    assert out.count() == 48
    # data files do not store the derived column
    import pyarrow.parquet as pq

    assert "p_ts_day" not in pq.ParquetFile(files[0]).schema_arrow.names


def test_days_pruning_from_source_predicate(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["days(ts)"])
    t.append(_events(spark))
    all_files = t.snapshots[-1]["files"]
    lo = datetime.datetime(2024, 1, 2, 0, 0)
    hi = datetime.datetime(2024, 1, 2, 23, 59)
    kept = t.pruned_files({"ts": (lo, hi)})
    assert kept and len(kept) < len(all_files)
    assert all("p_ts_day=2024-01-02" in f for f in kept)
    got = t.scan(spark, ranges={"ts": (lo, hi)})
    assert got.count() == 24
    # ISO-string bounds prune identically
    kept2 = t.pruned_files({"ts": ("2024-01-02 00:00:00", "2024-01-02 23:59:59")})
    assert set(kept2) == set(kept)


def test_bucket_transform_prunes_point_lookups(spark, tmp_path):
    t = LakehouseTable(
        str(tmp_path / "t"), partition_by=["bucket(8,user)"]
    )
    t.append(_events(spark))
    all_files = t.snapshots[-1]["files"]
    assert all("p_user_bucket8=" in f for f in all_files)
    kept = t.pruned_files({"user": ("u3", "u3")})
    assert kept and len(kept) < len(all_files)
    want = str(zlib.crc32(b"u3") % 8)
    assert all(f"p_user_bucket8={want}" in f for f in kept)
    assert t.scan(spark, ranges={"user": ("u3", "u3")}).count() == 7
    # a RANGE on a bucketed column cannot prune: conservative keep-all
    assert len(t.pruned_files({"user": ("u0", "u9")})) == len(all_files)


def test_truncate_transform(spark, tmp_path):
    t = LakehouseTable(
        str(tmp_path / "t"), partition_by=["truncate(2,user)"]
    )
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alto"), (3, "beta")], "id long, user string"
    )
    t.append(df)
    files = t.snapshots[-1]["files"]
    pre = {f.split("p_user_truncate2=")[1].split(os.sep)[0] for f in files}
    assert pre == {"al", "be"}
    kept = t.pruned_files({"user": ("alpha", "alto")})
    assert all("p_user_truncate2=al" in f for f in kept)
    assert t.scan(spark, ranges={"user": ("alpha", "alto")}).count() == 2


def test_hidden_composes_with_identity_and_evolution(spark, tmp_path):
    t = LakehouseTable(
        str(tmp_path / "t"), partition_by=["user", "days(ts)"]
    )
    t.append(_events(spark, n=24))
    t.evolve_partition_spec(["months(ts)"])
    t.append(_events(spark, n=24, start_id=1000))
    out = t.read(spark)
    assert out.count() == 48
    assert set(out.columns) == {"id", "ts", "user", "v"}
    # old vintage prunes via days, new via months, both from ts
    lo = datetime.datetime(2024, 1, 1)
    hi = datetime.datetime(2024, 1, 1, 23, 59)
    assert (
        t.scan(spark, ranges={"ts": (lo, hi)}).count()
        == out.where(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
        ).count()
    )
    # identity col still prunes exactly on the old vintage
    kept = t.pruned_files({"user": ("u1", "u1")})
    old_kept = [f for f in kept if "user=" in f]
    assert all("user=u1" in f for f in old_kept)


def test_mor_delete_on_hidden_partitioned_table(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["days(ts)"])
    t.append(_events(spark))
    t.delete_where(spark, "user = 'u2'", mode="merge-on-read")
    out = t.read(spark)
    assert out.where("user = 'u2'").count() == 0
    assert out.count() == 41
    t.materialize_deletes(spark)
    assert t.read(spark).count() == 41
    assert set(t.read(spark).columns) == {"id", "ts", "user", "v"}


def test_transform_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="needs a width"):
        _parse_spec_entry("bucket(id)")
    with pytest.raises(ValueError, match="takes one column"):
        _parse_spec_entry("days(3,ts)")
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["days(ts)"])
    t.append(_events(spark, n=4))
    with pytest.raises(ValueError, match="not in schema"):
        t.evolve_partition_spec(["days(nope)"])
    # derived-name collision with a data column
    t2 = LakehouseTable(str(tmp_path / "t2"))
    t2.append(
        spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1), "x")],
            "id long, ts timestamp, p_ts_day string",
        )
    )
    with pytest.raises(ValueError, match="collide"):
        t2.evolve_partition_spec(["days(ts)"])


def test_bucket_pruning_skips_unreplicable_renderings(spark, tmp_path):
    # str(v) in Python and CAST(v AS STRING) in Spark diverge for
    # floats/bools — pruning must keep all files rather than hash a
    # different rendering into the wrong bucket
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["bucket(4,v)"])
    t.append(
        spark.createDataFrame(
            [(1, 1e-07), (2, 0.5), (3, 2.0)], "id long, v double"
        )
    )
    # footer stats on v may legitimately prune; the regression was the
    # bucket transform hashing Python's '1e-07' into the WRONG bucket
    # and dropping the file that CONTAINS the row
    assert t.scan(spark, ranges={"v": (1e-07, 1e-07)}).count() == 1
    # int keys DO prune (rendering matches)
    t2 = LakehouseTable(
        str(tmp_path / "t2"), partition_by=["bucket(4,id)"]
    )
    t2.append(spark.createDataFrame([(i,) for i in range(20)], "id long"))
    kept2 = t2.pruned_files({"id": (7, 7)})
    assert len(kept2) < len(t2.snapshots[-1]["files"])
    assert t2.scan(spark, ranges={"id": (7, 7)}).count() == 1


def test_tz_aware_bounds_normalize_to_utc(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["days(ts)"])
    t.append(_events(spark))
    aware_lo = datetime.datetime(
        2024, 1, 2, 14, 0, tzinfo=datetime.timezone(datetime.timedelta(hours=14))
    )  # == 2024-01-02 00:00 UTC
    aware_hi = datetime.datetime(
        2024, 1, 3, 13, 59, tzinfo=datetime.timezone(datetime.timedelta(hours=14))
    )  # == 2024-01-02 23:59 UTC
    kept = t.pruned_files({"ts": (aware_lo, aware_hi)})
    assert kept and all("p_ts_day=2024-01-02" in f for f in kept)


def test_schema_cannot_reuse_retired_derived_name(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["days(ts)"])
    t.append(_events(spark, n=4))
    t.evolve_partition_spec(None)
    bad = _events(spark, n=2, start_id=100).withColumn(
        "p_ts_day", F.lit("x")
    )
    with pytest.raises(ValueError, match="derived names"):
        t.append(bad)
    # old rows must never surface the hidden path value
    assert set(t.read(spark).columns) == {"id", "ts", "user", "v"}


def test_zero_width_transform_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="width must be"):
        _parse_spec_entry("bucket(0,user)")
    with pytest.raises(ValueError, match="width must be"):
        _parse_spec_entry("truncate(0,user)")


def test_branch_first_commits_seed_transform_registry(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["days(ts)"])
    t.create_branch("b")
    t.append_to_branch("b", _events(spark))
    t.fast_forward("b")
    assert "p_ts_day" in t._read_manifest()["partition_transforms"]
    lo = datetime.datetime(2024, 1, 2)
    hi = datetime.datetime(2024, 1, 2, 23, 59)
    kept = t.pruned_files({"ts": (lo, hi)})
    assert kept and len(kept) < len(t.snapshots[-1]["files"])
    assert t.scan(spark, ranges={"ts": (lo, hi)}).count() == 24


def test_truncate_prunes_one_sided_ranges(spark, tmp_path):
    t = LakehouseTable(
        str(tmp_path / "t"), partition_by=["truncate(2,user)"]
    )
    t.append(
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "gamma")],
            "id long, user string",
        )
    )
    all_files = t.snapshots[-1]["files"]
    kept = t.pruned_files({"user": ("g", None)})
    assert len(kept) < len(all_files)
    assert all("p_user_truncate2=ga" in f for f in kept)
    assert t.scan(spark, ranges={"user": ("g", None)}).count() == 1


def test_compact_preserves_hidden_layout(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["days(ts)"])
    t.append(_events(spark, n=24))
    t.append(_events(spark, n=24, start_id=1000))
    before = t.read(spark).count()
    t.compact(spark, target_files=2)
    files = t.snapshots[-1]["files"]
    assert all("p_ts_day=" in f for f in files)
    assert t.read(spark).count() == before
