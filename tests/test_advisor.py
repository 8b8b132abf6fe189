"""Stats-informed join advisor: decisions come from manifest
metadata (row counts, HLL NDV sketches, file sizes) and the chosen
strategy never changes results."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import advisor
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def _mk(spark, path, df):
    t = LakehouseTable(str(path))
    t.append(df)
    return t


def test_broadcast_advised_for_small_dim(spark, tmp_path):
    dim = _mk(
        spark,
        tmp_path / "dim",
        spark.range(50).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("name")
        ),
    )
    fact = _mk(
        spark,
        tmp_path / "fact",
        spark.range(5000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        ),
    )
    out, advice = advisor.join_with_advice(spark, fact, dim, "k")
    assert advice["strategy"] == "broadcast"
    assert advice["broadcast_side"] == "right"
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 5000


def test_salt_advised_for_hot_key(spark, tmp_path):
    # 5000 rows but only 2 distinct keys → rows/NDV = 2500 per key
    hot = _mk(
        spark,
        tmp_path / "hot",
        spark.range(5000).select(
            (F.col("id") % 2).alias("k"), F.col("id").alias("v")
        ),
    )
    other = _mk(
        spark,
        tmp_path / "oth",
        spark.range(2).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        ),
    )
    out, advice = advisor.join_with_advice(
        spark, hot, other, "k", broadcast_bytes=1, skew_rows_per_key=1000
    )
    assert advice["strategy"] == "salt"
    assert advice["salt_side"] in ("left", "right")
    # strategy-invariance: salted result equals the plain join
    plain = hot.read(spark).join(other.read(spark), "k")
    assert sorted(map(tuple, out.select("k", "v", "tag").collect())) == sorted(
        map(tuple, plain.select("k", "v", "tag").collect())
    )


def test_shuffle_default_with_uniform_keys(spark, tmp_path):
    a = _mk(
        spark,
        tmp_path / "a",
        spark.range(3000).select(F.col("id").alias("k"), F.col("id").alias("v")),
    )
    b = _mk(
        spark,
        tmp_path / "b",
        spark.range(3000).select(F.col("id").alias("k"), F.col("id").alias("w")),
    )
    out, advice = advisor.join_with_advice(
        spark, a, b, "k", broadcast_bytes=1, skew_rows_per_key=1000
    )
    assert advice["strategy"] == "shuffle"
    assert advice["bucket_hint"] is False  # far below the bucket bar
    assert out.count() == 3000
    # evidence trail: only the consulted side's NDV is looked up
    assert advice["inputs"]["rows"] == {"left": 3000, "right": 3000}
    assert list(advice["inputs"]["ndv_k"].values())[0] > 2500


def test_salt_demoted_for_outer_semantics(spark, tmp_path):
    """Salting flips join sides; a left join whose preserved side is
    NOT the salted one must degrade to shuffle, not silently preserve
    the wrong side."""
    hot = _mk(
        spark,
        tmp_path / "hot",
        spark.range(5000).select(
            (F.col("id") % 2).alias("k"), F.col("id").alias("v")
        ),
    )
    other = _mk(
        spark,
        tmp_path / "oth",
        spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("tag")),
    )
    # salt_side would be 'left' (hot) — a left join FROM other must
    # preserve other's unmatched keys 2..4, so salting is unusable
    out, advice = advisor.join_with_advice(
        spark, other, hot, "k",
        how="left", broadcast_bytes=1, skew_rows_per_key=1000,
    )
    assert advice["strategy"] == "shuffle" and "salt_demoted" in advice
    got = {r["k"] for r in out.select("k").distinct().collect()}
    assert got == {0, 1, 2, 3, 4}  # unmatched left keys preserved


def test_unknown_size_never_broadcast(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t1",
             spark.range(100).select(F.col("id").alias("k")))
    t2 = _mk(spark, tmp_path / "t2",
             spark.range(100).select(F.col("id").alias("k")))
    t1.ndv(spark, columns=["k"])
    t2.ndv(spark, columns=["k"])
    import os
    # one of t1's data files vanishes (concurrent expiry): its size is
    # UNKNOWN, which must not read as 0-bytes-and-broadcastable
    os.remove(t1.snapshots[-1]["files"][0])
    advice = advisor.advise_join(spark, t1, t2, "k")
    assert advice["inputs"]["bytes"]["left"] is None
    assert advice["broadcast_side"] != "left"


def test_advice_inputs_need_no_scan(spark, tmp_path, monkeypatch):
    """After sketches exist, advise_join must not read data files —
    the whole point is O(metadata) planning."""
    t1 = _mk(
        spark,
        tmp_path / "t1",
        spark.range(100).select(F.col("id").alias("k")),
    )
    t2 = _mk(
        spark,
        tmp_path / "t2",
        spark.range(100).select(F.col("id").alias("k")),
    )
    t1.ndv(spark, columns=["k"])
    t2.ndv(spark, columns=["k"])

    def boom(*a, **kw):
        raise AssertionError("advise_join scanned data files")

    monkeypatch.setattr(LakehouseTable, "_read_files", boom)
    advice = advisor.advise_join(spark, t1, t2, "k")
    assert advice["strategy"] == "broadcast"


def test_allow_refresh_false_never_scans_cold_table(spark, tmp_path, monkeypatch):
    """A cold (unsketched) probe side with allow_refresh=False gets a
    'shuffle' verdict flagged stats_missing — never an inline
    sketching scan. After maintenance sketches it, the same call
    upgrades to a real stats-based verdict."""
    big = _mk(
        spark,
        tmp_path / "big",
        spark.range(5000).select(
            (F.col("id") % 2).alias("k"), F.col("id").alias("v")
        ),
    )
    other = _mk(
        spark,
        tmp_path / "oth",
        spark.range(2).select(F.col("id").alias("k")),
    )

    def boom(*a, **kw):
        raise AssertionError("no-scan advise read data files")

    monkeypatch.setattr(LakehouseTable, "_read_files", boom)
    advice = advisor.advise_join(
        spark, big, other, "k",
        broadcast_bytes=1, skew_rows_per_key=1000, allow_refresh=False,
    )
    assert advice["strategy"] == "shuffle"
    assert advice["stats_missing"] in ("left", "right")
    monkeypatch.undo()
    # async sketching (what maintain() does), then re-advise no-scan
    big.refresh_ndv_sketches(spark)
    other.refresh_ndv_sketches(spark)
    monkeypatch.setattr(LakehouseTable, "_read_files", boom)
    advice2 = advisor.advise_join(
        spark, big, other, "k",
        broadcast_bytes=1, skew_rows_per_key=1000, allow_refresh=False,
    )
    assert advice2["strategy"] == "salt"
    assert "stats_missing" not in advice2
