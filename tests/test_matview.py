"""Materialized views: freshness watermarks, incremental vs full
refresh, auto-refresh-on-commit, BI-cache smart routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable
from biglake_iceberg_pipeline_spark.sinks.matview import MaterializedView


def _orders(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS o_orderkey",
        "CAST(date_add('2024-01-01', CAST(id % 5 AS INT)) AS STRING) "
        "AS o_orderdate",
        "CAST(id AS DOUBLE) * 1.5 AS o_totalprice",
    )


def _daily(df):
    return df.groupBy(
        F.to_date("o_orderdate").alias("sale_date")
    ).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum("o_totalprice").alias("revenue"),
    )


def _as_map(df):
    return {
        str(r["sale_date"]): (r["order_count"], r["revenue"])
        for r in df.collect()
    }


def test_full_mode_freshness_and_routing(spark, tmp_path):
    d = str(tmp_path)
    base = LakehouseTable(d + "/base")
    base.append(_orders(spark, 0, 100))
    mv = MaterializedView(
        spark, "daily", base, _daily, d + "/mv"
    )
    assert not mv.is_fresh()  # never built
    mv.refresh()
    assert mv.is_fresh()
    assert _as_map(mv.read()) == _as_map(_daily(base.read(spark)))
    # fresh → refresh is a no-op (no new view snapshot)
    snap = mv.table.current_snapshot_id()
    assert mv.refresh() is None
    assert mv.table.current_snapshot_id() == snap
    # base advances → stale; read_fresh routes through a refresh
    base.append(_orders(spark, 100, 150))
    assert not mv.is_fresh()
    assert _as_map(mv.read_fresh()) == _as_map(_daily(base.read(spark)))
    assert mv.is_fresh()


def test_additive_mode_incremental_merge(spark, tmp_path):
    d = str(tmp_path)
    base = LakehouseTable(d + "/base")
    base.append(_orders(spark, 0, 100))
    mv = MaterializedView(
        spark, "daily_add", base, _daily, d + "/mv",
        keys=["sale_date"],
        combine=lambda old, new: old + new,
    )
    mv.refresh()
    before = _as_map(mv.read())
    base.append(_orders(spark, 100, 160))
    mv.refresh()
    # incremental result == full recompute
    assert _as_map(mv.read()) == _as_map(_daily(base.read(spark)))
    assert _as_map(mv.read()) != before
    # the refresh MERGEd (incremental), not overwrote
    assert mv.table.history()[-1]["operation"] == "merge"


def test_additive_falls_back_to_full_on_base_rewrite(spark, tmp_path):
    d = str(tmp_path)
    base = LakehouseTable(d + "/base")
    base.append(_orders(spark, 0, 100))
    mv = MaterializedView(
        spark, "daily_rw", base, _daily, d + "/mv",
        keys=["sale_date"],
        combine=lambda old, new: old + new,
    )
    mv.refresh()
    # a DELETE breaks append-only lineage: incremental deltas are
    # undefined, so the refresh must re-materialize, not raise
    base.delete_where(spark, "o_orderkey >= 50")
    mv.refresh()
    assert mv.is_fresh()
    assert _as_map(mv.read()) == _as_map(_daily(base.read(spark)))
    assert mv.table.history()[-1]["operation"] == "overwrite"


def test_user_query_valueerror_propagates_not_swallowed(spark, tmp_path):
    """ADVICE r4: refresh used to decide 'lineage break → full
    recompute' by substring-matching ValueError text ('not found'), so
    a user bug whose message happened to contain it was silently
    swallowed into a re-materialization. With typed exceptions it must
    propagate."""
    import pytest

    d = str(tmp_path)
    base = LakehouseTable(d + "/base")
    base.append(_orders(spark, 0, 50))

    calls = {"n": 0}

    def buggy_daily(df):
        calls["n"] += 1
        if calls["n"] > 1:
            raise ValueError("column 'revenue' not found in frame")
        return _daily(df)

    mv = MaterializedView(
        spark, "daily_bug", base, buggy_daily, d + "/mv",
        keys=["sale_date"],
        combine=lambda old, new: old + new,
    )
    mv.refresh()
    base.append(_orders(spark, 50, 80))
    with pytest.raises(ValueError, match="not found in frame"):
        mv.refresh()
    # and the view was NOT silently re-materialized over the bug
    assert not mv.is_fresh()


def test_auto_refresh_on_commit_hook(spark, tmp_path):
    d = str(tmp_path)
    base = LakehouseTable(d + "/base")
    base.append(_orders(spark, 0, 50))
    mv = MaterializedView(
        spark, "daily_auto", base, _daily, d + "/mv",
        keys=["sale_date"],
        combine=lambda old, new: old + new,
    ).auto_refresh_on_commit()
    mv.refresh()
    # a plain base append now refreshes the view with no explicit call
    base.append(_orders(spark, 50, 90))
    assert mv.is_fresh()
    assert _as_map(mv.read()) == _as_map(_daily(base.read(spark)))


def test_row_preserving_base_rewrite_stamps_without_recompute(
    spark, tmp_path
):
    """r10: compaction / delete materialization on the base are
    data_change=False — the view's rows are still exact, so refresh()
    just advances the watermark: NO view-table data commit, no
    recompute. A mixed range (compaction + append) takes the normal
    path."""
    d = str(tmp_path)
    base = LakehouseTable(d + "/base")
    base.append(_orders(spark, 0, 60))
    base.append(_orders(spark, 60, 100))
    mv = MaterializedView(spark, "daily_rp", base, _daily, d + "/mv")
    mv.refresh()
    view_snap = mv.table.current_snapshot_id()

    base.compact(spark, target_files=1)
    assert not mv.is_fresh()
    recomputes = []
    orig = mv._full_recompute
    mv._full_recompute = lambda: recomputes.append(1) or orig()
    assert mv.refresh() is None  # stamp only
    assert recomputes == []
    assert mv.is_fresh()
    # the view table wrote NO data snapshot (watermark is txn-only)
    assert mv.table.current_snapshot_id() == view_snap
    assert _as_map(mv.read()) == _as_map(_daily(base.read(spark)))

    # compaction + append since the watermark: rows changed, the
    # normal (recompute) path must run and the result stays exact
    base.compact(spark, target_files=2)
    base.append(_orders(spark, 100, 130))
    mv.refresh()
    assert recomputes == [1]
    assert mv.is_fresh()
    assert _as_map(mv.read()) == _as_map(_daily(base.read(spark)))


def test_stamp_only_refresh_stamps_validated_snapshot_not_current(
    spark, tmp_path
):
    """Regression (/code-review r10 TOCTOU): the stamp-only path must
    stamp the snapshot the row-preserving check VALIDATED — a
    cross-process append landing between validation and stamp must
    leave the view stale, not silently skipped forever."""
    d = str(tmp_path)
    base = LakehouseTable(d + "/base")
    base.append(_orders(spark, 0, 50))
    mv = MaterializedView(spark, "daily_toctou", base, _daily, d + "/mv")
    mv.refresh()
    base.compact(spark, target_files=1)

    orig = mv._row_preserving_tail_since_watermark

    def racy():
        tail = orig()
        if tail is not None:
            # a concurrent writer appends AFTER validation
            base.append(_orders(spark, 50, 80))
        return tail

    mv._row_preserving_tail_since_watermark = racy
    assert mv.refresh() is None  # stamp-only for the validated range
    mv._row_preserving_tail_since_watermark = orig
    # the concurrent append is NOT covered: view must still be stale
    assert not mv.is_fresh()
    mv.refresh()
    assert mv.is_fresh()
    assert _as_map(mv.read()) == _as_map(_daily(base.read(spark)))


def test_cluster_assignment_matview_lifecycle(spark):
    """The near-dup pair artifact in its production shape (r12): a
    MaterializedView over a documents lakehouse table. Pins (a) an
    append to the base corpus auto-refreshes via the commit hook and
    the new near-dups land in one cluster, (b) without the hook a
    stale view is refreshed by read_fresh() before serving — never
    silently served stale, (c) the r13 snapshot-keyed cache guard:
    after the base mutated, the REGISTERED artifact entry point
    rebuilds from the pristine parquet corpus on its own — no
    manual finally-block cache clear (VERDICT r12 item 5)."""
    from biglake_iceberg_pipeline_spark.plans import llm_ops

    llm_ops._CLUSTER_ARTIFACT.clear()
    sf = "/root/testdata/sf0.001"
    mv = llm_ops.cluster_assignment_matview(spark, sf)
    n0 = mv.read().count()
    assert mv.is_fresh()
    dup_text = "the quick brown fox jumps over the lazy dog " * 6
    new = spark.createDataFrame(
        [
            (900001, dup_text, "en", "webz", len(dup_text)),
            (900002, dup_text + "!", "en", "webz", len(dup_text) + 1),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    mv.base.append(new)
    # the post-commit hook already refreshed — no stale window
    assert mv.is_fresh()
    rows = {r["doc_id"]: r for r in mv.read().collect()}
    assert len(rows) == n0 + 2
    a, b = rows[900001], rows[900002]
    assert a["cluster_id"] == b["cluster_id"]  # near-dups merged
    assert a["is_canonical"] and not b["is_canonical"]
    # stale path: no hook, cross-process-writer analog — the HANDLE
    # serves the refreshed view state (never silently stale)
    mv.base.on_commit.clear()
    mv.base.append(
        spark.createDataFrame(
            [(900003, "entirely new text", "en", "webz", 17)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
    )
    assert not mv.is_fresh()
    assert mv.read_fresh().count() == n0 + 3
    assert mv.is_fresh()
    # snapshot-keyed cache guard: the registered entry point notices
    # the cached artifact's base moved past its build snapshot,
    # discards it, and rebuilds over the PRISTINE corpus — the
    # append-then-stale-oracle-read hazard is gone WITHOUT any
    # manual cache clear
    from biglake_iceberg_pipeline_spark.sources.catalog import (
        corpus_cache_key,
    )

    served = llm_ops.cluster_assignment_artifact(spark, sf)
    assert served.count() == n0
    rebuilt, _snap = llm_ops._CLUSTER_ARTIFACT[corpus_cache_key(sf)]
    assert rebuilt is not mv
    # and the rebuilt entry is a stable hit for the next consumer
    assert llm_ops.cluster_assignment_matview(spark, sf) is rebuilt
