"""Materialized views with auto-refresh and BI-cache smart routing.

Parity: reference DEMO.md §7 ("BI Engine caching, materialized views")
— BigQuery materialized views are declared once over a base table,
kept fresh automatically, and queries are routed to the cached result
when it is up to date.

Spark-first decomposition over the lakehouse:
- a view is a NAMED, DECLARATIVE query (``defining_query: DataFrame →
  DataFrame``) over one base LakehouseTable, materialized into its own
  LakehouseTable;
- FRESHNESS is a transactional watermark: every refresh stamps the
  base snapshot id it consumed via the gold table's ``txn=`` commit
  stamp, so the refresh result and its watermark commit atomically and
  a replayed refresh is a no-op (the exactly-once machinery from
  plans/incremental.py, reused);
- REFRESH is incremental when the view is declared ADDITIVE
  (partial/combine/keys — the refresh reads only files appended since
  the watermark and MERGEs deltas into touched keys: O(new data), the
  only strategy that survives 100 TB) and a full recompute otherwise
  or when the base saw a rewrite (BigQuery MVs do the same full
  re-materialization on non-append-only changes);
- AUTO-REFRESH hangs on the base table's post-commit hook
  (``LakehouseTable.on_commit``) — the in-process analog of the
  warehouse's background maintenance job. Cross-process writers don't
  see in-memory hooks; their readers stay correct through
  ``read_fresh``'s staleness check (smart routing), which serves the
  cache only when the watermark matches the base snapshot and
  refreshes first otherwise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from biglake_iceberg_pipeline_spark.plans.incremental import (
    lock_free_stamp,
    refresh_additive_rollup,
)
from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
    LakehouseTable,
    LineageBrokenError,
    SnapshotNotFoundError,
)


class MaterializedView:
    """CREATE MATERIALIZED VIEW <name> AS <defining_query over base>.

    Full-recompute mode: pass only ``defining_query``. Additive mode
    (incremental maintenance): also pass ``keys`` + ``combine`` (one
    ``(old, new) -> Column`` or a per-measure dict); the defining
    query then doubles as the partial aggregator, so it must be a
    key-grouped aggregation with decomposable measures."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        base: LakehouseTable,
        defining_query: Callable[[DataFrame], DataFrame],
        path: str,
        keys: list[str] | None = None,
        combine=None,
    ):
        if (keys is None) != (combine is None):
            raise ValueError("additive mode needs BOTH keys and combine")
        self.spark = spark
        self.name = name
        self.base = base
        self.defining_query = defining_query
        self.table = LakehouseTable(path)
        self.keys = keys
        self.combine = combine
        self._app = f"matview-{name}"

    # ------------------------------------------------------------ state

    def watermark(self) -> int | None:
        """Base snapshot id this view reflects (None = never built)."""
        return self.table.last_txn_version(self._app)

    def is_fresh(self) -> bool:
        base_snap = self.base.current_snapshot_id()
        if base_snap is None:
            return True  # empty base: nothing to reflect
        wm = self.watermark()
        return wm is not None and wm >= base_snap

    # ---------------------------------------------------------- refresh

    def refresh(self) -> int | None:
        """Bring the view up to the base's current snapshot; no-op when
        already fresh. Returns the view table's new snapshot id (None
        if nothing changed)."""
        if self.is_fresh():
            return None
        validated_tail = self._row_preserving_tail_since_watermark()
        if validated_tail is not None:
            # the base's only movement was compaction / delete
            # materialization (data_change=False, r10): the view's
            # rows are still exact — advance the watermark without
            # recomputing OR re-materializing anything. Before this,
            # every maintain() on the base cost a full O(base)
            # recompute for non-additive views. Stamp the snapshot
            # id the check actually VALIDATED, never a re-read
            # current_snapshot_id(): a cross-process append landing
            # between the validation and the stamp would otherwise
            # be skipped forever (/code-review r10).
            lock_free_stamp(self.table, validated_tail, app=self._app)
            return None
        if self.keys is not None:
            try:
                return refresh_additive_rollup(
                    self.spark,
                    self.base,
                    self.table,
                    self.keys,
                    self.defining_query,
                    self.combine,
                    app=self._app,
                )
            except (LineageBrokenError, SnapshotNotFoundError):
                # base rewrote rows since the watermark, or table
                # maintenance expired the watermark snapshot —
                # incremental deltas are undefined; fall through to
                # re-materialize. Typed catches only (ADVICE r4):
                # message-substring matching would swallow unrelated
                # ValueErrors raised inside user-supplied
                # defining_query/combine into a silent full recompute.
                pass
        return self._full_recompute()

    def _row_preserving_tail_since_watermark(self) -> int | None:
        """The LAST snapshot id of a validated all-row-preserving
        range after the watermark (``data_change: False`` on every
        snapshot, watermark present, contiguous history — an expiry
        gap could hide a row-changing commit, so it conservatively
        returns None there). The caller stamps exactly this id: it is
        the one the validation covered, regardless of what a
        concurrent writer commits afterwards."""
        wm = self.watermark()
        if wm is None:
            return None
        snaps = self.base.snapshots
        ids = [s["id"] for s in snaps]
        if wm not in ids:
            return None
        idx = ids.index(wm)
        after = snaps[idx + 1 :]
        if not after:
            return None
        if ids[idx:] != list(range(wm, wm + 1 + len(after))):
            return None  # history gap: cannot prove row preservation
        if all(s.get("data_change") is False for s in after):
            return after[-1]["id"]
        return None

    def _full_recompute(self) -> int:
        base_snap = self.base.current_snapshot_id()
        # single commit: the materialized rows and the watermark stamp
        # land atomically (txn= rides the overwrite's manifest swap)
        # instead of overwrite + a second lock_free_stamp commit
        return self.table.overwrite(
            self.defining_query(self.base.read(self.spark)),
            txn=(self._app, base_snap),
        )

    def auto_refresh_on_commit(self) -> "MaterializedView":
        """Register this view on the base table's post-commit hook so
        every committed write refreshes it immediately (the background
        maintenance analog). Returns self for chaining."""
        self.base.on_commit.append(lambda _t, _op, _snap: self.refresh())
        return self

    # ------------------------------------------------------------ reads

    def read(self) -> DataFrame:
        """The materialized rows as-of the last refresh (may be stale
        — check ``is_fresh``). The BI-cache read: O(view), never
        touches the base."""
        return self.table.read(self.spark)

    def read_fresh(self) -> DataFrame:
        """Smart routing: serve the cache when fresh, refresh first
        when stale — callers always see results consistent with the
        base's current snapshot, and repeated reads against an
        unchanged base cost O(view)."""
        if not self.is_fresh():
            self.refresh()
        return self.read()
