"""End-to-end medallion flow: inbox files → bronze → silver → gold.

The retail-side capstone (the curation capstone for documents is
plans/pipeline.py): one callable that composes the already-tested
operators into the reference's event-driven daily flow —

    inbox file lands (Eventarc → cleaning agent → loader, reference
    services/data-cleaning-agent + services/loader)
      → format/delimiter/header detection, lenient read
      → clean: snake_case columns, trim/sentinel→NULL strings,
        processed_at stamp, within-file duplicate flags
      → BRONZE append (file-level idempotency: the file name rides the
        table's transactional commit stamp, so a redelivered Eventarc
        message — the reference's Firestore duplicate check — is a
        no-op under the commit lock)
      → SILVER rebuild: drop flagged in-file dups, latest-row-per-key
        (the reference silver ROW_NUMBER shape), safe type coercion
        (reference agent's recommend-and-cast)
      → GOLD refresh: each table a MaterializedView over silver — the
        silver overwrite makes their incremental path fall back to
        full re-materialization automatically, and views stay
        registered across runs
      → quality report on silver + a pipeline event log table (the
        logger service analog)

Scale notes: bronze appends are per-file scans; the silver rebuild is
one shuffle on the dedup key (the reference recomputes silver with
CREATE OR REPLACE too — the incremental alternative is
plans/incremental.py); gold work is whatever each view declares.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import cleaning, coercion
from biglake_iceberg_pipeline_spark.operators.medallion import (
    dedup_latest,
    flag_duplicates,
)
from biglake_iceberg_pipeline_spark.operators.report import quality_report
from biglake_iceberg_pipeline_spark.plans.incremental import lock_free_stamp
from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
    LakehouseTable,
    LineageBrokenError,
    SnapshotNotFoundError,
)
from biglake_iceberg_pipeline_spark.sinks.matview import MaterializedView
from biglake_iceberg_pipeline_spark.sources.readers import read_auto

#: silver's bronze-snapshot watermark rides this app id (both modes)
_SILVER_APP = "medallion-silver"


def _file_app_id(name: str) -> str:
    return "medallion-file-" + hashlib.sha1(name.encode()).hexdigest()[:12]


def _table_rows(spark: SparkSession, table: LakehouseTable) -> int:
    """Manifest row count, falling back to a scan for tables whose
    manifests predate per-file record counts (row_count's documented
    None contract)."""
    n = table.row_count()
    if n is not None:
        return n
    return table.read(spark).count()


def _clean_for_bronze(df: DataFrame) -> DataFrame:
    """The cleaning-agent pass: normalized names, ALL columns as raw
    strings (bronze is the untyped landing zone — per-file type
    inference would make two vintages of the same feed collide on
    append; typing happens once, at silver, from the union of all
    files), trimmed with sentinel NULLs, processed_at, within-file
    duplicate flags. Duplicates are flagged on the FULL ROW (the
    reference agent's is_duplicate_in_file = identical row): two rows
    sharing a key but differing in values are NOT in-file dups — both
    reach silver, where latest-wins resolves them deterministically;
    flagging by key alone would drop one of them arbitrarily."""
    df = cleaning.normalize_column_names(df)
    df = df.select(
        *[
            cleaning.clean_string(F.col(c).cast("string")).alias(c)
            for c in df.columns
        ]
    )
    df = cleaning.add_processed_at(df)
    return flag_duplicates(df)


def _coerce_silver_types(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Apply the agent's safe-cast recommendations (BOOLEAN/BIGINT/
    DOUBLE only where every non-blank value parses). The
    recommendation frame is one row per string column — driver-sized
    metadata, same class as the expectations aggregate."""
    recs = {
        r["column_name"]: r["recommended_type"]
        for r in coercion.recommend_types(df).collect()
    }
    for col, dtype in recs.items():
        df = df.withColumn(col, F.col(col).cast(dtype))
    return df


#: widening applies WITHIN a class only: numeric widens bigint→double;
#: boolean and numeric are NOT interconvertible (casting 'true' to
#: DOUBLE crashes under ANSI; coercing booleans to 1/0 diverges from
#: what a rebuild re-infers) — cross-class vintages need a re-baseline.
_TYPE_CLASS = {
    "boolean": "bool",
    "int": "num", "bigint": "num", "float": "num", "double": "num",
}
_NUM_RANK = {"int": 2, "bigint": 2, "float": 3, "double": 3}


def _class(dtype: str) -> str:
    return _TYPE_CLASS.get(dtype.lower(), "string")


def _type_delta_like_silver(
    spark: SparkSession, cand: DataFrame, silver_types: dict[str, str]
) -> DataFrame:
    """Type an (all-string) delta against the standing silver schema:
    shared columns keep silver's type unless this vintage genuinely
    needs a wider numeric class (e.g. BIGINT silver, 12.5 arrives →
    DOUBLE; the merge then widens silver — the same answer a full
    rebuild would infer). A typed silver column whose new values no
    longer parse at all is NOT silently nulled or crashed: it raises
    with a re-baseline instruction, because only a full re-inference
    over the union can decide that column's type. New columns get a
    fresh safe-cast recommendation."""
    recs = {
        r["column_name"]: r["recommended_type"].lower()
        for r in coercion.recommend_types(cand).collect()
    }
    cand_types = dict(cand.dtypes)
    for c in cand.columns:
        if c == "processed_at":
            continue
        cand_t = (
            recs.get(c, "string")
            if cand_types[c] == "string"
            else cand_types[c]
        )
        if c in silver_types:
            silver_t = silver_types[c]
            s_cls, c_cls = _class(silver_t), _class(cand_t)
            if s_cls == "string":
                target = "string"  # string absorbs anything
            elif c_cls == s_cls:
                if s_cls == "num" and (
                    _NUM_RANK[cand_t.lower()]
                    > _NUM_RANK[silver_t.lower()]
                ):
                    target = cand_t  # widen; merge evolves silver
                else:
                    target = silver_t
            else:
                # cross-class vintage (bool vs num, or values that no
                # longer parse): only a full re-inference over the
                # union can type this column
                raise ValueError(
                    f"column {c!r} arrived as {cand_t} but silver "
                    f"holds {silver_t}; re-baseline with "
                    "silver_mode='rebuild'"
                )
            cand = cand.withColumn(c, F.col(c).cast(target))
        elif c in recs:
            cand = cand.withColumn(c, F.col(c).cast(recs[c]))
    return cand


def _value_cols(df: DataFrame, key_cols: list[str]) -> list[str]:
    return [
        c
        for c in df.columns
        if c not in key_cols
        and c not in ("processed_at", "is_duplicate_in_file")
    ]


def refresh_silver_incremental(
    spark: SparkSession,
    bronze: LakehouseTable,
    silver: LakehouseTable,
    key_cols: list[str],
    app: str = "medallion-silver",
) -> int | None:
    """Incremental silver: read ONLY the bronze files appended since
    the last refresh (the bronze watermark rides silver's commit
    stamp, same exactly-once mechanism as plans/incremental.py), take
    latest-per-key within the delta, pull the CURRENT silver rows for
    just the touched keys, re-resolve latest-wins across old+new, and
    MERGE. Work per refresh is O(delta + touched keys) — the shape
    that survives a 100 TB bronze — vs the rebuild path's O(bronze).

    Bronze is append-only by construction (per-file appends), so the
    incremental scan never crosses a rewrite. Returns the new silver
    snapshot id, or None when bronze hasn't advanced."""
    current = bronze.current_snapshot_id()
    if current is None:
        return None
    wm = silver.last_txn_version(app)
    if wm is not None and wm >= current:
        return None
    if wm is None:
        delta = bronze.read(spark)
    else:
        try:
            delta = bronze.incremental_scan(spark, wm, current)
        except (LineageBrokenError, SnapshotNotFoundError):
            # bronze maintenance (compaction 'replace' / snapshot
            # expiry) broke the file-diff lineage. Latest-wins is
            # IDEMPOTENT over replayed rows, so a full re-read is
            # merely O(bronze) this once, not incorrect.
            delta = bronze.read(spark)
    delta = delta.where(~F.col("is_duplicate_in_file"))
    cand = dedup_latest(
        delta, key_cols, "processed_at", tiebreak=_value_cols(delta, key_cols)
    ).drop("is_duplicate_in_file")
    if silver.current_snapshot_id() is None:
        return silver.append(
            _coerce_silver_types(spark, cand), txn=(app, current)
        )
    existing = silver.read(spark)
    cand = _type_delta_like_silver(spark, cand, dict(existing.dtypes))
    # touched keys only: broadcast the (small) delta key set
    touched = existing.join(
        F.broadcast(cand.select(*key_cols).distinct()),
        key_cols,
        "left_semi",
    )
    merged = dedup_latest(
        touched.unionByName(cand, allowMissingColumns=True),
        key_cols,
        "processed_at",
        tiebreak=_value_cols(cand, key_cols),
    )
    return silver.merge(spark, merged, key_cols, txn=(app, current))


def archive_processed_file(
    path: str, archive_dir: str, target_table: str = "bronze"
) -> str:
    """Move a loaded inbox file to ``archive_dir/<table>/<file>`` —
    the reference loader's archive_original
    (services/loader/cleanup.py:16): a processed file LEAVES the
    inbox, so re-listing doesn't re-walk an ever-growing directory.
    Idempotent exactly like the reference: a missing source means an
    earlier run already moved it; return the expected archive path
    without erroring. An existing archive file of the same name is
    overwritten (same as GCS copy_blob), which is safe because the
    bronze commit stamp — not archive presence — is what dedups
    loads."""
    import shutil

    dest_dir = os.path.join(archive_dir, target_table)
    dest = os.path.join(dest_dir, os.path.basename(path))
    if not os.path.exists(path):
        return dest
    os.makedirs(dest_dir, exist_ok=True)
    shutil.move(path, dest)
    return dest


def run_medallion_flow(
    spark: SparkSession,
    inbox_dir: str,
    lake_root: str,
    key_cols: list[str],
    gold_views: list[tuple[str, Callable[[DataFrame], DataFrame]]]
    | None = None,
    silver_mode: str = "rebuild",
    archive_dir: str | None = None,
    dedup_content_col: str | None = None,
    bronze_rules: dict | None = None,
    gold_dim_joins: list[tuple[str, str, str]] | None = None,
) -> dict:
    """Process every file in ``inbox_dir`` through bronze → silver →
    gold under ``lake_root``. Re-running is safe: already-loaded files
    skip via their commit stamp, silver/gold converge to the same
    state. Returns the funnel metrics + quality status.

    ``silver_mode``: 'rebuild' recomputes silver from all of bronze
    (the reference's CREATE OR REPLACE shape — simplest, O(bronze));
    'incremental' folds only the new bronze files into silver via
    refresh_silver_incremental (O(delta + touched keys), the 100 TB
    path).

    ``archive_dir``: when set, every file whose bronze commit stands
    (loaded this run OR skipped as already-committed — the latter
    heals a crash between commit and archive) is MOVED to
    ``archive_dir/bronze/<file>`` after the commit, so the inbox
    empties instead of growing unboundedly (reference
    services/loader/cleanup.py:16 archive_original). The move happens
    strictly after the commit: a crash between them leaves the file in
    the inbox, and the replay skips the load (commit stamp) but
    completes the archival — no double-load in either order.

    ``dedup_content_col``: when set, rows whose content (md5 of that
    column) was already loaded by ANY earlier file are dropped before
    the bronze append — cross-load dedup against a persisted
    ``_dedup_index`` hash table (operators/dedup.py
    incremental_exact_dedup_vs_index: each file's check costs
    O(file + index), never O(bronze text)). The index extension rides
    the file's own txn stamp on the index table, so a crash between
    the bronze commit and the index append is healed on replay, and a
    replayed file never double-registers its hashes.

    ``bronze_rules``: when set, each file loads through
    write-audit-publish — its rows are staged and audited against the
    expectations rules BEFORE the bronze commit; a violating file is
    rejected whole (counted in ``files_rejected``, left in the inbox
    for inspection, later files unaffected) and bronze never exposes
    an unaudited row.

    ``gold_dim_joins``: entries ``(gold_name, dim_table_path, key)``
    — each materializes ``gold/<name>`` as silver LEFT-enriched with
    the dimension lakehouse table, with the physical join strategy
    picked by the stats advisor (operators/advisor.py) from manifest
    metadata ONLY (``allow_refresh=False``: a cold unsketched dim
    yields a plain shuffle flagged ``stats_missing`` rather than an
    inline sketching scan — ``maintain()`` sketches it for next
    time). The chosen advice is recorded in
    ``metrics["gold_advice"]`` and in the view's ``_advice.json``,
    and the view refreshes only when silver's or the dim's snapshot
    moved."""
    if silver_mode not in ("rebuild", "incremental"):
        raise ValueError(f"unknown silver_mode {silver_mode!r}")
    bronze = LakehouseTable(os.path.join(lake_root, "bronze"))
    silver = LakehouseTable(os.path.join(lake_root, "silver"))
    log_table = LakehouseTable(os.path.join(lake_root, "_pipeline_log"))
    # branch-independent shape: callers can rely on every key existing
    metrics: dict = {
        "files_processed": 0,
        "files_skipped": 0,
        "files_archived": 0,
        "bronze_rows": 0,
        "silver_rows": None,
        "gold": {},
        "quality_status": None,
    }
    events: list[tuple[str, str, int]] = []

    def _archive(name: str, path: str) -> None:
        if archive_dir is None:
            return
        archive_processed_file(path, archive_dir, "bronze")
        metrics["files_archived"] += 1
        events.append(("file_archived", name, 0))

    dedup_index = (
        LakehouseTable(os.path.join(lake_root, "_dedup_index"))
        if dedup_content_col
        else None
    )
    if dedup_index is not None:
        metrics["rows_dedup_dropped"] = 0
    if bronze_rules:
        metrics["files_rejected"] = 0

    def _dedup_split(df: DataFrame):
        """(rows to load, this file's new index rows). The index side
        holds one (content_hash, corpus_keep_id) row per distinct
        non-NULL content ever accepted — checks are hash joins on the
        index, never rescans of bronze text. The verdict frame is
        materialized ONCE (persist) and both outputs derive from it,
        so the index join runs once per file."""
        from biglake_iceberg_pipeline_spark.operators.dedup import (
            empty_index_frame,
            split_batch_vs_index,
        )

        idx_df = (
            dedup_index.read(spark)
            if dedup_index.current_snapshot_id() is not None
            else empty_index_frame(df, key_cols[0], dedup_content_col)
        )
        return split_batch_vs_index(
            idx_df, df, key_cols[0], dedup_content_col
        )

    def _heal_index(name: str, path: str) -> None:
        """A crash between a file's bronze commit and its index
        append leaves the index behind that file; finish the append
        (idempotent via the txn stamp)."""
        if (
            dedup_index is not None
            and dedup_index.last_txn_version(_file_app_id(name)) is None
            and os.path.isfile(path)
        ):
            df = _clean_for_bronze(read_auto(spark, path))
            _, new_rows, out = _dedup_split(df)
            dedup_index.append(new_rows, txn=(_file_app_id(name), 0))
            out.unpersist()

    inbox_files = [
        (name, os.path.join(inbox_dir, name))
        for name in sorted(os.listdir(inbox_dir))
        if os.path.isfile(os.path.join(inbox_dir, name))
    ]

    # ---- heal pass BEFORE any load: every bronze-committed file must
    # be in the index before this run checks new files against it —
    # healing lazily at the crashed file's sorted position would let a
    # file sorting earlier re-admit content the crashed file already
    # committed. The archive is walked too: a replay run invoked
    # WITHOUT dedup_content_col archives crashed-window files out of
    # the inbox, and the next dedup-enabled run must still heal them.
    if dedup_index is not None:
        heal_candidates = dict(inbox_files)
        arch_bronze = (
            os.path.join(archive_dir, "bronze") if archive_dir else None
        )
        if arch_bronze and os.path.isdir(arch_bronze):
            for name in sorted(os.listdir(arch_bronze)):
                heal_candidates.setdefault(
                    name, os.path.join(arch_bronze, name)
                )
        for name, path in sorted(heal_candidates.items()):
            if bronze.last_txn_version(_file_app_id(name)) is not None:
                _heal_index(name, path)

    # ---- bronze: one append per new file, skip replays
    for name, path in inbox_files:
        app = _file_app_id(name)
        if bronze.last_txn_version(app) is not None:
            metrics["files_skipped"] += 1
            events.append(("file_skipped_duplicate", name, 0))
            # its commit stands — a crash between that commit and the
            # archival left it in the inbox; finish the move now (the
            # index heal already ran in the pre-pass)
            _archive(name, path)
            continue
        raw = _clean_for_bronze(read_auto(spark, path))
        raw.persist()  # one file read feeds count/dedup/append
        df, new_rows, out = raw, None, None
        if dedup_index is not None:
            n_raw = raw.count()
            df, new_rows, out = _dedup_split(raw)
        n = df.count()
        if bronze_rules:
            # write-audit-publish: the file's rows are staged and
            # audited BEFORE the bronze commit — a bad file is
            # rejected whole (quarantined in place, next files still
            # load) and bronze never exposes an unaudited row
            from biglake_iceberg_pipeline_spark.operators.expectations import (
                ExpectationsFailed,
            )

            try:
                bronze.write_audit_publish(df, bronze_rules, txn=(app, 0))
            except ExpectationsFailed as e:
                metrics.setdefault("files_rejected", 0)
                metrics["files_rejected"] += 1
                events.append(("file_rejected_audit", name, sum(e.metrics.values())))
                if dedup_index is not None:
                    out.unpersist()
                raw.unpersist()
                continue  # file stays in the inbox for inspection
        else:
            bronze.append(df, txn=(app, 0))
        # dedup-drop accounting AFTER the audit gate: a file rejected
        # whole by bronze_rules must not report dedup-dropped rows it
        # never loaded
        if dedup_index is not None and n_raw - n:
            metrics["rows_dedup_dropped"] += n_raw - n
            events.append(("rows_cross_dedup_dropped", name, n_raw - n))
        if dedup_index is not None:
            # stamp even an all-duplicate file (empty new_rows): the
            # stamp is what tells replays the index extension is done
            dedup_index.append(new_rows, txn=(app, 0))
            out.unpersist()
        raw.unpersist()
        metrics["files_processed"] += 1
        events.append(("file_loaded_bronze", name, n))
        _archive(name, path)

    # manifest metadata when available (replays stay O(1)); a table
    # predating row-count tracking falls back to one scan
    metrics["bronze_rows"] = _table_rows(spark, bronze)

    # ---- silver: in-file dups out, latest per key, safe types.
    # Gate on the WATERMARK (silver's recorded bronze snapshot), not
    # this run's file counter: a run that crashed between the bronze
    # append and the silver refresh leaves silver stale, and its
    # replay sees files_skipped only — the watermark still says
    # "behind", so the refresh happens and the flow converges.
    bronze_snap = bronze.current_snapshot_id()
    silver_wm = silver.last_txn_version(_SILVER_APP)
    silver_refreshed = False
    if bronze_snap is not None and (
        silver_wm is None or silver_wm < bronze_snap
    ):
        if silver_mode == "incremental":
            refresh_silver_incremental(
                spark, bronze, silver, key_cols, app=_SILVER_APP
            )
        else:
            base = bronze.read(spark).where(
                ~F.col("is_duplicate_in_file")
            )
            # tiebreak on the value columns: key columns are constant
            # within the dedup window, so they break no ties — equal
            # processed_at stamps must still pick a deterministic winner
            latest = dedup_latest(
                base,
                key_cols,
                "processed_at",
                tiebreak=_value_cols(base, key_cols),
            ).drop("is_duplicate_in_file")
            silver.overwrite(_coerce_silver_types(spark, latest))
            lock_free_stamp(silver, bronze_snap, app=_SILVER_APP)
        silver_refreshed = True
        metrics["silver_rows"] = _table_rows(spark, silver)
        events.append(("silver_rebuilt", "", metrics["silver_rows"]))
    elif silver.current_snapshot_id() is not None:
        # no-op replay: manifest metadata only, no scans
        metrics["silver_rows"] = _table_rows(spark, silver)

    # ---- gold: materialized views over silver. OUTSIDE the
    # silver-stale branch (ADVICE r4): a run that crashes after
    # silver's watermark commit but before this loop leaves gold
    # stale, and a replay with no new inbox files skips the branch —
    # each view's own staleness check must therefore run every time
    # (refresh() is a cheap watermark compare when already fresh).
    gold_did_work = False
    if silver.current_snapshot_id() is not None:
        for gname, fn in gold_views or []:
            mv = MaterializedView(
                spark,
                gname,
                silver,
                fn,
                os.path.join(lake_root, "gold", gname),
            )
            was_fresh = mv.is_fresh()
            mv.refresh()
            gold_did_work = gold_did_work or not was_fresh
            n = _table_rows(spark, mv.table)
            metrics["gold"][gname] = n
            if not was_fresh:
                events.append(("gold_refreshed", gname, n))
        for gname, dim_path, jkey in gold_dim_joins or []:
            import json as _json

            from biglake_iceberg_pipeline_spark.operators.advisor import (
                join_with_advice,
            )

            dim = LakehouseTable(dim_path)
            gold_tbl = LakehouseTable(
                os.path.join(lake_root, "gold", gname)
            )
            state_path = os.path.join(gold_tbl.path, "_advice.json")
            # the watermark must pin the ENTIRE join config, not just
            # snapshot ids: snapshot ids start at 1 for every table,
            # so a re-pointed dim_path (or changed key) would collide
            # and wrongly read as fresh, serving stale gold rows
            want = {
                "silver": silver.current_snapshot_id(),
                "dim": dim.current_snapshot_id(),
                "dim_path": os.path.realpath(dim.path),
                "key": jkey,
            }
            try:
                with open(state_path) as fh:
                    state = _json.load(fh)
            except (OSError, ValueError):
                state = None
            fresh = (
                state is not None
                and {k: state.get(k) for k in want} == want
                and gold_tbl.current_snapshot_id() is not None
            )
            if fresh:
                advice = state["advice"]
            else:
                out, advice = join_with_advice(
                    spark, silver, dim, jkey, how="left",
                    allow_refresh=False,
                )
                gold_tbl.overwrite(out)
                # watermark AFTER the overwrite: a crash in between
                # just re-materializes (overwrite is idempotent)
                with open(state_path, "w") as fh:
                    _json.dump({**want, "advice": advice}, fh)
            n = _table_rows(spark, gold_tbl)
            metrics["gold"][gname] = n
            metrics.setdefault("gold_advice", {})[gname] = advice
            if not fresh:
                gold_did_work = True
                events.append(
                    ("gold_dim_joined", f"{gname}:{advice['strategy']}", n)
                )

    # quality report whenever this run did real silver/gold work —
    # covers the crash-window replay (silver fresh, gold stale) while
    # keeping a true no-op replay scan-free
    if silver_refreshed or gold_did_work:
        report = quality_report(silver.read(spark), "silver")
        metrics["quality_status"] = report["overall_status"]

    # ---- event log (the logger service's Firestore analog)
    if events:
        log_table.append(
            spark.createDataFrame(
                [(e, f, n) for e, f, n in events],
                "event string, file string, n_rows long",
            ).withColumn("logged_at", F.current_timestamp())
        )
    return metrics
