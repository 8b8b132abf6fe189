"""Stats-informed join planning over lakehouse tables.

Spark's own CBO only helps when the catalog carries statistics; plain
parquet path reads have none, so Catalyst falls back to size-on-disk
heuristics that know nothing about key cardinality or skew. The
lakehouse manifest DOES carry the relevant facts — footer row counts
(``row_count()``), per-file HLL sketches (``ndv()``), and data file
sizes — all O(files) metadata, no scan. This module turns them into
the decisions a human tuner makes before a big join (the reference
delegates this to BigQuery's planner; on Spark it is the operator's
job):

- **broadcast** when one side's data fits the broadcast budget —
  removes the shuffle entirely (the single biggest lever at 100 TB).
- **salt** when rows/NDV on the join key of the bigger side implies
  hot keys that one reducer would own (AQE splits skewed SMJ
  partitions, but cannot split a single hot key finer than one map
  partition — see operators/skew.py).
- **shuffle** (plain sort-merge/hash) otherwise; with a *bucket*
  hint when both sides are large enough that persisting them
  co-partitioned (sinks/bucketed.py) would amortize across repeated
  joins.

``join_with_advice`` applies the verdict mechanically: broadcast →
``F.broadcast`` hint, salt → ``salted_join``, shuffle → plain join.
Decisions and their inputs are returned for observability, so a
pipeline can log WHY a plan was chosen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.skew import salted_join
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable

# Spark's default autoBroadcastJoinThreshold; parquet bytes expand in
# memory, so compare against on-disk size like Spark itself does.
BROADCAST_BYTES = 10 * 1024 * 1024
# avg rows per key above which a single reducer owns too much of a
# shuffled join's probe side (tunable; conservative default)
SKEW_ROWS_PER_KEY = 100_000
# both sides above this → repeated joins deserve bucketed layouts
BUCKET_ROWS = 100_000_000


def table_size_bytes(table: LakehouseTable) -> int | None:
    """On-disk bytes of the current snapshot — manifest file list +
    os.stat, no scan. None when any file is unreadable (e.g. a
    concurrent expiry removed it): unknown must stay unknown — a
    silent 0 would flip a huge table into the broadcast budget."""
    snaps = table.snapshots
    files = snaps[-1]["files"] if snaps else []
    total = 0
    for f in files:
        try:
            total += os.path.getsize(f)
        except OSError:
            return None
    return total


def advise_join(
    spark: SparkSession,
    left: LakehouseTable,
    right: LakehouseTable,
    key: str,
    broadcast_bytes: int = BROADCAST_BYTES,
    skew_rows_per_key: int = SKEW_ROWS_PER_KEY,
    allow_refresh: bool = True,
) -> dict:
    """Pick a join strategy from manifest metadata only. Returns
    ``{"strategy": "broadcast"|"salt"|"shuffle", "broadcast_side":
    "left"|"right"|None, "salt_side": ..., "inputs": {...},
    "bucket_hint": bool}``.

    ``allow_refresh=False`` makes the call STRICTLY O(metadata): if
    the probe side's NDV sketches don't cover its live files, the
    advisor returns a plain ``shuffle`` verdict flagged
    ``stats_missing`` instead of sketching inline (which reads every
    unsketched file — a full scan on a cold 100 TB fact). Schedulers
    should sketch asynchronously via ``maintain()`` /
    ``refresh_ndv_sketches()`` and re-advise."""
    sizes = {
        "left": table_size_bytes(left),
        "right": table_size_bytes(right),
    }
    rows = {
        "left": left.row_count() or 0,
        "right": right.row_count() or 0,
    }
    inputs = {"bytes": sizes, "rows": rows}
    # unknown size (None) is never broadcastable — rank it largest
    known = {
        s: (float("inf") if b is None else b) for s, b in sizes.items()
    }
    small, big = (
        ("left", "right") if known["left"] <= known["right"] else ("right", "left")
    )
    if known[small] <= broadcast_bytes:
        # broadcast decided on size alone — don't pay the NDV lookup
        # (first call on an unsketched table reads its data files)
        return {
            "strategy": "broadcast",
            "broadcast_side": small,
            "salt_side": None,
            "bucket_hint": False,
            "inputs": inputs,
        }
    # too big to broadcast: shuffle join — check key skew on the
    # bigger (probe) side only. NDV==0 (no sketch / all-null) counts
    # as maximally skewed: every row shares the null key.
    big_table = left if big == "left" else right
    if not allow_refresh:
        # pointer-presence only (no sidecar blob I/O): the decision
        # to bail must itself stay O(manifest)
        if not big_table.ndv_covered():
            return {
                "strategy": "shuffle",
                "broadcast_side": None,
                "salt_side": None,
                "bucket_hint": min(rows.values()) >= BUCKET_ROWS,
                "stats_missing": big,
                "inputs": inputs,
            }
    # refresh only when allowed; covered tables resolve their blobs
    # exactly once inside ndv()
    big_ndv = big_table.ndv(
        spark, columns=[key], refresh=allow_refresh
    ).get(key, 0)
    inputs[f"ndv_{key}"] = {big: big_ndv}
    per_key = rows[big] / big_ndv if big_ndv else float("inf")
    if rows[big] and per_key >= skew_rows_per_key:
        return {
            "strategy": "salt",
            "broadcast_side": None,
            "salt_side": big,
            "bucket_hint": False,
            "inputs": inputs,
        }
    return {
        "strategy": "shuffle",
        "broadcast_side": None,
        "salt_side": None,
        "bucket_hint": min(rows.values()) >= BUCKET_ROWS,
        "inputs": inputs,
    }


def join_with_advice(
    spark: SparkSession,
    left: LakehouseTable,
    right: LakehouseTable,
    key: str,
    how: str = "inner",
    n_salts: int = 8,
    **thresholds,
) -> tuple[DataFrame, dict]:
    """Join two lakehouse tables using whatever ``advise_join``
    picked; returns (result, advice). Results are strategy-invariant
    (salting/broadcast change only the physical plan), so callers can
    trust the frame regardless of the verdict."""
    advice = advise_join(spark, left, right, key, **thresholds)
    ldf, rdf = left.read(spark), right.read(spark)
    # salting flips the join sides (skewed side first), which only
    # preserves semantics for inner joins, or a left join whose
    # preserved side IS the salted one — anything else degrades to a
    # plain shuffle join rather than silently changing results
    salt_ok = advice["strategy"] == "salt" and (
        how == "inner" or (how == "left" and advice["salt_side"] == "left")
    )
    if advice["strategy"] == "salt" and not salt_ok:
        advice = {**advice, "strategy": "shuffle", "salt_side": None,
                  "salt_demoted": f"outer semantics ({how})"}
    if advice["strategy"] == "broadcast":
        if advice["broadcast_side"] == "left":
            out = F.broadcast(ldf).join(rdf, key, how)
        else:
            out = ldf.join(F.broadcast(rdf), key, how)
    elif advice["strategy"] == "salt":
        skewed, other = (
            (ldf, rdf) if advice["salt_side"] == "left" else (rdf, ldf)
        )
        out = salted_join(skewed, other, [key], n_salts=n_salts, how=how)
    else:
        out = ldf.join(rdf, key, how)
    return out, advice
