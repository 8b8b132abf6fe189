"""Sequence packing for LLM training-data export.

Pretraining pipelines don't feed one document per training example —
they CONCATENATE documents along a token axis and SPLIT at the
context length, so every sequence is exactly ``cap`` tokens and no
compute is wasted on padding. The packing assignment is the
deterministic "concatenate-and-split" rule: lay documents out
contiguously in a canonical order; a document whose span starts at
global token offset ``o`` belongs to sequence ``floor(o / cap)`` at
in-sequence offset ``o % cap`` (documents may straddle a boundary —
the loader continues them in the next sequence, standard GPT-style
packing).

The hard part at scale is the GLOBAL running offset: a naive
``Window.orderBy(id)`` with no partition key collapses the whole
corpus into ONE task — the classic single-partition window
bottleneck. This implementation computes the prefix sum in two
levels, the textbook distributed scan:

1. range-partition + sort by the canonical order key (one shuffle —
   the same shuffle any deterministic layout needs);
2. per-partition token SUBTOTALS (tiny: one row per partition) are
   collected and prefix-summed driver-side — O(partitions), bounded;
3. each partition's running sum is a PARTITION-LOCAL window (runs in
   parallel) plus its broadcast prefix offset.

Every step is a DataFrame op; the result is independent of the
physical partitioning (the range boundaries only decide WHERE the
subtotal splits fall, not the final offsets), so the assignment is
reproducible across cluster sizes — and exactly replayable as one
SQL window function, which is what the DuckDB oracle does.

Reference-scope parity: the reference exports curated tables for
training consumers (sql/export/*); packing is the layout step those
consumers run next. Composes with sinks/shards.py: pack first, then
shard by ``seq_id`` so each training shard holds whole sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.session import pin


def _packing_plan(
    df: DataFrame,
    id_col: str,
    token_col,
    cap: int,
    n_partitions: int | None,
):
    """Build the (persisted layout, lazy packed frame) pair. Split
    out so tests can pin the EXECUTED plan of the real pipeline —
    ``pack_sequences`` checkpoints the result, which truncates the
    lineage a plan assertion needs."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    base = df.select(
        F.col(id_col), tok.cast("long").alias("n_tokens")
    )
    if n_partitions is None:
        n_partitions = base.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"
        )
        n_partitions = int(n_partitions)
    # level 1: one range shuffle puts ids in globally sorted partition
    # ranges; sortWithinPartitions finishes the total order
    laid = (
        base.repartitionByRange(n_partitions, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()
    # level 2: per-partition subtotals → driver prefix sum.
    # O(partitions) rows — bounded metadata, not data
    subtotals = {
        r["__pid"]: r["s"]
        for r in laid.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    offsets = {}
    run = 0
    for pid in sorted(subtotals):
        offsets[pid] = run
        run += subtotals[pid] or 0
    off_df = laid.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        "__pid int, __poff long",
    )
    # level 3: partition-LOCAL running sum (parallel windows) +
    # broadcast prefix offset = the global start offset. seq_id uses
    # exact integer division (`div`) — float floor(x / cap) rounds
    # through a double and can drift off the oracle's exact `//`
    # once offsets pass 2^53
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        laid.withColumn(
            "__local", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .join(F.broadcast(off_df), "__pid")
        .withColumn("__start", F.col("__poff") + F.col("__local"))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.expr(f"__start div {int(cap)}").alias("seq_id"),
            (F.col("__start") % cap).alias("seq_offset"),
        )
    )
    return laid, out


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col,
    cap: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Assign every document a training-sequence id and offset under
    concatenate-and-split packing at ``cap`` tokens.

    ``token_col`` is a column name or Column with the per-document
    token count. Returns the input columns ``id_col``/``n_tokens``
    plus ``seq_id`` (bigint, 0-based) and ``seq_offset`` (bigint,
    the document's start within its sequence). Documents are laid
    out in ascending ``id_col`` order — the canonical order that
    makes the packing a pure function of the corpus.
    """
    laid, out = _packing_plan(df, id_col, token_col, cap, n_partitions)
    try:
        # materialize before unpersist: callers get a frame that no
        # longer depends on the cached layout
        out = pin(out, eager=True)
    finally:
        laid.unpersist()
    return out


def packing_summary(packed: DataFrame) -> DataFrame:
    """Per-sequence audit over a ``pack_sequences`` result: how many
    documents START in each sequence, the first start offset, and
    the total tokens of those starting documents (a straddling
    document's tokens count here in full — per-sequence FILL
    accounting would need the split sizes, which the assignment
    intentionally leaves to the loader)."""
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("seq_offset").alias("first_offset"),
            F.sum("n_tokens").alias("tokens_started"),
        )
        .orderBy("seq_id")
    )
