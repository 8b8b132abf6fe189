"""Join-pruning operators: cut fact-table scan volume before a join.

At 100 TB the dominant cost of ``fact ⋈ dim_filtered`` is shuffling
fact rows that the dim side will reject anyway. Three escalating
answers, all JVM-side:

1. **Runtime Bloom filter (automatic).** Catalyst (Spark 3.3+) injects
   a ``BloomFilterAggregate`` on the filtered dim side and a
   ``might_contain`` predicate on the fact side
   (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by
   default). It only fires when the fact scan exceeds
   ``applicationSideScanSizeThreshold`` (10 GB) — i.e. exactly the
   cluster-scale regime; local tests must lower the threshold (see
   ``bloom_filter_confs``). It also only targets probable SHUFFLE
   joins: if the dim can broadcast by size there is no fact shuffle
   to protect and the rule correctly stays out. Nothing to call:
   write the plain join.

2. **Explicit semi-join reduction** (``semi_join_prune``): pre-filter
   the fact with a broadcast left-semi join on the dim's join keys.
   Deterministic (no false positives), works at any size, and the
   fact-side filter happens *before* the fact shuffle of the main
   join. Use when the filtered dim key set fits in a broadcast
   (≤ tens of MB) but the runtime filter didn't fire or the main join
   is a sort-merge join on a huge dim.

3. **Partition/file pruning** lives in ``sinks/lakehouse.py`` (manifest
   min/max + identity partitions) — prunes whole files, not rows.

Parity anchor: the reference pushes dim filters into BigQuery Iceberg
scans via SQL (test_data/thelook_ecommerce/silver/transformations);
this module is the Spark-shuffle-aware equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The knobs a cluster deploy would tune; tests set the thresholds to 0
# to force injection at local scale.
BLOOM_ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"
BLOOM_CREATION_THRESHOLD = (
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
)
BLOOM_APPLICATION_THRESHOLD = (
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
)


def bloom_filter_confs(force: bool = False) -> dict[str, str]:
    """Session confs governing runtime Bloom-filter injection.

    ``force=True`` zeroes the application-side scan threshold so the
    filter injects on small (test-scale) inputs — production keeps the
    default, where the filter only pays for itself past ~10 GB of fact
    scan. (The creation-side threshold is a MAXIMUM — the filter is
    only built when the dim side is small enough — so it stays at its
    default; zeroing it would disable injection entirely.)
    """
    confs = {BLOOM_ENABLED: "true"}
    if force:
        confs[BLOOM_APPLICATION_THRESHOLD] = "0"
    return confs


def semi_join_prune(
    fact: DataFrame,
    dim: DataFrame,
    on: list[tuple[str, str]],
) -> DataFrame:
    """Shrink ``fact`` to rows whose keys appear in ``dim`` via a
    broadcast left-semi join. ``on`` is [(fact_col, dim_col), ...].

    The dim side is projected to its join keys and de-duplicated
    before broadcast, so the broadcast payload is the distinct key
    set, not the full dim. Apply BEFORE a big join/agg so the pruned
    fact is what gets shuffled.
    """
    keys = dim.select(*[F.col(d).alias(f"__k_{i}") for i, (_, d) in enumerate(on)])
    cond: Column | None = None
    for i, (f_col, _) in enumerate(on):
        c = fact[f_col] == F.col(f"__k_{i}")
        cond = c if cond is None else (cond & c)
    return fact.join(F.broadcast(keys.distinct()), cond, "left_semi")
