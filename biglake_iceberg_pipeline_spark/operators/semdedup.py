"""Semantic deduplication over an embedding column (SemDeDup).

The embedding-space analog of MinHash dedup for LLM training data
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540): paraphrases and templated
rewrites that share no n-grams still land near each other in embedding
space. The published recipe — k-means the corpus into cells, compare
pairs only WITHIN a cell, keep one representative per near-duplicate
group — bounds the quadratic pair step to (n/k)² per cell instead of
n² overall.

Spark-first composition of existing operators, nothing bespoke:

1. cluster: MLlib k-means on a sample (`vector_index.
   train_kmeans_centroids` — driver holds k×dim doubles, tiny at any
   corpus size), cell assignment as one Arrow-batched argmin kernel
   (`assign_centroid`).
2. pair: within-cell cosine ≥ τ via the same Arrow cosine kernel the
   exact near-dup path uses — the self-join's equi-key is the cell
   id, so Spark hash-partitions by cell and no cross-cell pair is
   ever materialized.
3. group: transitive closure with `graph.connected_components`
   (A~B, B~C ⇒ one group even though A~C was never compared), then
   keep = the min-id representative per group.

At 100 TB: scale k with the corpus (cells of a few thousand vectors
keep the per-cell quadratic trivial); training reads a bounded sample;
the only full-data passes are the assignment scan and the
cell-partitioned self-join. Rows whose vector is NULL or ragged can't
be assessed — they are KEPT and flagged with cell -1, never silently
dropped.

The approximation is the published one: near-duplicates that k-means
splits across cells are missed (recall<1, precision=1 given exact
within-cell cosine). `n_clusters=1` degrades to the exact
single-bucket transitive closure — the oracle the tests pin against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.dedup import cosine_pandas
from biglake_iceberg_pipeline_spark.operators.graph import (
    connected_components,
)
from biglake_iceberg_pipeline_spark.operators.vector_index import (
    assign_centroid,
    train_kmeans_centroids,
)


def cell_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    threshold: float,
    round_digits: int | None = None,
) -> DataFrame:
    """Within-cell pairs with cosine ≥ threshold — the dedup
    candidate edge list. Same shape as
    ``dedup.embedding_near_dup_pairs`` minus its presentation-order
    sort (these edges feed a join, not a result set; an ordering
    exchange would be pure waste mid-plan)."""
    g = df.select(
        F.col(id_col).alias("__id"),
        F.col(cell_col).alias("__cell"),
        F.col(vec_col).alias("__v"),
    )
    a, b = g.alias("a"), g.alias("b")
    cos = cosine_pandas(F.col("a.__v"), F.col("b.__v"))
    if round_digits is not None:
        # oracle-parity mode: the kernel is bit-identical to DuckDB's
        # list_reduce fold, so a rounded threshold compare makes the
        # pair SET engine-exact (the dedup_embedding convention)
        cos = F.round(cos, round_digits)
    return (
        a.join(
            b,
            (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cos.alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= F.lit(threshold))
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 7,
    sample_fraction: float | None = None,
    centroids: list[list[float]] | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """All input rows, annotated with the SemDeDup verdict:

    - ``sem_cell`` (int): k-means cell, -1 for NULL/ragged vectors.
    - ``sem_group`` (long): near-duplicate group id (the group's min
      ``id_col``) for rows in a group of ≥2; NULL for unique rows.
    - ``keep`` (bool): True for the min-id representative of each
      group, every unique row, and every unassessable (-1) row.

    Pass ``centroids`` to reuse a trained quantizer (e.g. the IVF
    index's) and skip training. Filter with ``WHERE keep`` or use
    :func:`semantic_dedup_filter`."""
    if centroids is None:
        if n_clusters == 1:
            # exact mode (and MLlib KMeans refuses k=1 anyway): one
            # trivial centroid puts every well-formed vector in cell 0
            # — assign_centroid still flags NULL/ragged rows as -1
            probe = (
                df.select(vec_col)
                .where(F.col(vec_col).isNotNull())
                .first()
            )
            if probe is None:
                raise ValueError(f"no non-null vectors in {vec_col!r}")
            centroids = [[0.0] * len(probe[0])]
        else:
            centroids = train_kmeans_centroids(
                df,
                vec_col,
                n_centroids=n_clusters,
                seed=seed,
                sample_fraction=sample_fraction,
            )
    # persist: the assignment kernel is a full-corpus scan and the
    # frame feeds BOTH sides of the cell self-join plus the final
    # verdict join — without the cache it would re-run 3+ times
    # (connected_components' checkpoint materializes the join, and
    # every downstream action replays the lineage)
    assigned = df.withColumn(
        "sem_cell", assign_centroid(F.col(vec_col), centroids)
    ).persist()
    pairs = cell_near_dup_pairs(
        assigned.where(F.col("sem_cell") >= 0),
        id_col,
        vec_col,
        "sem_cell",
        threshold,
        round_digits=round_digits,
    )
    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("id").alias("__cid"),
        F.col("component").alias("sem_group"),
    )
    out = assigned.join(
        comp, assigned[id_col] == comp["__cid"], "left"
    ).drop("__cid")
    return out.withColumn(
        "keep",
        F.col("sem_group").isNull()
        | (F.col(id_col) == F.col("sem_group")),
    )


def semantic_dedup_filter(df: DataFrame, **kwargs) -> DataFrame:
    """The deduplicated corpus: input columns only, duplicates
    dropped (one representative kept per semantic group)."""
    return (
        semantic_dedup(df, **kwargs)
        .where(F.col("keep"))
        .drop("sem_cell", "sem_group", "keep")
    )
