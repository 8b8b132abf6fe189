"""Connected-components / dedup clustering unit tests."""

from __future__ import annotations

from biglake_iceberg_pipeline_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignment,
)


def test_chain_merges_transitively(spark):
    # A-B, B-C, C-D: one component even though A-D never paired
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    comp = {
        r["id"]: r["component"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_direction_and_duplicates_ignored(spark):
    edges = spark.createDataFrame(
        [(5, 2), (2, 5), (5, 2), (2, 2)], "src long, dst long"
    )
    comp = {
        r["id"]: r["component"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert comp == {2: 2, 5: 2}


def test_cluster_assignment_singletons_canonical(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_cluster_assignment(docs, pairs, "doc_id").collect()
    }
    assert rows[0] == (0, True)
    assert rows[3] == (0, False)
    assert rows[5] == (0, False)
    # untouched docs are their own canonical singleton clusters
    assert rows[1] == (1, True) and rows[4] == (4, True)


def test_keep_best_in_cluster(spark):
    """Canonical = highest score per cluster, ties to the lowest id;
    singletons are canonical; exactly one canonical per cluster."""
    from biglake_iceberg_pipeline_spark.operators.graph import (
        keep_best_in_cluster,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, 10, 0.5),
            (2, 10, 0.9),   # winner of cluster 10
            (3, 10, 0.9),   # same score, higher id -> not canonical
            (4, 40, 0.1),   # singleton
        ],
        "id long, cluster long, score double",
    )
    got = {
        r["id"]: r["is_canonical"]
        for r in keep_best_in_cluster(
            df.withColumn("is_canonical", F.lit(False)),
            "id",
            "cluster",
            "score",
        ).collect()
    }
    assert got == {1: False, 2: True, 3: False, 4: True}
