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


def test_star_contraction_matches_union_find_on_random_graphs(spark):
    """Property pin for the r10 star-contraction pre-pass: components
    over random graphs (dense cliques, chains, isolated edges, mixed)
    must equal a driver-side union-find — the contraction must never
    split or merge a component."""
    import random

    from biglake_iceberg_pipeline_spark.operators.graph import (
        connected_components,
    )

    rng = random.Random(7)
    for trial in range(6):
        n = rng.randint(5, 60)
        edges = set()
        # mix: one clique, one chain, random edges
        clique = rng.sample(range(n), min(n, rng.randint(2, 8)))
        for i in clique:
            for j in clique:
                if i < j:
                    edges.add((i, j))
        chain = rng.sample(range(n), min(n, rng.randint(2, 10)))
        for a, b in zip(chain, chain[1:]):
            edges.add((min(a, b), max(a, b)) if a != b else (a, a + 1))
        for _ in range(rng.randint(0, 2 * n)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        # driver-side union-find reference
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {
            v: find(v)
            for v in {x for e in edges for x in e}
        }
        df = spark.createDataFrame(
            sorted(edges), "id_a long, id_b long"
        )
        got = {
            r["id"]: r["component"]
            for r in connected_components(df, "id_a", "id_b").collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_long_chain_still_converges(spark):
    """A 40-node path (diameter 39) — the star pre-pass shortens it
    but the min-label loop must still converge to one component
    within max_iter."""
    from biglake_iceberg_pipeline_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    got = connected_components(df, "id_a", "id_b").collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == 41


def test_reliable_checkpoint_mode(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_CHECKPOINT_DIR swaps every pin from executor-local
    localCheckpoint to reliable checkpoint() against the directory
    (fault tolerance at cluster scale): identical labels, and the
    checkpoint dir actually receives RDD data."""
    import os

    from biglake_iceberg_pipeline_spark.operators.graph import (
        connected_components,
    )

    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(ckpt))
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, "id_a", "id_b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    written = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(ckpt)
        for f in fs
    ]
    assert written, "reliable checkpoint wrote nothing to the dir"
