"""SemDeDup semantic dedup (operators/semdedup.py): single-cell
degradation to the exact transitive closure, precision-1 subset
property under real clustering, determinism, and the unassessable-row
contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import semdedup


def _vec(deg: float) -> list[float]:
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


@pytest.fixture()
def chain_df(spark):
    # A~B and B~C at cos20° ≈ 0.94 each, but A~C at cos40° ≈ 0.77:
    # transitive closure must group all three; D is unique
    rows = [
        (1, _vec(0.0)),
        (2, _vec(20.0)),
        (3, _vec(40.0)),
        (4, _vec(90.0)),
    ]
    return spark.createDataFrame(rows, "id long, v array<double>")


def test_single_cell_is_exact_transitive_closure(chain_df):
    out = semdedup.semantic_dedup(
        chain_df, "id", "v", n_clusters=1, threshold=0.9
    ).collect()
    got = {r["id"]: (r["sem_group"], r["keep"]) for r in out}
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (None, True),
    }


def test_null_and_ragged_vectors_are_kept_not_dropped(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, None),
        (4, [1.0]),  # ragged: wrong dim
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = semdedup.semantic_dedup(
        df, "id", "v", n_clusters=1, threshold=0.9
    ).collect()
    got = {r["id"]: (r["sem_cell"], r["keep"]) for r in out}
    assert got[1] == (0, True)
    assert got[2] == (0, False)
    assert got[3][0] == -1 and got[3][1]
    assert got[4][0] == -1 and got[4][1]


def test_explicit_centroids_skip_training(chain_df, monkeypatch):
    def boom(*a, **k):
        raise AssertionError("training must not run")

    monkeypatch.setattr(semdedup, "train_kmeans_centroids", boom)
    out = semdedup.semantic_dedup(
        chain_df,
        "id",
        "v",
        threshold=0.9,
        centroids=[[1.0, 0.0], [0.0, 1.0]],
    ).collect()
    # cells split the chain: 1,2 near (1,0); 3 is at 40° — nearer
    # (1,0) too (cos40 > cos50); 4 near (0,1). Within-cell closure
    # still groups 1..3.
    got = {r["id"]: r["keep"] for r in out}
    assert got == {1: True, 2: False, 3: False, 4: True}


def test_clustered_drops_are_subset_of_exact_drops(spark, sf_dir):
    """Precision 1: every row SemDeDup drops under real k-means cells
    is also dropped by the exact single-cell closure (cells only
    MISS pairs, never invent them)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        r["vec_id"]
        for r in semdedup.semantic_dedup(
            emb, "vec_id", "embedding", n_clusters=1, threshold=0.4
        )
        .where(~F.col("keep"))
        .collect()
    }
    clustered = {
        r["vec_id"]
        for r in semdedup.semantic_dedup(
            emb, "vec_id", "embedding", n_clusters=4, threshold=0.4
        )
        .where(~F.col("keep"))
        .collect()
    }
    assert clustered <= exact
    assert exact  # the fixture corpus does contain near-dups


def test_deterministic_across_runs(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def run():
        return sorted(
            r["vec_id"]
            for r in semdedup.semantic_dedup(
                emb, "vec_id", "embedding", n_clusters=4, threshold=0.4
            )
            .where(F.col("keep"))
            .collect()
        )

    assert run() == run()


def test_filter_returns_original_columns_only(chain_df):
    out = semdedup.semantic_dedup_filter(
        chain_df, id_col="id", vec_col="v", n_clusters=1, threshold=0.9
    )
    assert out.columns == ["id", "v"]
    assert sorted(r["id"] for r in out.collect()) == [1, 4]


def test_registered_query_centroid_cap_binds_and_matches_oracle(
    spark, duck
):
    """VERDICT r9 item 4: the registered semantic_dedup bounds its
    driver-side centroid collect. Exercise a BINDING cap (2 << the
    uncapped k) end-to-end: the Spark query and the parameterized
    DuckDB oracle replay the same cap and still agree row-for-row."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from biglake_iceberg_pipeline_spark.plans.llm_ops import (
        _semantic_dedup_sql,
        semantic_dedup_q,
    )

    out = semantic_dedup_q(spark, SF_SMOKE, max_k=2)
    # the cap actually bound the quantizer: only cells {0, 1} appear
    cells = {r["sem_cell"] for r in out.select("sem_cell").collect()}
    assert cells <= {0, 1, -1} and len(cells & {0, 1}) == 2
    assert_matches_oracle(out, duck, _semantic_dedup_sql(max_k=2))
