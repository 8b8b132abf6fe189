"""Gold product_catalog vector search (reference DEMO.md §7): catalog
build, embedding determinism, ANN probe plan shape, and auto-embedding
on incremental appends with O(batch) index maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.functions import embed
from biglake_iceberg_pipeline_spark.plans import product_catalog as pc
from tests.conftest import SF_SMOKE


def test_embedding_spark_matches_python_replica(spark):
    """The model seam's Spark expression and driver-side Python
    replica must agree bit-for-bit — query vectors are built with the
    replica and compared against corpus vectors from the expression."""
    texts = ["red widget brand#17 economy", "x", "", "tiny bolt 42"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {
        r["t"]: list(r["e"])
        for r in df.select(
            "t", embed.deterministic_embedding(F.col("t")).alias("e")
        ).collect()
    }
    for t in texts:
        assert got[t] == embed.deterministic_embedding_py(t), t
    # distinct texts get distinct vectors; same text same vector
    assert got["x"] != got["tiny bolt 42"]


def test_product_catalog_build(spark):
    cat = pc.build_product_catalog(spark, SF_SMOKE)
    rows = cat.limit(5).collect()
    assert set(cat.columns) == {
        "product_id", "description", "retail_price", "embedding"
    }
    for r in rows:
        assert len(r["embedding"]) == embed.EMBED_DIM
        assert r["description"] == r["description"].lower()


def test_product_catalog_ann_plan_prunes_partitions(spark):
    probe = pc.product_catalog_ann(spark, SF_SMOKE)
    got = probe.collect()
    assert len(got) == 5
    assert all(r["product_id"] != pc.SIMILAR_TO for r in got)
    sims = [r["cosine_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the __code IN probe must land on the partition column
    assert "PartitionFilters" in plan


def test_auto_embeddings_on_incremental_append(spark, tmp_path):
    """DEMO.md §7 step 4: a new product appended to the lakehouse
    catalog is embedded and indexed WITHOUT a rebuild, and an ANN
    probe for its own description finds it immediately."""
    table = pc.create_product_catalog_table(
        spark, SF_SMOKE, str(tmp_path / "catalog")
    )
    n0 = table.read(spark).count()
    snap0 = table.current_snapshot_id()
    meta0 = table.vector_index_meta()["embedding"]

    new_part = spark.createDataFrame(
        [(990001, "quantum sprocket", "Brand#99", "PROMO", 7, 123.45)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    pc.append_products(table, new_part)
    assert table.read(spark).count() == n0 + 1
    # incremental: a new snapshot, index maintained (not rebuilt — the
    # indexed_snapshot advanced with the append commit)
    meta1 = table.vector_index_meta()["embedding"]
    assert table.current_snapshot_id() == snap0 + 1
    assert meta1["indexed_snapshot"] == snap0 + 1
    assert meta1["path"] == meta0["path"]

    from biglake_iceberg_pipeline_spark.operators.vector_index import (
        probe_lakehouse_index,
    )

    qvec = embed.deterministic_embedding_py("quantum sprocket brand#99 promo")
    top = probe_lakehouse_index(
        spark, table, "embedding", qvec, k=1
    ).collect()
    assert top[0]["product_id"] == 990001
    assert top[0]["cosine_sim"] == 1.0
