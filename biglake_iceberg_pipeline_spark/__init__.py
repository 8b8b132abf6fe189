"""PySpark-native lakehouse analytics engine.

Re-expresses the capabilities of the reference pipeline
(pmgraham/biglake-iceberg-pipeline: an event-driven GCP BigLake/Iceberg
medallion pipeline with a DuckDB-backed data-cleaning agent) as an
idiomatic PySpark library: declarative DataFrame operators, Catalyst-
optimized plans, Structured Streaming ingest, and a parquet+manifest
lakehouse table layer — designed for 100 TB scale.
"""

from biglake_iceberg_pipeline_spark.session import get_spark


def __getattr__(name: str):
    """Lazy top-level API: the heavyweight subsystems import on first
    touch, so ``import biglake_iceberg_pipeline_spark`` stays cheap.

    >>> import biglake_iceberg_pipeline_spark as bip
    >>> bip.LakehouseTable(path)           # lakehouse tables
    >>> bip.MaterializedView(...)          # auto-refreshed views
    >>> bip.read_auto(spark, "inbox/f.csv.gz")
    >>> bip.run_medallion_flow(...)        # inbox -> bronze/silver/gold
    >>> bip.curate_documents(...)          # LLM training-data pipeline
    """
    lazy = {
        "LakehouseTable": (
            "biglake_iceberg_pipeline_spark.sinks.lakehouse",
            "LakehouseTable",
        ),
        "MaterializedView": (
            "biglake_iceberg_pipeline_spark.sinks.matview",
            "MaterializedView",
        ),
        "read_auto": (
            "biglake_iceberg_pipeline_spark.sources.readers",
            "read_auto",
        ),
        "run_medallion_flow": (
            "biglake_iceberg_pipeline_spark.plans.medallion_flow",
            "run_medallion_flow",
        ),
        "curate_documents": (
            "biglake_iceberg_pipeline_spark.plans.pipeline",
            "curate_documents",
        ),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)


__all__ = [
    "get_spark",
    "LakehouseTable",
    "MaterializedView",
    "read_auto",
    "run_medallion_flow",
    "curate_documents",
]
__version__ = "0.1.0"
