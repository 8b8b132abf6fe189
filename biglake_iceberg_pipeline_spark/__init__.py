"""PySpark-native lakehouse analytics engine.

Re-expresses the capabilities of the reference pipeline
(pmgraham/biglake-iceberg-pipeline: an event-driven GCP BigLake/Iceberg
medallion pipeline with a DuckDB-backed data-cleaning agent) as an
idiomatic PySpark library: declarative DataFrame operators, Catalyst-
optimized plans, Structured Streaming ingest, and a parquet+manifest
lakehouse table layer — designed for 100 TB scale.
"""

from biglake_iceberg_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
