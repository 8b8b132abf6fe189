"""Export writers (reference sql/export/to_{parquet,csv,json,jsonl,
excel}.sql — the agent's staging-bucket output formats)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def to_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def to_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def to_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Spark's json sink is line-delimited already (one object/line)."""
    df.write.mode(mode).json(path)


def to_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Alias of jsonl at scale — a single JSON array doesn't shard;
    the reference's to_json.sql also emits an array only for small
    exports."""
    to_jsonl(df, path, mode)


def to_excel(df: DataFrame, path: str) -> None:
    """Driver-side export via the stdlib SpreadsheetML codec (an .xlsx
    deliverable is definitionally small — the format caps at ~1M rows;
    reference to_excel.sql is the same single-file shape)."""
    from biglake_iceberg_pipeline_spark.sources.xlsx_lite import write_xlsx

    rows = [tuple(r) for r in df.collect()]
    write_xlsx(path, list(df.columns), rows)
