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
    # gzip-transparent (detect.text_head): delimiter/header detection
    # must see the inner text of a .csv.gz, not deflate bytes
    from biglake_iceberg_pipeline_spark.sources.detect import text_head

    return text_head(path, 65536).splitlines()[:n]


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


def _excel_rows_to_df(
    spark: SparkSession, header: list[str], rows: list[list]
) -> DataFrame:
    """Schema inference matching the CSV path's spirit: a column whose
    every non-null value is numeric becomes double, else string."""
    from biglake_iceberg_pipeline_spark.operators.cleaning import (
        normalize_column_names,
    )

    n = len(header)
    is_num = [True] * n
    for r in rows:
        for i in range(n):
            v = r[i] if i < len(r) else None
            if v is None:
                continue
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                is_num[i] = False
    typed = []
    for r in rows:
        padded = list(r) + [None] * (n - len(r))
        typed.append(
            tuple(
                (float(v) if is_num[i] else (None if v is None else str(v)))
                if padded[i] is not None
                else None
                for i, v in enumerate(padded)
            )
        )
    schema = ", ".join(
        f"`{c}` {'double' if is_num[i] else 'string'}"
        for i, c in enumerate(header)
    )
    return normalize_column_names(spark.createDataFrame(typed, schema))


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """Excel ingestion (reference load_excel.sql — the loader handles
    .xlsx inboxes end-to-end). Backed by the dependency-free
    SpreadsheetML codec in sources/xlsx_lite.py; single files parse
    driver-side (an .xlsx is definitionally small — the format caps at
    ~1M rows), directories of them distribute via read_excel_dir."""
    from biglake_iceberg_pipeline_spark.sources.xlsx_lite import read_xlsx

    header, rows = read_xlsx(path)
    return _excel_rows_to_df(spark, header, rows)


def read_excel_dir(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed many-file Excel ingestion: binaryFile scan ships
    each workbook's bytes to an executor, mapInPandas parses with the
    stdlib codec — the driver never sees file contents, so a 10k-file
    inbox ingests at executor parallelism. All files must share one
    header (first file wins the schema, like Spark's CSV dir read)."""
    import pandas as pd

    from biglake_iceberg_pipeline_spark.sources.xlsx_lite import read_xlsx

    bin_df = spark.read.format("binaryFile").load(path_glob)
    first = bin_df.select("content").first()
    if first is None:
        raise ValueError(f"no files matched {path_glob}")
    header, rows0 = read_xlsx(bytes(first["content"]))
    schema = _excel_rows_to_df(spark, header, rows0).schema

    def parse(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                h, rows = read_xlsx(bytes(blob))
                out = pd.DataFrame(rows, columns=h)
                out.columns = [f.name for f in schema.fields][: len(h)]
                yield out

    return bin_df.select("content").mapInPandas(parse, schema)


def read_auto(spark: SparkSession, path: str) -> DataFrame:
    """The agent's entry point: detect format, dispatch. Gzipped text
    feeds (.csv.gz / .jsonl.gz) work end-to-end: detection sniffs the
    inner format and Spark's readers decompress by extension."""
    from biglake_iceberg_pipeline_spark.sources.detect import is_gzipped

    gz = is_gzipped(path)
    if gz and not path.lower().endswith(".gz"):
        # Hadoop's GzipCodec maps EXACTLY the '.gz' suffix; an
        # extensionless (or '.gzip') file would be read as deflate
        # garbage with no error.
        raise ValueError(
            f"{path} is gzip-compressed but lacks a .gz extension; "
            "rename it so Spark's reader selects the codec"
        )
    fmt = detect_format(path)
    if gz and fmt in ("parquet", "orc", "excel"):
        # only the TEXT readers decompress transparently; binary
        # formats would feed gzip bytes to their own codec
        raise ValueError(
            f"{path} is a gzip-wrapped {fmt} file; Spark cannot "
            "decompress binary formats — decompress it first"
        )
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
