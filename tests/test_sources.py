"""Reader + detection tests (the agent's ingestion surface)."""

from __future__ import annotations

import pytest

from biglake_iceberg_pipeline_spark.sources import detect, readers


def test_detect_format_by_extension(tmp_path):
    assert detect.detect_format("x.csv") == "csv"
    assert detect.detect_format("x.jsonl") == "json"
    assert detect.detect_format("x.parquet") == "parquet"
    assert detect.detect_format("x.xlsx") == "excel"


def test_detect_format_by_content(tmp_path):
    p = tmp_path / "mystery"
    p.write_bytes(b"PAR1....")
    assert detect.detect_format(str(p)) == "parquet"
    p2 = tmp_path / "mystery2"
    p2.write_text('{"a": 1}')
    assert detect.detect_format(str(p2)) == "json"
    p3 = tmp_path / "mystery3"
    p3.write_text("a,b,c\n1,2,3\n")
    assert detect.detect_format(str(p3)) == "csv"
    p4 = tmp_path / "mystery4"
    p4.write_bytes(b"ORC\x11binarystuff")
    assert detect.detect_format(str(p4)) == "orc"
    # text that merely starts with the letters ORC is not ORC
    p5 = tmp_path / "mystery5"
    p5.write_text("ORCHARD,city\n1,x\n")
    assert detect.detect_format(str(p5)) == "csv"
    p6 = tmp_path / "mystery6"
    p6.write_bytes(b"")
    with pytest.raises(ValueError, match="empty"):
        detect.detect_format(str(p6))


def test_detect_delimiter():
    assert detect.detect_delimiter(["a,b,c", "1,2,3"]) == ","
    assert detect.detect_delimiter(["a\tb\tc", "1\t2\t3"]) == "\t"
    assert detect.detect_delimiter(["a|b", "1|2"]) == "|"


def test_detect_header():
    assert detect.detect_header(["name,age", "bob,3"], ",") is True
    assert detect.detect_header(["1,2", "3,4"], ",") is False


def test_read_csv_auto_header(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("name,age\nbob,3\nalice,5\n")
    df = readers.read_csv(spark, str(p))
    assert df.columns == ["name", "age"]
    assert df.count() == 2


def test_read_csv_no_header(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("1,2\n3,4\n")
    df = readers.read_csv(spark, str(p))
    assert df.count() == 2
    assert df.columns == ["_c0", "_c1"]


def test_read_csv_lenient_malformed(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2\nnot_a_number,xyz\n")
    df = readers.read_csv(spark, str(p))
    assert df.count() == 2  # malformed row survives in PERMISSIVE mode


def test_read_json_lines_and_array(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    assert readers.read_json(spark, str(p)).count() == 2
    p2 = tmp_path / "t2.json"
    p2.write_text('[{"a": 1}, {"a": 2}, {"a": 3}]')
    assert readers.read_json(spark, str(p2)).count() == 3


def test_read_auto_dispatch(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("x,y\n1,2\n")
    assert readers.read_auto(spark, str(p)).count() == 1


def test_read_excel_roundtrip(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.sources.xlsx_lite import (
        read_xlsx,
        write_xlsx,
    )

    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        ["Order ID", "Amount", "Status"],
        [(1.0, 10.5, "open"), (2.0, None, "closed"), (3.0, 7.25, "it's ok")],
    )
    # codec-level roundtrip
    header, rows = read_xlsx(p)
    assert header == ["Order ID", "Amount", "Status"]
    assert rows[1] == [2.0, None, "closed"]
    assert rows[2][2] == "it's ok"  # escaping survives
    # spark-level: snake_cased columns, numeric inference
    df = readers.read_excel(spark, p)
    assert df.columns == ["order_id", "amount", "status"]
    got = {r["order_id"]: r for r in df.collect()}
    assert got[2.0]["amount"] is None and got[1.0]["amount"] == 10.5
    assert dict(df.dtypes)["amount"] == "double"


def test_read_excel_dir_distributed(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.sources.xlsx_lite import write_xlsx

    for i in range(3):
        write_xlsx(
            str(tmp_path / f"part{i}.xlsx"),
            ["id", "v"],
            [(float(i * 2), f"a{i}"), (float(i * 2 + 1), f"b{i}")],
        )
    df = readers.read_excel_dir(spark, str(tmp_path / "*.xlsx"))
    assert df.count() == 6
    assert {r["v"] for r in df.collect()} == {
        "a0", "b0", "a1", "b1", "a2", "b2"
    }


def test_to_excel_export_roundtrip(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.sinks.export import to_excel
    from biglake_iceberg_pipeline_spark.sources.xlsx_lite import read_xlsx

    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", None)], "id long, s string, v double"
    )
    p = str(tmp_path / "out.xlsx")
    to_excel(df, p)
    header, rows = read_xlsx(p)
    assert header == ["id", "s", "v"]
    assert sorted(rows)[0] == [1.0, "x", 1.5]


def test_export_roundtrip(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.sinks import export

    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    export.to_parquet(df, str(tmp_path / "p"))
    assert spark.read.parquet(str(tmp_path / "p")).count() == 5
    export.to_csv(df, str(tmp_path / "c"))
    assert (
        spark.read.option("header", "true").csv(str(tmp_path / "c")).count()
        == 5
    )
    export.to_jsonl(df, str(tmp_path / "j"))
    assert spark.read.json(str(tmp_path / "j")).count() == 5


def test_iceberg_configs_gate(tmp_path, monkeypatch):
    from biglake_iceberg_pipeline_spark.session import iceberg_configs

    # no jar configured -> no-op (manifest lakehouse stands in)
    monkeypatch.delenv("SPARK_GRAFT_ICEBERG_JAR", raising=False)
    assert iceberg_configs() == {}
    # nonexistent jar path -> still a no-op, never a broken session
    assert iceberg_configs(jar_path=str(tmp_path / "nope.jar")) == {}
    # a present jar activates the catalog wiring
    jar = tmp_path / "iceberg-spark-runtime.jar"
    jar.write_bytes(b"PK")
    cfg = iceberg_configs(jar_path=str(jar), catalog="lake")
    assert cfg["spark.sql.catalog.lake"].endswith("SparkCatalog")
    assert "IcebergSparkSessionExtensions" in cfg["spark.sql.extensions"]
    assert cfg["spark.jars"] == str(jar)


def test_gzipped_csv_and_jsonl_end_to_end(spark, tmp_path):
    """.csv.gz / .jsonl.gz inbox files: format, delimiter, header, and
    JSON-shape detection all sniff the INNER content; Spark readers
    decompress by extension, so read_auto works unchanged."""
    import gzip

    from biglake_iceberg_pipeline_spark.sources.detect import (
        detect_format,
        detect_json_lines,
    )
    from biglake_iceberg_pipeline_spark.sources.readers import read_auto

    csv_gz = str(tmp_path / "orders.csv.gz")
    with gzip.open(csv_gz, "wt") as f:
        f.write("Order ID;Name\n1;alice\n2;bob\n")
    assert detect_format(csv_gz) == "csv"
    rows = {r["Order ID"]: r["Name"] for r in read_auto(spark, csv_gz).collect()}
    assert rows == {1: "alice", 2: "bob"}  # header + ';' detected

    jl_gz = str(tmp_path / "events.jsonl.gz")
    with gzip.open(jl_gz, "wt") as f:
        f.write('{"a": 1}\n{"a": 2}\n')
    assert detect_format(jl_gz) == "json"
    assert detect_json_lines(jl_gz) is True
    assert {r["a"] for r in read_auto(spark, jl_gz).collect()} == {1, 2}

    # magic-only detection: no extension at all still sniffs the inner
    # format, but read_auto refuses (Spark picks codecs by extension)
    import pytest as _pytest

    bare = str(tmp_path / "mystery")
    with gzip.open(bare, "wt") as f:
        f.write("a,b\n1,2\n")
    assert detect_format(bare) == "csv"
    with _pytest.raises(ValueError, match="lacks a .gz extension"):
        read_auto(spark, bare)
