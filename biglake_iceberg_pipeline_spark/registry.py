"""Central registry of (query, oracle) pairs across all plan modules.

Every operator claimed done in SURVEY.md §2 registers here; the driver
contract (__spark_entry__.py) re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from biglake_iceberg_pipeline_spark.plans import (
        analytics,
        curation,
        gold,
        llm_ops,
        profiling_quality,
        streaming_schema,
        temporal,
        tpch,
        tpch2,
    )

    return [
        tpch,
        tpch2,
        gold,
        profiling_quality,
        llm_ops,
        streaming_schema,
        analytics,
        curation,
        temporal,
    ]


def spark_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        for key, fn in mod.QUERIES.items():
            if key in out:
                raise ValueError(f"duplicate query key {key!r}")
            out[key] = fn
    return out


def oracle_queries() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLE", {}))
    return out
