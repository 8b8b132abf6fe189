"""Currency conversion as a broadcast rate-table join.

Parity: the reference registers a Cloud Run remote function
`bronze.convert_to_usd(price, currency)` and calls it during the gold
build (DEMO.md §4). Spark-first replacement: a broadcast hash join
against a tiny rates dimension — zero network round-trips per row,
stays inside whole-stage codegen, and at 100 TB the rate table is a
one-block broadcast instead of 10^11 RPC calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.functions.numeric import money_round

# Static demo rates (the reference's function would consult a live API;
# determinism matters more here).
USD_RATES: list[tuple[str, float]] = [
    ("USD", 1.0),
    ("EUR", 1.08),
    ("GBP", 1.26),
    ("JPY", 0.0067),
]


def rates_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(USD_RATES, "currency string, usd_rate double")


def convert_to_usd(
    spark: SparkSession, df: DataFrame, price_col: str, currency_col: str
) -> DataFrame:
    """Add `{price_col}_usd` via broadcast join on the currency code."""
    rates = F.broadcast(rates_df(spark))
    return (
        df.join(rates, df[currency_col] == rates.currency, "left")
        .withColumn(
            f"{price_col}_usd",
            money_round(F.col(price_col) * F.col("usd_rate"), 2),
        )
        .drop("currency", "usd_rate")
    )
