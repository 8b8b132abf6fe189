"""Remote-model function seam (DEMO.md §5, AI.GENERATE_TEXT).

The reference calls Gemini inline from SQL to standardize addresses.
The Spark-native seam for any per-row model call is an ARROW-BATCHED
pandas UDF: each executor receives columnar batches and makes ONE
call (model RPC, local model forward pass, ...) per batch instead of
per row — the same batching BigQuery does server-side for
AI.GENERATE_TEXT. Swap ``standardize_address_rules`` for a real
endpoint client and nothing else changes: partitioning, batch shape,
and retry surface are already right.

No model runs in this container, so the shipped implementation is a
deterministic rule pass (USPS-ish suffix expansion + state-code
casing) — which also makes the operator DuckDB-oracle-checkable,
pinning the batching plumbing end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# (pattern, replacement) applied in order to the lowercased address.
# Space-delimited patterns so partial words never match; every rule is
# plain-regex so the DuckDB oracle can run the identical chain.
ADDRESS_RULES: tuple[tuple[str, str], ...] = (
    (r" st\. ", " street "),
    (r" ave ", " avenue "),
    (r" rd ", " road "),
    (r" blvd ", " boulevard "),
    (r" ma$", " MA"),
)


def standardize_address_rules(addr: pd.Series) -> pd.Series:
    """Deterministic stand-in for the model call (one vectorized pass
    per Arrow batch)."""
    out = addr.str.lower()
    for pat, rep in ADDRESS_RULES:
        out = out.str.replace(pat, rep, regex=True)
    return out


def standardize_address_col(col: Column) -> Column:
    """Column-expression entry point for the model seam. The UDF is
    built per call (decorating at import time would require an active
    SparkSession before the module can even load)."""
    udf = pandas_udf(standardize_address_rules, "string")
    return udf(col)
