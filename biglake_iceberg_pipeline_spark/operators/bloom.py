"""Per-file Bloom filters for point-lookup file skipping.

The Iceberg idea (puffin bloom blobs / parquet column bloom filters):
footer min/max stats prune range predicates, but an equality probe on
a high-cardinality column that is NOT the sort key intersects almost
every file's [min, max] — a point lookup on ``user_id`` over a table
sorted by time scans everything. A per-file Bloom filter answers
"definitely not in this file" for exact values, so the scan plans
only the files that MIGHT contain the key, no matter how the data is
clustered. False positives only cost an extra file read; false
negatives are impossible, so pruning stays correct.

Engine-neutral hashing on purpose: values are hashed as
``md5(str(value))`` — the SAME bytes whether the filter is built
executor-side (pyarrow batches in ``mapInPandas``) or probed
driver-side at planning time. No Spark hash function is involved, so
build and probe can never disagree. Only integer and string columns
are bloomable (their canonical str() rendering is unambiguous);
floats/bools/nested types are refused — their renderings drift
across engines and their point lookups are rare.

Classic double hashing (Kirsch–Mitzenmacher): the 128-bit md5 splits
into two 64-bit halves h1, h2 and bit i is ``(h1 + i*h2) % m`` —
k independent-enough probes from one digest.
"""

from __future__ import annotations

import base64
import hashlib
import math

import numpy as np

#: Spark schema.json() type names that may carry a bloom — every
#: integer width plus string (their canonical str() rendering is
#: engine-stable). schema.json() emits "long"/"integer"/"short"/
#: "byte"/"string", never the SQL DDL spellings.
BLOOMABLE_PREFIXES = ("long", "integer", "short", "byte", "string")


def bloom_params(n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) sized for ``n`` values at ``fpp`` false-
    positive rate; m is rounded up to a byte multiple, floors keep
    tiny files from degenerating."""
    n = max(1, n)
    m = max(64, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(value, m: int, k: int) -> list[int]:
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full cycle mod m
    return [(h1 + i * h2) % m for i in range(k)]


def build_bloom(values, n_hint: int | None = None, fpp: float = 0.01) -> dict:
    """Bloom dict {bits (b64), m, k, n} over an iterable of non-null
    values. ``n_hint`` sizes the filter (pass the file's row count
    when streaming values through); defaults to len(values)."""
    vals = values if isinstance(values, (list, tuple)) else list(values)
    n = n_hint if n_hint is not None else len(vals)
    m, k = bloom_params(n, fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    for v in vals:
        for pos in _positions(v, m, k):
            bits[pos >> 3] |= 1 << (pos & 7)
    return {
        "bits": base64.b64encode(bits.tobytes()).decode("ascii"),
        "m": m,
        "k": k,
        "n": n,
    }


def might_contain(bloom: dict, value) -> bool:
    """Planning-time probe: False means the value is DEFINITELY not
    in the file; True means it might be (scan it)."""
    bits = np.frombuffer(
        base64.b64decode(bloom["bits"]), dtype=np.uint8
    )
    m, k = bloom["m"], bloom["k"]
    return all(
        bits[pos >> 3] & (1 << (pos & 7)) for pos in _positions(value, m, k)
    )
