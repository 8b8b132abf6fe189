"""File format, delimiter, and header detection.

Parity: reference core/file_detector.py (extension + content sniff),
core/delimiter_detector.py (candidate-count voting over sample lines),
and the agent's header heuristic (tests/test_header_detection.py pins
its behavior: a header row is non-numeric and distinct in shape from
data rows).
"""

from __future__ import annotations

import json
import os

DELIMITERS = [",", "\t", ";", "|"]

_EXT_FORMATS = {
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".parquet": "parquet",
    ".orc": "orc",
    ".xlsx": "excel",
    ".xls": "excel",
}


GZIP_MAGIC = b"\x1f\x8b"


def is_gzipped(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == GZIP_MAGIC


def detect_format(path: str, sample_bytes: int = 4096) -> str:
    """Extension first, then content sniff (PAR1 magic / JSON braces /
    delimited text). Gzip wrapping (.csv.gz inboxes) is transparent:
    the INNER format is detected (by the inner extension, else by a
    decompressed-head sniff) — Spark's text readers decompress .gz
    natively, so the caller routes on the inner format."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".gz", ".gzip"):
        inner = os.path.splitext(os.path.splitext(path)[0])[1].lower()
        if inner in _EXT_FORMATS:
            return _EXT_FORMATS[inner]
    if ext in _EXT_FORMATS:
        return _EXT_FORMATS[ext]
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    if head[:2] == GZIP_MAGIC:
        import zlib

        # decompressobj tolerates a head cut mid-stream and returns
        # whatever it could inflate — plenty for the sniff below
        try:
            head = zlib.decompressobj(16 + zlib.MAX_WBITS).decompress(
                head, sample_bytes
            )
        except zlib.error:
            head = b""
        if not head:
            raise ValueError(f"cannot sniff gzip inner format of {path}")
    if head[:4] == b"PAR1":
        return "parquet"
    # ORC magic is "ORC" followed by binary protobuf — require a
    # non-printable 4th byte so text starting with "ORC..." stays text.
    if head[:3] == b"ORC" and (
        len(head) == 3 or head[3] < 0x20 or head[3] > 0x7E
    ):
        return "orc"
    text = head.decode("utf-8", errors="replace").lstrip()
    if not text:
        raise ValueError(f"cannot detect format of empty file {path}")
    if text[0] in "{[":
        return "json"
    return "csv"


def detect_delimiter(sample_lines: list[str]) -> str:
    """Vote: the delimiter with the highest consistent per-line count
    (reference delimiter_detector counts candidates per line and
    requires agreement)."""
    best, best_score = ",", -1
    for d in DELIMITERS:
        counts = [ln.count(d) for ln in sample_lines if ln.strip()]
        if not counts or min(counts) == 0:
            continue
        # consistency: all lines agree on the count → strong signal
        consistent = len(set(counts)) == 1
        score = min(counts) * (10 if consistent else 1)
        if score > best_score:
            best, best_score = d, score
    return best


def _is_numeric(s: str) -> bool:
    try:
        float(s.strip())
        return True
    except ValueError:
        return False


def detect_header(sample_lines: list[str], delimiter: str) -> bool:
    """Header heuristic: first row has no numeric cells AND at least
    one later row does (or first row cells look like identifiers)."""
    rows = [ln.split(delimiter) for ln in sample_lines if ln.strip()]
    if len(rows) < 2:
        return False
    first, rest = rows[0], rows[1:]
    if any(_is_numeric(c) for c in first):
        return False
    rest_numeric = any(any(_is_numeric(c) for c in r) for r in rest)
    return rest_numeric or all(
        c.strip() and not c.strip()[0].isdigit() for c in first
    )


def text_head(path: str, sample_bytes: int = 65536) -> str:
    """Decoded head of a (possibly gzipped) text file — the shared
    sampler for delimiter/header/JSON-shape detection."""
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    if head[:2] == GZIP_MAGIC:
        import zlib

        try:
            head = zlib.decompressobj(16 + zlib.MAX_WBITS).decompress(
                head, sample_bytes
            )
        except zlib.error:
            head = b""
    return head.decode("utf-8", errors="replace")


def detect_json_lines(path: str, sample_bytes: int = 4096) -> bool:
    """True for JSONL (one object per line), False for a JSON array."""
    text = text_head(path, sample_bytes)
    stripped = text.lstrip()
    if stripped.startswith("["):
        return False
    first_line = stripped.splitlines()[0] if stripped else ""
    try:
        json.loads(first_line)
        return True
    except json.JSONDecodeError:
        return False
