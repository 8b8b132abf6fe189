"""Commit-latency probe for the segmented manifest layer (VERDICT r10
item 4): drives LakehouseTable._locked_commit-shaped appends through
the metadata layer only (no Spark, no data bytes) and reports
per-epoch commit latency at the start vs the end of a long history,
plus one append on a 100k-file tail.

Usage: python tools/manifest_probe.py [epochs] [bigfiles]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def commit_epoch(t: LakehouseTable, i: int, files: list[str]) -> float:
    t0 = time.perf_counter()
    t._locked_commit(
        "append",
        files,
        {f: {} for f in files},
        None,
        inherit_prev_files=True,
    )
    return time.perf_counter() - t0


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    with tempfile.TemporaryDirectory() as d:
        t = LakehouseTable(os.path.join(d, "probe"))
        lat = []
        for i in range(epochs):
            lat.append(commit_epoch(t, i, [f"data/f{i}.parquet"]))
        if epochs < 300:
            raise SystemExit("need epochs >= 300 for stable medians")
        early = sorted(lat[50:150])[50] * 1000
        late = sorted(lat[-100:])[50] * 1000
        snaps = t.snapshots
        assert len(snaps[-1]["files"]) == epochs, len(snaps[-1]["files"])

        t2 = LakehouseTable(os.path.join(d, "big"))
        t2._locked_commit(
            "append",
            [f"data/b{i}.parquet" for i in range(big)],
            {},
            None,
            inherit_prev_files=True,
        )
        t0 = time.perf_counter()
        t2._locked_commit(
            "append", ["data/one-more.parquet"], {}, None,
            inherit_prev_files=True,
        )
        big_ms = (time.perf_counter() - t0) * 1000
        assert len(t2.snapshots[-1]["files"]) == big + 1
        print(json.dumps({
            "epochs": epochs,
            "commit_ms_epoch100": round(early, 3),
            "commit_ms_epoch_end": round(late, 3),
            "growth_ratio": round(late / max(early, 1e-9), 2),
            "bigtable_files": big,
            "bigtable_append_ms": round(big_ms, 2),
        }))


if __name__ == "__main__":
    main()
