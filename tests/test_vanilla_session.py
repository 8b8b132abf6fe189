"""Bare-session gate: every registered query must run under a VANILLA
SparkSession.

The driver's correctness gate builds its own ``SparkSession.builder.
getOrCreate()`` — none of the repo session builder's configs
(session.py: Arrow, timezone, ``spark.sql.python.filterPushdown.
enabled``, shuffle partitions) exist there. Any registered query that
silently depends on one passes the repo's pytest (which uses the repo
session) while failing at the gate — exactly what happened to
``lakehouse_point_lookup`` / ``lakehouse_bloom_lookup`` in
CORRECTNESS_r07 (``[DATA_SOURCE_PUSHDOWN_DISABLED]``): the connector
reader implements ``pushFilters`` and Spark refuses to silently
ignore it when the conf is off, so the query itself must set it at
runtime (plans/analytics.py).

This test is the CI analog of the driver environment: boot a bare
``local[2]`` session in a FRESH subprocess (the repo session is
session-scoped in conftest — a second in-process session would
inherit its JVM and its runtime confs) and run every registered query
at sf0.001, asserting none raises. Reverting the filterPushdown fix
makes this fail.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import sys, traceback

sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

# The driver environment: a vanilla builder, NO repo session configs.
# (master parallelism is not a config the queries may depend on — the
# gate is about session CONFS like Arrow/pushdown/timezone.)
spark = SparkSession.builder.master("local[4]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from biglake_iceberg_pipeline_spark.registry import spark_queries

failures = []
for i, (key, fn) in enumerate(sorted(spark_queries().items())):
    if i %% %(shards)d != %(shard)d:
        continue
    try:
        df = fn(spark, %(sf)r)
        df.collect()  # the driver collects — force full execution
    except Exception:
        failures.append((key, traceback.format_exc(limit=4)))
        print("VANILLA-FAIL %%s" %% key, flush=True)

for key, tb in failures:
    print("=" * 60)
    print(key)
    print(tb)
print("VANILLA-RESULT %%d failures" %% len(failures), flush=True)
spark.stop()
sys.exit(1 if failures else 0)
"""


def test_all_registered_queries_run_under_bare_session():
    # Every registered key still runs under a bare session — but in
    # THREE concurrent subprocesses (round-robin key shards, each its
    # own vanilla JVM) instead of one serial pass: the serial form
    # was the single slowest test in the suite (236 s of a 37-minute
    # serial run the driver's budget truncates; the host has cores to
    # spare while pytest is single-threaded).
    env = dict(os.environ)
    # a leaked SPARK_GRAFT_* var must not tune the vanilla session
    for k in list(env):
        if k.startswith("SPARK_GRAFT_"):
            env.pop(k)
    shards = 3
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _RUNNER
                % {
                    "repo": REPO,
                    "sf": "/root/testdata/sf0.001",
                    "shards": shards,
                    "shard": shard,
                },
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=REPO,
        )
        for shard in range(shards)
    ]
    outs = [p.communicate(timeout=3600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        tail = "\n".join(out.splitlines()[-80:])
        assert p.returncode == 0, (
            f"registered queries failed under a vanilla session:\n"
            f"{tail}\nstderr tail:\n"
            f"{chr(10).join(err.splitlines()[-15:])}"
        )
        assert "VANILLA-RESULT 0 failures" in out, tail
