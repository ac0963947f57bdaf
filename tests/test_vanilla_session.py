"""Env-independence of the registry (VERDICT r1 #1/#3): every module's
queries must run in a SparkSession the repo did NOT build.

Round 1's only driver failures came from `load_table` assuming the
session factory's `nanosAsLong` conf; the driver harness builds its own
vanilla session, so 11 queries crashed before query logic ran. A
subprocess is the only honest check — an in-process "new" session
shares the SparkContext (and its initial confs) with the test fixture,
so the factory conf would leak in and mask the bug.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One query per registered module, biased toward the events table
# (parquet TIMESTAMP(NANOS) — the round-1 failure mode).
_SMOKE = [
    "q_json_dates",  # relational, events + date functions
    "q_stream_tumbling",  # streaming, events
    "q_topk_cosine",  # vector
    "q_dedup_exact",  # text
    "q_resample_ffill",  # analytics, events
    "q_approx_sketch",  # warehouse, events + sketch aggregates
    "q_rolling_window",  # pipeline, events time-range frame
    "q_salted_skew_join",  # scale, events + salting
    "q_span_dedup",  # curation, token spans (sequence guard)
    "q_mmr_rerank",  # retrieval, cogrouped applyInPandas greedy
    "q_python_datasource",  # spark4, Python DataSource registration
    "q_udtf_chunks",  # spark4, UDTF registration + LATERAL join
    "q_recursive_cte",  # spark4 wave 14, WITH RECURSIVE execution
    "q_stream_sliding",  # streaming wave 14, sliding F.window over events
]

_SCRIPT = """
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("vanilla-smoke")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry

qs = registry.queries()
for name in {names!r}:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    print(name, n, flush=True)
    assert n >= 0
print("VANILLA_OK", flush=True)
spark.stop()
"""


def test_registry_runs_in_vanilla_session(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(names=_SMOKE)],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "VANILLA_OK" in proc.stdout
