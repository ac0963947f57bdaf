"""Ad-hoc per-query job profiler (builder tool, not part of the bench).

For each named query: run it warm (second run timed), count the Spark
jobs it launches via a job group, and print wall + job count. A sub-2 s
query launching >3 jobs is paying stray materializations (eager
checkpoints / collects) — the round-10 job-floor audit's signal.

Usage: python profile_jobs.py q_iqr_outliers q_grid_dbscan ...
       (no args = the round-10 watch list)
"""

from __future__ import annotations

import sys
import time

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.session import (
    get_spark,
)
from bench import SF_DIR, _force, _warmup

WATCH = [
    "q_iqr_outliers",
    "q_minhash_calibration",
    "q_grid_dbscan",
    "q_spearman_corr",
    "q_bloom_prune_join",
    "q_approx_sketch",
    "q_equi_depth_histogram",
    "q_graph_walk",
    "q_roc_auc",
    "q_mad_outliers",
    "q_pagerank",
    "q_bigram_lm",
    "q_weighted_median",
    "q_decile_transition",
    "q_prf_expand",
    "q_negative_sampling",
    "q_abc_xyz",
    "q_rbo_rank_overlap",
]


def main() -> None:
    names = sys.argv[1:] or WATCH
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    queries = registry.queries()
    sc = spark.sparkContext
    tracker = sc._jsc.sc().statusTracker()
    print(f"{'query':32s} {'wall_s':>7s} {'jobs':>5s}")
    for name in names:
        fn = queries[name]
        _force(fn(spark, SF_DIR))  # warm run (substrates, OS cache)
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        _force(fn(spark, SF_DIR))
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        jobs = len(tracker.getJobIdsForGroup(name))
        print(f"{name:32s} {wall:7.2f} {jobs:5d}")


if __name__ == "__main__":
    main()
