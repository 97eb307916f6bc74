"""Partition-count-independence check for the r12-touched queries:
replay the driver-style oracle comparison at an AWKWARD parallelism
(local[5], shuffle_partitions=5 — neither the tests' 8 nor the bench's
32) so any partition-order dependence introduced by the r12 kernels or
plan restructurings would surface as a value diff.

Usage: python scripts/r12_cpus5_oracle.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# every query whose code path changed in r12
TOUCHED = [
    # r12-touched query paths
    "dedup_substring_max",          # hash-probe k-point bisection
    "dedup_semantic",               # ensure_parallelism pin + dot() reuse
    "events_markov_stationary",     # bounded collect (limit above agg)
    "embed_quantize",               # identifier-gated selectExpr path
    # dot()/l2_normalize() now generate from EMBED_DIM (strings
    # identical) -- replay the heaviest consumers anyway
    "ann_bruteforce", "ann_recall_eval", "embed_knn_graph",
    "ann_filtered", "dedup_embedding",
    # per-round _cut_lineage (plan truncation)
    "dedup_groups", "graph_components", "corpus_split_groups",
    "corpus_dedup_report", "graph_distances",
]


def main() -> None:
    from nifi_datasynthesizer_spark import get_spark
    from nifi_datasynthesizer_spark.operators.dedup import release_caches
    from conftest import compare_with_duckdb
    import __spark_entry__ as entrymod

    spark = get_spark(app="cpus5-oracle", master="local[5]",
                      shuffle_partitions=5)
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.sparkContext.master == "local[5]", spark.sparkContext.master
    q, o = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name in TOUCHED:
        if name not in o:
            print(f"SKIP {name} (no oracle)")
            continue
        try:
            compare_with_duckdb(q[name](spark, SF_DIR), o[name], SF_DIR)
            print(f"OK   {name}")
        except Exception:
            failed.append(name)
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)
        release_caches()
    print(f"\n{len(TOUCHED) - len(failed)}/{len(TOUCHED)} green at local[5]"
          f" on {SF_DIR}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
