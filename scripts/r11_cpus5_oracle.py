"""Partition-count-independence check for the r11-touched queries:
replay the driver-style oracle comparison at an AWKWARD parallelism
(local[5], shuffle_partitions=5 — neither the tests' 8 nor the bench's
32) so any partition-order dependence introduced by the r11 kernels or
plan restructurings would surface as a value diff.

Usage: python scripts/r11_cpus5_oracle.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# every query whose code path changed in r11 batches 1-6
TOUCHED = [
    "events_markov_stationary",
    "ann_pq", "ann_pq_rerank", "ann_ivfpq", "ann_ivfpq_rerank",
    "embed_pq", "embed_cluster", "dedup_semantic",
    "graph_kcore", "graph_components", "graph_triangles",
    "graph_pagerank", "graph_label_prop", "graph_jaccard",
    "graph_distances", "embed_knn_graph",
    "dedup_groups", "corpus_dedup_report", "corpus_split_groups",
    "dedup_minhash_eval",
    # _psort entries
    "text_langid", "text_quality", "text_tokens", "text_fingerprint",
    "text_repetition", "text_readability", "text_classify", "text_oov",
    "text_embed", "text_pii_scrub", "text_chunks",
    "corpus_span_corruption", "corpus_fim", "corpus_sample",
    "corpus_split", "corpus_tokenize", "embed_quantize",
    "media_features", "media_resize", "media_frames", "media_segments",
    "ann_range_search", "geo_near",
    # later-session construction batches (selectExpr/F.expr string
    # rewrites — expressions string-identical, replayed here anyway)
    "io_column_stats_sketch", "io_column_stats", "dedup_fuzzy",
    "dedup_minhash", "dedup_cross", "dedup_agreement",
    "dedup_threshold_sweep", "streaming_dedup_cross", "corpus_clean",
    "embed_pca", "text_train_classifier",
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
