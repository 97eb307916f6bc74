"""Reproduce the head of the bench order in a fresh session to A/B
session-level configs (e.g. the codegen class-cache size) against the
early-session JIT storm seen on slow hosts.

Usage: SPARK_GRAFT_CODEGEN_CACHE=100 python scripts/r11_minibench.py [n_queries]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 11


def main() -> None:
    cache = os.environ.get("SPARK_GRAFT_CODEGEN_CACHE")
    if cache:
        # static SQL conf: must be set before the JVM-side session
        # exists; pre-create with get_spark's exact configs minus the
        # committed cache size
        from pyspark.sql import SparkSession
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        (SparkSession.builder.appName("minibench")
         .master(f"local[{cpus}]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.driver.extraJavaOptions",
                 "-XX:ReservedCodeCacheSize=1g")
         .config("spark.sql.codegen.cache.maxEntries", cache)
         .config("spark.sql.autoBroadcastJoinThreshold",
                 str(64 * 1024 * 1024))
         .getOrCreate())

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from nifi_datasynthesizer_spark import get_spark
    from nifi_datasynthesizer_spark.io import read_table
    from nifi_datasynthesizer_spark.operators.dedup import release_caches

    spark = get_spark(app="minibench")
    spark.sparkContext.setLogLevel("ERROR")
    print("codegen.cache.maxEntries =",
          spark.conf.get("spark.sql.codegen.cache.maxEntries"))
    q = entrymod.queries()

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    _force(read_table(spark, SF_DIR, "lineitem")
           .groupBy("l_returnflag").agg(F.sum("l_quantity")))
    _force(spark.range(1_000_000).select(F.md5(F.col("id").cast("string"))))

    names = ["q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
             "events_daily", "dedup_exact", "dedup_minhash", "dedup_simhash",
             "dedup_ngram_jaccard", "dedup_groups", "text_langid",
             "text_quality"][:N]
    timings = {}
    for name in names:
        t0 = time.perf_counter()
        _force(q[name](spark, SF_DIR))
        took = time.perf_counter() - t0
        release_caches()
        if took > 1.5:
            t0 = time.perf_counter()
            _force(q[name](spark, SF_DIR))
            t2 = time.perf_counter() - t0
            release_caches()
            print(f"  {name}: run1={took:.2f} run2={t2:.2f}")
            took = min(took, t2)
        timings[name] = round(took, 3)
    print(json.dumps({"total": round(sum(timings.values()), 2),
                      "timings": timings}))


if __name__ == "__main__":
    main()
