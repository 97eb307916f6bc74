"""Time a target query after replaying a window of the bench order in
the same session — reproduces bench-session context (JIT/codegen/GC
state) that isolated timing misses.

Usage:
    SPARK_GRAFT_CODEGEN_CACHE=100 python scripts/r11_ctx_time.py \
        target [start_pos] [end_pos]

Replays bench rows [start_pos, end_pos) from the committed baseline
map's key order, then times the target 3x.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    target = sys.argv[1]
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    end = int(sys.argv[3]) if len(sys.argv) > 3 else 119
    cache = os.environ.get("SPARK_GRAFT_CODEGEN_CACHE")
    if cache:
        from pyspark.sql import SparkSession
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        (SparkSession.builder.appName("ctxtime")
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
    from nifi_datasynthesizer_spark import get_spark
    from nifi_datasynthesizer_spark.operators.dedup import release_caches

    spark = get_spark(app="ctxtime")
    spark.sparkContext.setLogLevel("ERROR")
    print("codegen.cache.maxEntries =",
          spark.conf.get("spark.sql.codegen.cache.maxEntries"))
    q = entrymod.queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "bench_out.json")) as fh:
        keys = list(json.load(fh)["queries"].keys())

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    for name in keys[start:end]:
        if name not in q:
            continue
        spark.sparkContext.setJobDescription(f"ctx:{name}")
        _force(q[name](spark, SF_DIR))
        release_caches()
    print(f"context replay [{start}:{end}) took "
          f"{time.perf_counter() - t0:.1f} s")

    runs = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"target:{target}:{i}")
        t0 = time.perf_counter()
        _force(q[target](spark, SF_DIR))
        runs.append(round(time.perf_counter() - t0, 3))
        release_caches()
    print(json.dumps({target: {"runs": runs, "min": min(runs)}}))


if __name__ == "__main__":
    main()
