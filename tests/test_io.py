"""Sink/source coverage: the record-writer equivalents (SURVEY §2b).

The avro sink maps to the external spark-avro module
(org.apache.spark:spark-avro_2.13).  This sandbox has no network, so
``--packages`` cannot fetch it and the pyspark wheel does not bundle it
(only avro-core jars that Spark itself uses) — the gate test below
exercises whichever side of the gate this environment is on: with the
module present it writes and re-reads avro; without it, it asserts the
NotImplementedError carries the exact launch flag a user needs.
"""

from __future__ import annotations

import pytest

from nifi_datasynthesizer_spark import io as nio


@pytest.fixture()
def small_df(spark):
    from nifi_datasynthesizer_spark import compile_schema
    schema = [{"name": "rec_id", "class": "id"},
              {"name": "qty", "class": "int", "min": 1, "max": 9},
              {"name": "who", "class": "name"}]
    return compile_schema(schema, seed=3).dataframe(spark, 100)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_write_read_roundtrip(spark, small_df, tmp_path, fmt):
    path = str(tmp_path / fmt)
    nio.write(small_df, path, fmt=fmt)
    back = nio.read(spark, path, fmt=fmt)
    assert back.count() == 100
    assert set(back.columns) == {"rec_id", "qty", "who"}
    if fmt in ("parquet", "orc"):  # typed formats keep the schema
        assert dict(back.dtypes)["qty"] == "bigint"


def test_write_partitioned(spark, small_df, tmp_path):
    path = str(tmp_path / "part")
    nio.write(small_df, path, fmt="parquet", partition_by=["qty"])
    back = nio.read(spark, path, fmt="parquet")
    assert back.count() == 100
    # partition pruning: a qty filter must prune to one directory
    pruned = back.filter("qty = 3")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # small-files guard: each partition dir holds at most
    # files_per_value data files (not one per upstream task), and the
    # salt keeps more than one writer eligible per value
    import glob
    for d in glob.glob(path + "/qty=*"):
        n = len(glob.glob(d + "/*.parquet"))
        assert 1 <= n <= 8, (d, n)


def test_write_partitioned_with_map_column(spark, tmp_path):
    """The write salt hashes row content, but Spark's hash functions
    reject MapType — a frame with a map column must still write
    partitioned (the salt skips unhashable columns)."""
    df = spark.createDataFrame(
        [(i, i % 3, {"k": str(i)}) for i in range(60)],
        ["id", "grp", "attrs"])
    path = str(tmp_path / "mappart")
    nio.write(df, path, fmt="parquet", partition_by=["grp"])
    back = nio.read(spark, path, fmt="parquet")
    assert back.count() == 60
    assert back.filter("attrs['k'] = '7'").count() == 1


def test_cli_count_parsing():
    from nifi_datasynthesizer_spark.__main__ import _parse_count
    assert _parse_count("2K") == 2_000
    assert _parse_count("3M") == 3_000_000
    assert _parse_count("1G") == 1_000_000_000
    assert _parse_count("750") == 750


def test_bucketed_join_is_shuffle_free(spark):
    """Both sides bucketed on the join key with equal bucket counts →
    the sort-merge join runs with NO exchange on either side (the
    bucketed scans already satisfy the hash distribution)."""
    from nifi_datasynthesizer_spark.io import read_table, write_bucketed
    sf = "/root/testdata/sf0.001"
    orders = read_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8)
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 8)
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        j = a.hint("merge").join(b, a.o_orderkey == b.l_orderkey)
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, "bucketed join must not shuffle"
        assert j.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_avro_gate(spark, small_df, tmp_path):
    path = str(tmp_path / "avro")
    if nio._has_avro(spark):
        nio.write(small_df, path, fmt="avro")
        assert nio.read(spark, path, fmt="avro").count() == 100
    else:
        with pytest.raises(NotImplementedError) as exc:
            nio.write(small_df, path, fmt="avro")
        # the gate must tell the user exactly how to enable the sink
        assert "--packages org.apache.spark:spark-avro" in str(exc.value)


def test_cli_rejects_bad_counts_and_threads():
    import pytest as _pt
    from nifi_datasynthesizer_spark.__main__ import _parse_count, _parse_threads
    import argparse
    for bad in ("0", "-5K", "-1"):
        with _pt.raises(argparse.ArgumentTypeError):
            _parse_count(bad)
    for bad in ("0", "-2"):
        with _pt.raises(argparse.ArgumentTypeError):
            _parse_threads(bad)
    assert _parse_threads("4") == 4


def test_zorder_locality(spark):
    """Morton-key bucketing bounds the span of BOTH dimensions per
    bucket (here 64×64 tiles for 16 buckets of a 256×256 space), so a
    filter on the NON-leading dimension prunes ~3/4 of the buckets —
    a lexicographic x-sort leaves every bucket covering the full y
    range and prunes nothing."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    x = "pmod(user_id, 16)"
    y = "pmod(datediff(to_date(ts), DATE '1970-01-01'), 16)"
    staged = ev.select(
        F.expr(x).cast("long").alias("x"),
        F.expr(y).cast("long").alias("y"),
        nio.zorder_key(x, y, bits=4).alias("z")).persist()
    z_spans = (staged.groupBy(F.expr("z div 16"))
               .agg((F.max("y") - F.min("y")).alias("ys"),
                    (F.max("x") - F.min("x")).alias("xs"))
               .agg(F.avg("ys").alias("ys"), F.avg("xs").alias("xs"))
               .collect()[0])
    lex_spans = (staged.groupBy("x")
                 .agg((F.max("y") - F.min("y")).alias("ys"))
                 .agg(F.avg("ys").alias("ys")).collect()[0])
    staged.unpersist()
    # z-buckets: ≤4-wide tiles in both dims; x-sort buckets span full y
    assert z_spans["ys"] <= 4
    assert z_spans["xs"] <= 4
    assert z_spans["ys"] * 2 < lex_spans["ys"]
