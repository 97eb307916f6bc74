from __future__ import annotations

import os

import pytest

# single source of truth for the test-data root: every test reads the
# smallest SF through this so a relocated dataset is a one-env change
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from nifi_datasynthesizer_spark import get_spark
    s = get_spark(app="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def compare_with_duckdb(spark_df, sql: str, sf_dir: str | None = None,
                        float_tol: float = 1e-9):
    """Mirror of the driver's check: run the oracle in DuckDB (tables
    registered as views), sort columns by name and rows by value, then
    compare cell-wise."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    if sf_dir:
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    expected = con.sql(sql).df()
    actual = spark_df.toPandas()

    assert sorted(actual.columns) == sorted(expected.columns), (
        f"schema mismatch: {sorted(actual.columns)} vs {sorted(expected.columns)}")
    cols = sorted(actual.columns)
    for df in (actual, expected):
        for c in cols:
            if df[c].dtype == object and df[c].map(
                    lambda v: not isinstance(v, (str, bytes, type(None)))).any():
                df[c] = df[c].map(lambda v: str(list(v))
                                  if hasattr(v, "__len__") and not isinstance(v, str)
                                  else str(v))
    a = actual[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = expected[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(e), f"row count {len(a)} vs {len(e)}"
    for c in cols:
        av, ev = a[c], e[c]
        if av.dtype.kind == "f" or ev.dtype.kind == "f":
            pd.testing.assert_series_equal(av.astype(float), ev.astype(float),
                                           check_names=False, rtol=0,
                                           atol=float_tol)
        else:
            pd.testing.assert_series_equal(av.astype(str), ev.astype(str),
                                           check_names=False)
