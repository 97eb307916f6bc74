"""The reference's own resource schemas
(nifi-datasynthesizer-processors/src/main/resources/generators/*.json)
must compile verbatim and replay identically in DuckDB — the
drop-in-compatibility check for DataSynthesizer schema files."""

from __future__ import annotations

import json
import os

import pytest

from nifi_datasynthesizer_spark import compile_schema

REF_DIR = ("/root/reference/nifi-datasynthesizer-processors/"
           "src/main/resources/generators")

SCHEMAS = ["iot-data", "terminal", "transaction", "valid_transaction"]


@pytest.mark.parametrize("name", SCHEMAS)
def test_reference_schema_parity(spark, name):
    import duckdb
    import pandas as pd

    path = os.path.join(REF_DIR, f"{name}.json")
    if not os.path.exists(path):
        pytest.skip("reference resources not present")
    cs = compile_schema(json.load(open(path)), seed=3)
    n = 200
    ddf = duckdb.sql(cs.duckdb_sql(n)).df()
    sdf = cs.dataframe(spark, n, partitions=4).toPandas()
    assert list(sdf.columns) == list(ddf.columns)
    for c in sdf.columns:
        a, e = sdf[c], ddf[c]
        if a.dtype == object:
            a = a.map(lambda v: str(list(v)) if hasattr(v, "__len__")
                      and not isinstance(v, str) else str(v))
            e = e.map(lambda v: str(list(v)) if hasattr(v, "__len__")
                      and not isinstance(v, str) else str(v))
        pd.testing.assert_series_equal(a, e, check_dtype=False,
                                       check_names=False, rtol=0, atol=1e-9)


def test_sequence_flat_and_walk(spark):
    """flat map-sequence → parallel arrays; in-sequence random-walk
    accumulates across positions."""
    schema = [
        {"name": "rid", "class": "id"},
        {"class": "sequence", "flat": True, "length": 5,
         "base": {"class": "map", "value": [
             {"name": "t", "class": "int", "min": 0, "max": 10},
             {"name": "w", "class": "random-walk",
              "start": 100.0, "mean": 0.0, "sd": 1.0}]}},
    ]
    cs = compile_schema(schema, seed=9)
    row = cs.dataframe(spark, 3).orderBy("rid").collect()[0]
    assert len(row.t) == 5 and len(row.w) == 5
    # walk steps are N(0,1): consecutive deltas bounded by ~6 sigma
    for a, b in zip(row.w, row.w[1:]):
        assert abs(b - a) < 7.0
    assert all(abs(v - 100.0) < 40.0 for v in row.w)
