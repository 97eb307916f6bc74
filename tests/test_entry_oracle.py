"""The driver's correctness gate, run locally: every queries() entry
with an oracle_sql() mirror must match DuckDB exactly at sf0.001 (the
driver runs sf0.01; same code path)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, compare_with_duckdb

_queries = entrymod.queries()
_oracles = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["pred_lang", "n_docs", "avg_quality", "avg_words"]


def test_every_oracle_has_query():
    missing = set(_oracles) - set(_queries)
    assert not missing, f"oracles without queries: {missing}"


def test_window_names_resolve():
    """_rotate silently drops window names missing from the registry,
    so a typo would shrink the checked window without any failure —
    every window entry must name a real query, the head must be
    exactly the 50 the driver checks, and the registry must lead with
    it (r5 advice: the stray 51st entry landed OUTSIDE the window)."""
    assert len(entrymod._WINDOW_R12_HEAD) == 50
    ghosts = [n for n in entrymod._WINDOW_R12 if n not in _queries]
    assert not ghosts, f"window names missing from registry: {ghosts}"
    assert list(_queries)[:50] == entrymod._WINDOW_R12_HEAD


@pytest.mark.parametrize("name", sorted(_oracles))
def test_oracle_match(spark, name):
    df = _queries[name](spark, SF_DIR)
    compare_with_duckdb(df, _oracles[name], sf_dir=SF_DIR)


@pytest.mark.parametrize("name", sorted(_oracles))
def test_canonicalizer_safe_schema(spark, name):
    """The driver's _canon sorts a pandas frame on every column — any
    array/map/struct column raises `unhashable type: list` there (the
    local harness stringifies, the driver does not — round-1 lesson).
    Oracle-backed queries must emit only atomic columns."""
    from pyspark.sql.types import ArrayType, MapType, StructType
    df = _queries[name](spark, SF_DIR)
    bad = [f.name for f in df.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not bad, f"{name}: non-atomic driver-visible columns {bad}"


def test_oracle_no_hugeint():
    """DuckDB renders un-CAST SUM(BIGINT) as HUGEINT, which pandas turns
    into float64 — the driver then hash-mismatches `0.0` vs Spark's `0`
    even when every value agrees.  This bug class produced the ONLY
    driver failures in rounds 1, 3 and 4 (events_sessionize, corpus_pack,
    corpus_mix).  DESCRIBE every oracle and refuse HUGEINT/UHUGEINT (and
    the equally pandas-hostile UBIGINT) output columns at the source."""
    import duckdb
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    bad: dict[str, list[str]] = {}
    for name, sql in sorted(_oracles.items()):
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        hits = [f"{col}:{typ}" for col, typ, *_ in desc
                if typ.upper() in ("HUGEINT", "UHUGEINT", "UBIGINT")]
        if hits:
            bad[name] = hits
    assert not bad, f"oracles with pandas-hostile integer types: {bad}"


@pytest.mark.parametrize("name", sorted(set(_queries) - set(_oracles)))
def test_rows_only(spark, name):
    df = _queries[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
