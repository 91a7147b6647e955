"""Local mirror of the driver's correctness gate: run every
``queries()`` entry and its DuckDB oracle side-by-side at sf0.001 and
compare row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm(v):
    # numpy scalars (pandas fetch path) -> Python scalars, so an
    # oracle HUGEINT that pandas widened to float64 normalizes
    # differently from a Spark BIGINT and the mismatch is CAUGHT here,
    # like the driver's hash compare would catch it
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if v is not None and type(v).__name__ == "Timestamp":
        v = v.to_pydatetime()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v)


def _rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _entries():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,oracle", _entries(), ids=[n for n, _, _ in _entries()])
def test_query_matches_oracle(spark, ddb, name, fn, oracle):
    sdf = fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    assert len(spark_cols) == len(set(spark_cols)), "duplicate column names"

    if oracle is None:
        # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return

    # fetch through pandas — the driver's compare path — so DuckDB
    # type widenings (HUGEINT -> float64) surface as local failures
    pdf = ddb.execute(oracle).fetch_df()
    duck_cols = list(pdf.columns)
    duck_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sk = _rows_key(spark_cols, spark_rows)
    dk = _rows_key(duck_cols, duck_rows)
    if sk != dk:
        diff = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert df.columns
