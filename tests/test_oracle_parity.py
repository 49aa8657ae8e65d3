"""Local replica of the driver's correctness gate: run every entry in
queries() on Spark and the matching oracle_sql() in DuckDB on the same
parquet tables, then compare row count, column names, and (order-
insensitive) values — exactly, since the query contract guarantees
determinism (decimal sums, rounded float aggregates).
"""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("TERM_SPARK_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(rows, columns):
    """Sort columns by name, then rows; stringify cells canonically."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                # Full repr, not %.9g: the driver's value-hash is exact, so
                # the local gate must be bit-exact too (round-1 lesson).
                vals.append("nan" if math.isnan(v) else repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [columns[i] for i in idx]


def _query_names():
    from term_spark.queries import ORACLES, QUERIES
    assert set(ORACLES) <= set(QUERIES)
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, ddb, name):
    from term_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = ddb.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    s_vals, s_cols = _normalize(spark_rows, spark_cols)
    d_vals, d_cols = _normalize(duck_rows, duck_cols)

    assert s_cols == d_cols, f"{name}: column names differ {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), (
        f"{name}: row count {len(s_vals)} vs {len(d_vals)}")
    for i, (sr, dr) in enumerate(zip(s_vals, d_vals)):
        assert sr == dr, f"{name}: row {i} differs\n spark={sr}\n duck ={dr}"
