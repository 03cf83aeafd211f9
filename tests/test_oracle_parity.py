"""Driver-style correctness harness: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet,
compare row counts + order-insensitive values (the CORRECTNESS gate)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("IBP_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [tuple(sorted(c for c in colnames))] + out


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    oracle = entry.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) >= 0  # rows-only check
        return
    res = ddb.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows)
    assert _norm(srows, scols) == _norm(orows, ocols)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    total_ratio = sum(r["raw_bytes"] for r in rows) / sum(r["comp_bytes"] for r in rows)
    assert total_ratio > 1.5  # vocab32k-style tokens must compress ~2x
