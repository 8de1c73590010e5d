"""Local mirror of the driver's correctness gate: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
on DuckDB over the same parquet tables; compare row multisets."""

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c] if isinstance(row, dict) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["subj", "pred", "obj"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ducks, name):
    sdf = QUERIES[name](spark, SF_DIR)
    cols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check (driver's weak mode)
        return
    ores = ducks.execute(ORACLES[name]).fetchall()
    ocols = [d[0] for d in ducks.description]
    assert sorted(cols) == sorted(ocols), (cols, ocols)
    got = canon([dict(zip(cols, r)) for r in srows], cols)
    want = canon([dict(zip(ocols, r)) for r in ores], ocols)
    assert len(got) == len(want), (name, len(got), len(want))
    assert got == want, (name, got[:3], want[:3])
