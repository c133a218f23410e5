from __future__ import annotations

import os

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
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


@pytest.fixture(scope="session")
def spark():
    from dream_spark import get_spark

    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from dream_spark.engine import Engine

    return Engine.from_tpch(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same table views the driver registers."""
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def assert_oracle_match(df, duck_con, sql, check_columns=True):
    """Order-insensitive multiset comparison — mirrors the driver's check."""
    spark_rows = sorted(map(tuple, df.collect()), key=repr)
    duck_res = duck_con.execute(sql)
    duck_rows = sorted(map(tuple, duck_res.fetchall()), key=repr)
    if check_columns:
        assert [c.lower() for c in df.columns] == [
            c[0].lower() for c in duck_res.description
        ], "column names differ"
    assert len(spark_rows) == len(duck_rows), f"row counts differ: {len(spark_rows)} vs {len(duck_rows)}"
    assert spark_rows == duck_rows, (
        f"values differ; first spark={spark_rows[:3]} duck={duck_rows[:3]}"
    )
