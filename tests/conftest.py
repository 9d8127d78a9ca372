from __future__ import annotations

import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # Auto-mode pins (operators/pinning.py) resolve by checkpoint-dir
    # presence, and a SparkContext checkpoint dir cannot be UNSET once a
    # reliable-pin test configures one on the session-scoped context —
    # pin the suite to local mode so test order never flips later
    # auto-pin sites to DFS checkpoints (explicit pin="reliable" args in
    # the dedicated mode tests still win over this env default).
    os.environ.setdefault("SPARK_GRAFT_PIN", "local")
    from backend_big_data_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/{name}.parquet')"
        )
    yield con
