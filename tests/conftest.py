from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s4_spark.catalog import TABLES
from s4_spark.session import get_spark

SF_DIR = os.environ.get("S4_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="s4_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's compare: columns sorted by name, rows sorted,
    floats rounded to 6 dp, timestamps truncated to µs."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            s = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.floor("us")
        elif s.dtype == object:
            s = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
            s = s.map(
                lambda v: tuple(round(float(x), 6) for x in v)
                if isinstance(v, tuple) and v and isinstance(v[0], float)
                else v
            )
        out[c] = s
    ndf = pd.DataFrame(out)
    ndf = ndf.sort_values(by=list(ndf.columns), key=lambda s: s.astype(str)).reset_index(
        drop=True
    )
    return ndf


def assert_oracle_match(spark_df, duck_con, oracle_sql: str, name: str = "?"):
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(oracle_sql).df())
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    mism = (got.astype(str) != want.astype(str)).any(axis=1)
    if mism.any():
        idx = mism[mism].index[:5]
        raise AssertionError(
            f"{name}: {int(mism.sum())} mismatched rows, first few:\n"
            f"spark:\n{got.loc[idx]}\noracle:\n{want.loc[idx]}"
        )
