"""Every catalog query with an oracle must match it exactly at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01 — see
``test_oracle_parity_sf001`` marker note). Exact-equality by design: the
engine's determinism contract makes Spark and DuckDB bit-identical.
"""

from __future__ import annotations

import pytest

from ecs_ecommerce_data_pipeline_spark import catalog

from .oracle_utils import compare, duckdb_con

SF = "/root/testdata/sf0.001"


def _params():
    oracles = catalog.oracle_sql()
    return sorted(oracles.keys())


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF)
    yield c
    c.close()


@pytest.mark.oracle
@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(spark, con, name):
    fn = catalog.queries()[name]
    sql = catalog.oracle_sql()[name]
    compare(fn(spark, SF), sql, con, name)


@pytest.mark.oracle
def test_all_queries_run(spark):
    """Queries without oracles still must execute and return a schema."""
    for name, fn in catalog.queries().items():
        df = fn(spark, SF)
        assert df.columns, name
