"""In-repo mirror of the driver's oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, normalizes both results (column-name sort, row sort,
type canonicalization), and asserts exact equality. Exact — not
approximate — because the engine's determinism contract (decimal-routed
money aggregation, md5-portable hashing) is designed to make both engines
produce bit-identical values; any drift is a bug we want to see here, not
at driver time.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from ecs_ecommerce_data_pipeline_spark.schemas import TESTDATA_TABLES

_FLOAT_KINDS = "f"


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, (_dt.datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    # Sequences BEFORE the __float__ duck-check: a length-n numpy array
    # has __float__ too (and raises on it).
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
        # Decimal and numpy scalars
        return float(v)
    return v


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.astype(object).where(pd.notnull(pdf), None)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, sql: str, con: duckdb.DuckDBPyConnection, name: str = "?"):
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    g, w = _normalize(got), _normalize(want)
    for i, (rg, rw) in enumerate(zip(g, w)):
        assert rg == rw, f"{name}: row {i} differs\n spark={rg}\noracle={rw}"
