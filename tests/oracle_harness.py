"""Local replica of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL over the same parquet
tables, then compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, floats via repr) — the same contract
as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from newyork_taxi_etl_spark.schema import TESTDATA_TABLES
from newyork_taxi_etl_spark.sources.readers import table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm_cell(x) for x in v) + "]"
        return repr(v)

    out = df.map(norm_cell)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(spark, name: str, sf_dir: str, verbose: bool = True):
    """Return (ok, message) for one registered query vs its oracle."""
    from newyork_taxi_etl_spark import registry

    q = registry.queries()[name]
    sql = registry.oracle_sql().get(name)
    spark_pdf = q(spark, sf_dir).toPandas()
    if sql is None:
        return (len(spark_pdf) >= 0, f"{name}: rows-only check, {len(spark_pdf)} rows")

    con = duck_connection(sf_dir)
    duck_pdf = con.execute(sql).fetchdf()
    con.close()

    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
    if not problems:
        a, b = _normalize(spark_pdf), _normalize(duck_pdf)
        if not a.equals(b):
            diff_mask = (a != b).any(axis=1)
            n_diff = int(diff_mask.sum())
            problems.append(f"values differ in {n_diff}/{len(a)} rows")
            if verbose and n_diff:
                idx = a.index[diff_mask][:5]
                for i in idx:
                    problems.append(f"  spark={a.loc[i].to_dict()}")
                    problems.append(f"  duck ={b.loc[i].to_dict()}")
    ok = not problems
    return ok, f"{name}: " + ("OK" if ok else "; ".join(problems))
