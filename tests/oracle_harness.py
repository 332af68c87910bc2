"""Local replica of the driver's Spark-vs-DuckDB comparison.

Runs a queries() entry and its oracle_sql() on the same parquet tables,
compares row count, column names, and an order-insensitive value
multiset (stringified, columns sorted by name) — stricter than a hash
because mismatches print the first differing rows.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
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
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full round-trip precision: exact double equality required,
        # matching the strictest possible driver hash
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def compare_query(spark, sf_dir: str, fn, sql: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sm = _rows_to_multiset(s_cols, s_rows)
    dm = _rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        diff_s = [r for r in sm if r not in set(dm)][:5]
        diff_d = [r for r in dm if r not in set(sm)][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(sm, dm) if a != b)} rows differ)\n"
            f"spark-only: {diff_s}\nduckdb-only: {diff_d}"
        )
