"""Driver-mimicking Spark-vs-DuckDB comparison used by the e2e tests.

Replicates the driver's CORRECTNESS gate: same row count, same column-name
set, and an order-insensitive value comparison with columns sorted by name.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 6) if not math.isnan(v) else "nan"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def compare(spark_df, duck_con, sql: str, sf_dir: str) -> None:
    """Assert spark_df == DuckDB result of sql (views pre-registered)."""
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        duck_con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck_res = duck_con.sql(sql)
    duck_cols = [c.lower() for c in duck_res.columns]
    duck_rows = duck_res.fetchall()

    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_order = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_order = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_set = sorted(
        (tuple(_norm(r[i]) for i in s_order) for r in spark_rows), key=repr
    )
    d_set = sorted(
        (tuple(_norm(r[i]) for i in d_order) for r in duck_rows), key=repr
    )
    for i, (a, b) in enumerate(zip(s_set, d_set)):
        assert a == b, f"value mismatch at sorted-row {i}:\n spark={a}\n duck ={b}"
