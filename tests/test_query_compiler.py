"""Tantivy-ish query compiler (plans/query_compiler.py) semantics."""

import pytest
from pyspark.sql import functions as F

from go_distributed_log_search_spark.plans.query_compiler import QueryCompiler


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (60, "INFO", "alpha beta"),
            (62, "INFO", "gamma"),
            (65, "ERROR", "alpha"),
            (70, "WARN", "delta ALPHA"),
        ],
        ["tenant_id", "severity_text", "body"],
    )


def _ids(df, col):
    return sorted(r.tenant_id for r in df.filter(col).collect())


def _compiler(df):
    return QueryCompiler(dict(df.dtypes), ["body"])


def test_readme_example(spark, df):
    # README.md:35 example: range [60 TO 65} AND term
    c = _compiler(df).compile("tenant_id:[60 TO 65} AND severity_text:INFO")
    assert _ids(df, c) == [60, 62]


def test_range_bounds(spark, df):
    c = _compiler(df)
    assert _ids(df, c.compile("tenant_id:[60 TO 65]")) == [60, 62, 65]
    assert _ids(df, c.compile("tenant_id:{60 TO 70}")) == [62, 65]
    assert _ids(df, c.compile("tenant_id:[* TO 62]")) == [60, 62]
    assert _ids(df, c.compile("tenant_id:[65 TO *]")) == [65, 70]


def test_bool_precedence(spark, df):
    # AND binds tighter than OR
    c = _compiler(df).compile("severity_text:ERROR AND tenant_id:[65 TO 65] OR severity_text:WARN")
    assert _ids(df, c) == [65, 70]


def test_not_and_bare_word(spark, df):
    c = _compiler(df)
    assert _ids(df, c.compile("NOT severity_text:INFO")) == [65, 70]
    # bare word: case-insensitive substring over default fields
    assert _ids(df, c.compile("alpha")) == [60, 65, 70]
    assert _ids(df, c.compile('"delta alpha"')) == [70]


def test_errors(spark, df):
    c = _compiler(df)
    with pytest.raises(ValueError):
        c.compile("tenant_id:[60 TO")
