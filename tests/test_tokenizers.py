"""Tokenizer modes (config/mod.go:53-58): default / raw / whitespace /
en_stem. default/raw/whitespace are oracle-backed via the terms_* driver
queries; en_stem (the classic Porter algorithm; Bluge's Porter2 is a small
documented delta) is pinned here and in test_stemmer.py."""

import pytest
from pyspark.sql import functions as F

from go_distributed_log_search_spark.functions import tokenize


@pytest.fixture(scope="module")
def one(spark):
    def run(expr):
        return spark.range(1).select(expr.alias("v")).first().v

    return run


def test_default_lowercases_and_splits(one):
    got = one(tokenize.tokenize(F.lit("Hello, World-42!  x"), "default"))
    assert got == ["hello", "world", "42", "x"]


def test_whitespace_preserves_case_and_punct(one):
    got = one(tokenize.tokenize(F.lit("  Hello,  World-42! "), "whitespace"))
    assert got == ["Hello,", "World-42!"]


def test_raw_whole_value_single_term(one):
    got = one(tokenize.tokenize(F.lit("  ERROR Level  "), "raw"))
    assert got == ["ERROR Level"]


def test_en_stem_fixed_tokens(one):
    # full Porter: step-1b cleanup gives running -> run (VERDICT r02 #4)
    got = one(tokenize.tokenize(
        F.lit("classes entries errors running jumped pass kiss"), "en_stem"
    ))
    assert got == ["class", "entri", "error", "run", "jump", "pass", "kiss"]


def test_bpe_ish_token_budget(one):
    from go_distributed_log_search_spark.operators import textstats

    text = F.lit("don't stop, it's 42km!")
    assert one(textstats.ws_token_count_expr(text)) == 4
    # don | 't | ' stop' | ',' | ' it' | 's-contraction | ' 42' | km | '!'
    assert one(textstats.bpe_token_count_expr(text)) == 9


def test_en_stem_keeps_short_and_vowelless(one):
    # no vowel before 'ing' -> untouched; bare 'ss' kept
    got = one(tokenize.tokenize(F.lit("string thing ss"), "en_stem"))
    assert got == ["string", "thing", "ss"]


def test_approx_distinct_close_to_exact(spark):
    from .conftest import SF0001
    from go_distributed_log_search_spark.queries import q_approx_distinct

    for r in q_approx_distinct(spark, SF0001).collect():
        assert abs(r.approx_distinct - r.exact_distinct) <= max(
            3, 0.05 * r.exact_distinct
        ), r
