"""Tokenizers — the text-field analysis modes of the reference schema.

Reference: /root/reference/src/config/mod.go:53-58 declares tokenizer
``default | raw | en_stem | whitespace`` per text field; Bluge applies them
at index time (src/commands/index.go:174). Here a tokenizer is a Column ->
ArrayType(String) expression used by the posting-count aggregation
(operators/aggregate.py) and text stats. All JVM-side.

- default:    lowercase, split on non-alphanumeric runs, drop empties
              (Lucene/Bluge standard-analyzer analog).
- whitespace: split on whitespace runs, case preserved.
- raw:        whole trimmed value is a single term (keyword field).
- en_stem:    default + a light English suffix-stripper (Porter step-1-ish)
              expressed as chained regexp_replace — clearly labeled an
              approximation of Bluge's en_stem.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Kept dialect-portable with the DuckDB oracle:
# lower -> regexp_split -> filter empty.
DEFAULT_SPLIT_PATTERN = "[^a-z0-9]+"


def tokenize_default(col: Column) -> Column:
    toks = F.split(F.lower(col), DEFAULT_SPLIT_PATTERN)
    return F.filter(toks, lambda t: t != "")


def tokenize_whitespace(col: Column) -> Column:
    toks = F.split(col, "\\s+")
    return F.filter(toks, lambda t: t != "")


def tokenize_raw(col: Column) -> Column:
    return F.array(F.trim(col))


def _stem(term: Column) -> Column:
    # sses->ss, ies->i, drop trailing s (not ss); ing/ed stripped when a
    # vowel remains before the suffix. Approximation, documented as such.
    t = F.regexp_replace(term, "sses$", "ss")
    t = F.regexp_replace(t, "ies$", "i")
    t = F.regexp_replace(t, "([^s])s$", "$1")
    t = F.regexp_replace(t, "([aeiou].*)(ing|ed)$", "$1")
    return t


def tokenize_en_stem(col: Column) -> Column:
    return F.transform(tokenize_default(col), _stem)


TOKENIZERS = {
    "default": tokenize_default,
    "whitespace": tokenize_whitespace,
    "raw": tokenize_raw,
    "en_stem": tokenize_en_stem,
}


def tokenize(col: Column, mode: str = "default") -> Column:
    return TOKENIZERS[mode](col)
