"""Parse stage — schema-driven projection of the transcript text column.

Reference analog: P1 schema-driven field projection
(/root/reference/src/commands/index.go:139-156): for each schema field
present in the doc, parse+emit the typed value and REMOVE it from the raw
doc; everything unclaimed lands in the ``_dynamic`` map
(src/commands/mod.go:23, index.go:154-156).

Here the "document" is a transcript turn and the claimed fields are the
grok-extracted structured columns (level, error_signature, tool_call,
src/dest/bytes/op/duration); the unclaimed ``key: value`` pairs of the text
body land in ``_dynamic: map<string,string>`` — computed with
``regexp_extract_all`` + ``map_from_arrays`` minus the claimed keys, fully
JVM-side.

Scale notes: one narrow projection over the scan — no shuffle, no UDF;
Catalyst prunes unused extraction exprs when downstream selects fewer
columns. At 100 TB this stage is scan-bound, exactly as it should be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import grok

# keys the typed schema claims from the k:v body (P1 "delete from raw doc");
# src/dest stay unclaimed so they land in _dynamic — exercising the
# dynamic-field path (index.go:154-156) with real leftovers.
CLAIMED_KEYS = ("bytes", "op", "duration")
_KV_PATTERN = r"(\w+): ([\w/.:]+)"


def parse_turns(df: DataFrame, dynamic: bool = True) -> DataFrame:
    """transcripts -> typed columns + _dynamic map (P1-P9 analog)."""
    text = F.col("text")
    out = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        "text",
        grok.level_expr(text).alias("level"),
        grok.error_signature_expr(text).alias("error_signature"),
        grok.tool_marker_expr(text).alias("tool_call"),
        grok.kv_long_expr(text, "bytes").alias("bytes"),
        grok.kv_str_expr(text, "op").alias("op"),
        grok.kv_long_expr(text, "duration").alias("duration"),
    )
    if dynamic:
        # defensive: the harness may run this in a session without
        # session.py's defaults; EXCEPTION (the default policy) would abort
        # the whole job on one repeated `key: value` in free text
        df.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        kvs = F.regexp_extract_all(text, F.lit(_KV_PATTERN), F.lit(0))
        keys = F.transform(kvs, lambda kv: F.regexp_extract(kv, _KV_PATTERN, 1))
        vals = F.transform(kvs, lambda kv: F.regexp_extract(kv, _KV_PATTERN, 2))
        # duplicate keys within one line are legal (free text can repeat
        # `src: ...`); map construction resolves them last-win via
        # spark.sql.mapKeyDedupPolicy=LAST_WIN (session.py) — the analog of
        # the reference overwriting a doc field on re-parse. Occurrence
        # counts (which the oracle checks) come from
        # unclaimed_kv_count_expr over the raw array, not from the map.
        dyn = F.map_filter(
            F.map_from_arrays(keys, vals),
            lambda k, v: ~k.isin(*CLAIMED_KEYS),
        )
        out = out.withColumn("_dynamic", dyn)
    return out


def unclaimed_kv_count_expr(text: Column) -> Column:
    """Number of unclaimed `key: value` OCCURRENCES in the text body
    (duplicates counted, matching the DuckDB oracle's list semantics —
    F.size(_dynamic) would count distinct keys only)."""
    kvs = F.regexp_extract_all(text, F.lit(_KV_PATTERN), F.lit(0))
    keys = F.transform(kvs, lambda kv: F.regexp_extract(kv, _KV_PATTERN, 1))
    return F.size(F.filter(keys, lambda k: ~k.isin(*CLAIMED_KEYS)))


def parse_turns_grok_udf(df: DataFrame) -> DataFrame:
    """Same extraction via the Arrow-vectorized grok engine — the
    demonstrated slow path for non-Catalyst-expressible dictionaries.
    Used by tests to assert both engines agree; NOT the default."""
    return grok.grok_extract_pandas(
        df,
        "text",
        [
            "level=%{LOGLEVEL:level} sig=%{WORD:error_signature}",
            "level=%{LOGLEVEL:level}",
            "<tool:%{WORD:tool_call} ",
        ],
        ["level", "error_signature", "tool_call"],
    )


def parse_coverage(
    parsed: DataFrame,
    fields: tuple = (
        "level",
        "error_signature",
        "tool_call",
        "bytes",
        "op",
        "duration",
    ),
) -> DataFrame:
    """Grok-extraction coverage audit: for every extracted field, how
    many turns produced a non-null value and what fraction of the corpus
    that is — the parse-observability counter a production log pipeline
    alarms on (a pattern whose hit-rate collapses after an upstream
    format change is the #1 silent-corruption mode; the reference's
    analog is its corrupt-line quarantine count, jsonl_source.go).

    Shape: ONE scan + ONE global aggregate computing all per-field sums
    map-side (partial+final around a single 1-row exchange); stack()
    reshapes the 1-row result into |fields| rows driver-free. Adding a
    field adds a column to the same pass, never another scan.

    Output: (field, n_present, n_total, pct) ordered by field.
    """
    sums = parsed.agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            F.sum(F.col(f).isNotNull().cast("long")).alias(f"_{f}")
            for f in fields
        ],
    )
    stack_args = ", ".join(f"'{f}', _{f}" for f in fields)
    return (
        sums.selectExpr(
            "n_total",
            f"stack({len(fields)}, {stack_args}) AS (field, n_present)",
        )
        .select(
            "field",
            "n_present",
            "n_total",
            F.round(F.col("n_present") / F.col("n_total"), 4).alias("pct"),
        )
        .orderBy("field")
    )
