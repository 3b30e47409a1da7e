"""Match scoring — reference-parity additive field-weight scorer (A3).

Reference: /root/reference/src/commands/search.go:222-264. The implemented
search predicate is case-insensitive SUBSTRING containment of the whole
query string against every string field (P10, search.go:228); the score is
an additive sum of hardcoded per-field weights over the fields that matched
(search.go:230-243):

    title/body/message            +10
    severity_text/level/content    +8
    service/class/operation        +6
    tags/category                  +4
    author/user_id                 +3
    any other string field         +2
    any string value in a nested map +3

A document is kept iff score > 0 (search.go:258-264). The whole scorer is
one Catalyst column expression — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# search.go:230-243 weight classes by field name.
FIELD_WEIGHTS: dict[str, float] = {
    "title": 10.0, "body": 10.0, "message": 10.0, "text": 10.0,
    "severity_text": 8.0, "level": 8.0, "content": 8.0,
    "service": 6.0, "class": 6.0, "operation": 6.0, "op": 6.0, "tool": 6.0,
    "tags": 4.0, "category": 4.0,
    "author": 3.0, "user_id": 3.0,
}
DEFAULT_STRING_WEIGHT = 2.0
NESTED_MAP_WEIGHT = 3.0


def field_weight(name: str) -> float:
    """Weight by the LEAF field name: a dotted struct-child path like
    ``resource.service`` weighs as ``service`` (+6) — the reference scores
    flattened dotted names by their terminal segment (search.go:229-243)."""
    return FIELD_WEIGHTS.get(name.rsplit(".", 1)[-1], DEFAULT_STRING_WEIGHT)


def contains_ci(col: Column, query: str) -> Column:
    """P10 predicate: lowercase substring containment (search.go:228)."""
    return F.instr(F.lower(col), query.lower()) > 0


def score_expr(query: str, string_fields: list[str], map_fields: list[str] | None = None) -> Column:
    """A3: additive score over matching fields, one column expression."""
    parts = [
        F.when(contains_ci(F.col(f), query), F.lit(field_weight(f))).otherwise(F.lit(0.0))
        for f in string_fields
    ]
    for mf in map_fields or []:
        # +3 per matching nested string value (search.go:245-253)
        matched = F.filter(
            F.map_values(F.col(mf)),
            lambda v: F.instr(F.lower(v), query.lower()) > 0,
        )
        parts.append(F.size(matched).cast("double") * NESTED_MAP_WEIGHT)
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out
