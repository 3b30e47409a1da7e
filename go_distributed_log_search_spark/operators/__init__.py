"""Dataflow operators: parse, enrich, route, aggregate, search, merge,
dedup, similarity, textstats, multimodal."""
