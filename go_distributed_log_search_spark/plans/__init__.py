"""Query-plan helpers: the Tantivy-ish query-string compiler."""
