"""Column-expression builders: parse casts, tokenizers, grok, scoring."""
