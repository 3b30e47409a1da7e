"""PySpark-native analytics engine with the query/data-processing
capabilities of Govetachun/Go-Distributed-Log-Search ("toshokan-go").

Brand-new Spark-first implementation (DataFrame/SQL + Catalyst), NOT a port
of the reference's Go execution engine. See SURVEY.md for the capability
mapping and /root/reference file:line citations in each module docstring.

Layout:
- ``session``     SparkSession factory tuned for the sandbox (local[32]).
- ``transcripts`` deterministic transcripts view (the north-rule input shape)
                  derived from the driver-provided events/documents parquet.
- ``schema``      YAML index-schema -> StructType factory (create command).
- ``functions``   parse/tokenize/grok/scoring column-expression builders.
- ``operators``   parse, enrich, route, aggregate, search, merge, dedup,
                  similarity, textstats, multimodal.
- ``plans``       Tantivy-ish query string -> Catalyst Column compiler.
- ``sources``     JSONL/stdin/kafka dispatch + warehouse catalog (parquet
                  stand-in for Iceberg in this sandbox).
- ``streaming``   micro-batch loop with commit-then-checkpoint ordering and
                  anti-join resume (kafka_checkpoints analog).
- ``pipeline``    end-to-end parse -> enrich -> route -> aggregate flow.
"""

__version__ = "0.1.0"
