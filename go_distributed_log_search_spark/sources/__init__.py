"""Sources and sinks: JSONL/stdin/kafka dispatch, warehouse catalog."""
