"""`python -m go_distributed_log_search_spark` — reference CLI parity
(src/main.go:50-71)."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
