"""Streaming: micro-batch loop with checkpointed resume (ST1-ST6)."""
