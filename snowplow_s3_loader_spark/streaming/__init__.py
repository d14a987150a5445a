"""The streaming loader pipeline (reference Processing.scala:69-77 mapped to
Structured Streaming + foreachBatch) with metrics and health."""
