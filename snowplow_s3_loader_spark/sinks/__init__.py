"""Sinks: partitioned gzip blob output (O10) and the bad-row dead-letter
channel (O12)."""
