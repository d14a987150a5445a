"""Dataflow + training-data-pipeline operators.

Loader dataflow (reference SS2.1): parse (O2/O3), decompression (O1),
batching/rolling (O6), bad rows (O12).
Pipeline extensions (beyond the reference, SURVEY.md SS7.8): dedup,
similarity search, text analysis, multimodal plumbing.
"""
