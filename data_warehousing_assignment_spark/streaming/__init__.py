"""Structured Streaming surface (extension — SURVEY.md §2.10: the
reference has no streaming; this covers the stream-shaped ``events``
testdata table)."""
