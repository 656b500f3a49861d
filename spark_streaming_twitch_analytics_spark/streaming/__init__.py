"""Structured Streaming rebuild of the reference's DStream dataflow
(SURVEY §2.10 ST1-ST8, §3.1)."""
