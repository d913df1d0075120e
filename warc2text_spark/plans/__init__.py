"""Logical plan assembly: end-to-end pipelines, metrics, checkpointing."""
