"""Sinks: partitioned table writes live in plans/pipeline.py; this package
holds the WARC side-output writer (K3 parity)."""
