"""Spark operators: native Column filter stages + Arrow-batched kernels."""
