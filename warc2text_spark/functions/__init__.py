"""Pure-Python kernel functions (no Spark imports here).

These implement the scalar contracts of the reference pipeline
(/root/reference/src/*.cc, cited per module) and are executed inside
Arrow-batched kernels from :mod:`warc2text_spark.operators`.
"""
