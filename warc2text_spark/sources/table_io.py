"""Input/output table IO with Iceberg support (gated) and parquet fallback.

The production data model is an Iceberg table (BASELINE.json input_hint);
this sandbox has no Iceberg runtime jars, so reads try the Iceberg source
first when asked (or when the location looks like a catalog table name) and
fall back to parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def looks_like_table_name(location: str) -> bool:
    return "/" not in location and not location.startswith("file:")


def read_input(spark: SparkSession, location: str,
               fmt: str | None = None) -> DataFrame:
    if fmt == "iceberg" or (fmt is None and looks_like_table_name(location)):
        try:
            return spark.read.format("iceberg").load(location)
        except Exception:
            if fmt == "iceberg":
                raise
    return spark.read.parquet(location)


def write_output(df: DataFrame, location: str, fmt: str = "parquet",
                 partition_by: tuple[str, ...] = (), mode: str = "overwrite",
                 compression: str | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.format(fmt).save(location)
