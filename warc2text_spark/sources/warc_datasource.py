"""PySpark Python Data Source for WARC files: ``spark.read.format("warc")``.

The idiomatic Spark 4 integration of sources/warcio.py — a DataSourceV2
(Python API) whose partitions are WARC files, so the scan parallelizes one
task per file (the reference's own scale-out unit, one process per WARC).

Usage::

    from warc2text_spark.sources.warc_datasource import register
    register(spark)
    df = spark.read.format("warc").load("/data/crawl/*.warc.gz")

Options: ``max_record_size`` (bytes, default 20 MB — warc2text_main.cc:64).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .fixtures import INPUT_SCHEMA

MAX_RECORD_SIZE = 20 * 1024 * 1024


class WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc datasource requires a path")
        self.max_record_size = int(options.get("max_record_size",
                                               MAX_RECORD_SIZE))

    def partitions(self):
        paths = sorted(glob.glob(self.path))
        if not paths and os.path.isdir(self.path):
            paths = sorted(glob.glob(os.path.join(self.path, "*.warc.gz")))
        if not paths and os.path.exists(self.path):
            paths = [self.path]
        if not paths:
            raise FileNotFoundError(self.path)
        return [WarcFilePartition(p) for p in paths]

    def read(self, partition: WarcFilePartition):
        from .warcio import parse_warc_file
        with open(partition.path, "rb") as f:
            data = f.read()
        name = partition.path.rsplit("/", 1)[-1]
        for row in parse_warc_file(data, name, self.max_record_size):
            yield (row["doc_id"], row["url"], row["warc_type"],
                   row["warc_ct"], row["http_status"], row["http_ct"],
                   row["content_enc"], row["transfer_enc"],
                   row["warc_date"],
                   [(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in row["spans"]])


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return INPUT_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WarcDataSourceReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WarcDataSource)
