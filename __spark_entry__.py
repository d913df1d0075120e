"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction (full pipeline over the
interleaved spans table synthesized from sf0.001 documents) and returns the
exploded span sequences.  ``queries()`` / ``oracle_sql()`` expose every
implemented operator with its DuckDB twin (see
warc2text_spark/plans/benchqueries.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _ship(spark: SparkSession) -> None:
    from warc2text_spark.session import _ship_package
    _ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship(spark)
    from warc2text_spark.plans.benchqueries import q_extract_spans
    return q_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from warc2text_spark.plans import benchqueries

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in benchqueries.queries().items()}


def oracle_sql() -> dict[str, str]:
    from warc2text_spark.plans.benchqueries import oracle_sql as _oracle
    return _oracle()
