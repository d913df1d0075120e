"""Streaming exact dedup: drop re-crawled duplicate documents as shards
stream in — the ingestion-side twin of operators/dedup.exact_duplicates.

The reference has no streaming constructs (it is a bounded batch binary);
this leg exists because a crawl pipeline that tails an object-store prefix
must not re-emit documents whose content it has already shipped.  Shape:

    readStream -> md5(text) content key -> event-time watermark
               -> dropDuplicatesWithinWatermark -> append sink

``dropDuplicatesWithinWatermark`` keys the state store on the content
digest and expires entries once the watermark passes them, so state stays
bounded by the dedup horizon (re-crawls of the same page arrive within
days, not months) instead of growing with the corpus — the property that
makes this viable at crawl scale.  A batch twin with identical semantics
over one bounded input (first occurrence wins) is provided for tests and
the oracle pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id string, crawl_ts timestamp, text string"


def dedup_stream(spark: SparkSession, input_dir: str, out_dir: str,
                 horizon: str = "1 hour") -> None:
    """Drain available input (availableNow), emitting each distinct
    content digest once within the watermark horizon; restart-safe via the
    sink checkpoint."""
    stream = (spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
              .withColumn("text_hash", F.md5("text"))
              .withWatermark("crawl_ts", horizon)
              .dropDuplicatesWithinWatermark(["text_hash"]))
    q = (stream.writeStream.outputMode("append")
         .option("checkpointLocation", f"{out_dir}/_checkpoint")
         .trigger(availableNow=True)
         .format("parquet").option("path", f"{out_dir}/docs").start())
    q.awaitTermination()


def dedup_batch(docs: DataFrame) -> DataFrame:
    """Bounded-input twin: first occurrence (by crawl_ts, doc_id) of each
    content digest wins."""
    from pyspark.sql import Window
    w = Window.partitionBy("text_hash").orderBy("crawl_ts", "doc_id")
    return (docs.withColumn("text_hash", F.md5("text"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
