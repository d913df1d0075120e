"""Checkpoint-ledger resume and streaming-pipeline tests."""

import pyspark.sql.functions as F
import pytest

from warc2text_spark.plans.checkpoint import (
    BatchJobConfig,
    completed_buckets,
    run_batch,
    with_bucket,
)
from warc2text_spark.plans.pipeline import PipelineOptions
from warc2text_spark.sources.fixtures import INPUT_SCHEMA, _doc, _t


def make_docs(spark, n=40):
    rows = [_doc(f"doc-{i:04d}", [_t(f"<p>body {i} of document</p>")])
            for i in range(n)]
    return spark.createDataFrame(rows, schema=INPUT_SCHEMA)


def test_run_batch_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    df = make_docs(spark)
    cfg = BatchJobConfig(out_dir=out, num_buckets=8, waves=4,
                         options=PipelineOptions(classifier="skip"))

    # simulate a crash between waves: stop after 2 of the 4 waves (a real
    # crash leaves no ledger rows for the incomplete wave, so the ledger
    # state is exactly "first k waves committed")
    crashed = BatchJobConfig(out_dir=out, num_buckets=8, waves=4,
                             options=PipelineOptions(classifier="skip"),
                             stop_after_waves=2)
    run_batch(spark, df, crashed)
    done_after_crash = completed_buckets(spark, out)
    assert done_after_crash and len(done_after_crash) < 8  # partial progress

    # resume with the full input: completed buckets must be skipped
    summary = run_batch(spark, df, cfg)
    assert summary["buckets_skipped"] == len(done_after_crash)

    result = spark.read.parquet(f"{out}/text")
    got = sorted(r.doc_id for r in result.select("doc_id").collect())
    assert got == sorted(f"doc-{i:04d}" for i in range(40))  # no dups, no gaps

    ledger = spark.read.parquet(f"{out}/_ledger")
    agg = ledger.groupBy("bucket").count().collect()
    totals = ledger.agg(F.sum("n_kept").alias("k")).collect()[0]
    assert totals.k == 40
    metrics = spark.read.parquet(f"{out}/_metrics")
    assert metrics.agg(F.sum("n_rows")).collect()[0][0] == 40
    assert {r.bucket for r in agg} == set(range(8))


def test_empty_buckets_get_ledger_rows(spark, tmp_path):
    # A bucket whose wave yields zero prefiltered rows must still get a
    # ledger row (n_input=0) so it is marked complete and never reprocessed.
    out = str(tmp_path / "out3")
    df = make_docs(spark, 2)  # 2 docs over 8 buckets: most buckets empty
    cfg = BatchJobConfig(out_dir=out, num_buckets=8, waves=2,
                         options=PipelineOptions(classifier="skip"))
    run_batch(spark, df, cfg)
    ledger = spark.read.parquet(f"{out}/_ledger")
    assert {r.bucket for r in ledger.select("bucket").collect()} == set(range(8))
    empties = ledger.filter(F.col("n_input") == 0).collect()
    assert empties and all(r.n_kept == 0 for r in empties)
    summary = run_batch(spark, df, cfg)
    assert summary["buckets_processed"] == 0


def test_rerun_is_noop(spark, tmp_path):
    out = str(tmp_path / "out2")
    df = make_docs(spark, 10)
    cfg = BatchJobConfig(out_dir=out, num_buckets=4, waves=2,
                         options=PipelineOptions(classifier="skip"))
    run_batch(spark, df, cfg)
    summary = run_batch(spark, df, cfg)
    assert summary["buckets_processed"] == 0
    assert spark.read.parquet(f"{out}/text").count() == 10


@pytest.mark.parametrize("n", [25])
def test_streaming_pipeline(spark, tmp_path, n):
    from warc2text_spark.streaming.stream_pipeline import run_streaming_pipeline
    inp = str(tmp_path / "in")
    out = str(tmp_path / "sout")
    make_docs(spark, n).repartition(3).write.parquet(inp)
    run_streaming_pipeline(spark, inp, out,
                           PipelineOptions(classifier="skip"))
    got = spark.read.parquet(f"{out}/text")
    assert got.count() == n
    assert got.select("lang").distinct().collect()[0].lang == "unlabeled"

    # idempotent restart: the checkpoint remembers processed files
    run_streaming_pipeline(spark, inp, out, PipelineOptions(classifier="skip"))
    assert spark.read.parquet(f"{out}/text").count() == n


def test_stop_after_waves_summary_counts_only_executed(spark, tmp_path):
    out = str(tmp_path / "out4")
    df = make_docs(spark, 20)
    cfg = BatchJobConfig(out_dir=out, num_buckets=8, waves=4,
                         options=PipelineOptions(classifier="skip"),
                         stop_after_waves=2)
    summary = run_batch(spark, df, cfg)
    assert summary["waves_run"] == 2
    assert summary["buckets_processed"] == 4  # 2 waves x 2 buckets
    assert summary["buckets_pending"] == 4


def test_pure_streaming_extract_matches_batch(spark, tmp_path):
    """The PURE streaming extraction plan (no foreachBatch shim): the
    native filters, the mapInArrow kernel with fused langid, the error
    dispatch and the demux compose directly on the unbounded frame and
    produce EXACTLY the batch pipeline's (doc_id, lang, chunk) rows."""
    from warc2text_spark.plans.pipeline import demux_by_lang, run_pipeline
    from warc2text_spark.streaming.stream_pipeline import streaming_extract
    inp = str(tmp_path / "pin")
    docs = make_docs(spark, 30)
    docs.repartition(3).write.parquet(inp)
    out = streaming_extract(spark, inp,
                            PipelineOptions(classifier="heuristic"))
    assert out.isStreaming
    q = (out.selectExpr("doc_id", "lang", "chunk")
         .writeStream.format("memory").queryName("pure_stream_extract")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple,
                     spark.sql("select * from pure_stream_extract")
                     .collect()))
    res = run_pipeline(spark.read.parquet(inp),
                       PipelineOptions(classifier="heuristic"))
    want = sorted(map(tuple,
                      demux_by_lang(res.main)
                      .selectExpr("doc_id", "lang", "chunk").collect()))
    assert got == want and len(got) == 30
