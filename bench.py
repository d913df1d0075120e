"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The corpus is the interleaved spans table synthesized deterministically from
the sf documents table (warc2text_spark/plans/spansgen.py), replicated
REPLICATE× and materialized to parquet once (cache under .bench_cache/) so
timed runs exercise the real scan -> filter-pushdown -> kernel path.

Extra env knobs: SPARK_GRAFT_CPUS (default 32), BENCH_REPLICATE (default 20),
BENCH_SKIP_CACHE=1 to force rebuild.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from warc2text_spark.plans.benchqueries import (  # noqa: E402
    q_ann_cosine_topk,
    q_dedup_exact,
    q_minhash_pairs,
    q_quality_score,
    q_simhash,
)
from warc2text_spark.plans.pipeline import PipelineOptions, run_pipeline  # noqa: E402
from warc2text_spark.plans.spansgen import build_spans  # noqa: E402
from warc2text_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "20"))


def corpus_path() -> str:
    sf_tag = Path(SF_DIR).name
    return str(Path(__file__).resolve().parent / ".bench_cache" /
               f"{sf_tag}_x{REPLICATE}" / "spans")


def ensure_corpus(spark) -> str:
    path = corpus_path()
    marker = Path(path) / "_SUCCESS"
    if marker.exists() and not os.environ.get("BENCH_SKIP_CACHE"):
        return path
    build_spans(spark, SF_DIR, replicate=REPLICATE) \
        .repartition(CPUS * 2).write.mode("overwrite").parquet(path)
    return path


BIGDOC_FACTOR = int(os.environ.get("BENCH_BIGDOC_FACTOR", "50"))
BIGDOC_REPLICATE = int(os.environ.get("BENCH_BIGDOC_REPLICATE", "4"))


def ensure_bigdoc_corpus(spark) -> str:
    """Realistic large-page corpus (~15-20 KB bodies, ~400 MB total):
    each document's text repeated BIGDOC_FACTOR times through the same
    span templates — the size regime a real crawl extraction sees (bench
    small-doc bodies average ~300 B).  Note the templates make this a
    deliberately hard corpus: the standard/entity variants are far more
    entity-dense than real pages, so the MB/s includes heavy entity
    decoding."""
    sf_tag = Path(SF_DIR).name
    path = str(Path(__file__).resolve().parent / ".bench_cache" /
               f"{sf_tag}_big{BIGDOC_FACTOR}x{BIGDOC_REPLICATE}" / "spans")
    marker = Path(path) / "_SUCCESS"
    if marker.exists() and not os.environ.get("BENCH_SKIP_CACHE"):
        return path
    build_spans(spark, SF_DIR, replicate=BIGDOC_REPLICATE,
                text_factor=BIGDOC_FACTOR) \
        .repartition(CPUS * 2).write.mode("overwrite").parquet(path)
    return path


def force(df) -> int:
    """Materialize fully without sink cost."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    spark = get_spark("warc2text-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_corpus(spark)
    spans = spark.read.parquet(path)
    n_docs = spans.count()

    # warmup: spin up python workers + JIT before timing (steady-state measure)
    warm = run_pipeline(spans.limit(4000).repartition(CPUS),
                        PipelineOptions(classifier="heuristic"))
    force(warm.main)

    timings: dict[str, float] = {}

    def timed(name, fn, repeat=1):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # headline: end-to-end extraction (filters -> kernels -> demux).
    # Scan partitions are already size-bounded, so the hot path skips the
    # salted repartition; the salted variant is timed separately (it is the
    # explicit skew defense for corpora with pathological layout).
    from warc2text_spark.plans.pipeline import demux_by_lang

    def run_extract(num_partitions=None):
        res = run_pipeline(spans, PipelineOptions(
            classifier="heuristic", num_partitions=num_partitions))
        force(demux_by_lang(res.main))

    # best-of-2: this host's run-to-run variance is +-30%
    timed("extract_e2e", run_extract, repeat=2)
    timed("extract_salted", lambda: run_extract(CPUS * 2))
    timed("dedup_exact", lambda: force(q_dedup_exact(spark, SF_DIR)))

    # the pair queries persist their signature projection internally; a
    # naive repeat would hit CacheManager's semantically-equal cached plan
    # and time a warm cache.  release_intermediates between runs unpersists
    # it, so best-of-2 times the cold query both times.
    from warc2text_spark.operators.dedup import release_intermediates
    from warc2text_spark.plans.benchqueries import q_simhash_pairs

    def run_released(q):
        out = q(spark, SF_DIR)
        force(out)
        release_intermediates(out)

    timed("minhash_pairs", lambda: run_released(q_minhash_pairs), repeat=2)
    timed("simhash_pairs", lambda: run_released(q_simhash_pairs), repeat=2)
    # best-of-2 on the sub-2s queries too (VERDICT r2: the +-30% host swing
    # made single samples look like regressions)
    timed("simhash", lambda: force(q_simhash(spark, SF_DIR)), repeat=2)
    timed("quality_score", lambda: force(q_quality_score(spark, SF_DIR)),
          repeat=2)
    timed("ann_cosine_topk", lambda: force(q_ann_cosine_topk(spark, SF_DIR)),
          repeat=2)

    # large-page extraction (the 100 TB regime: real crawl pages are
    # 10-100 KB, not the 300 B small-doc bodies above) — reported as
    # MB/s of span payload through the full pipeline
    import pyspark.sql.functions as F
    big = spark.read.parquet(ensure_bigdoc_corpus(spark))
    big_bytes = big.select(F.expr(
        "aggregate(transform(spans, s -> octet_length(s.text) + "
        "octet_length(s.media_ref)), 0L, (a, x) -> a + x)").alias("b")) \
        .agg(F.sum("b")).collect()[0][0]

    def run_big():
        res = run_pipeline(big, PipelineOptions(classifier="heuristic"))
        force(demux_by_lang(res.main))

    timed("extract_bigdoc", run_big, repeat=2)
    bigdoc_mb_per_sec = round(big_bytes / 1e6 / timings["extract_bigdoc"], 1)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["extract_e2e"], 1)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": Path(SF_DIR).name,
        "n_docs": n_docs,
        "cpus": CPUS,
        "extract_docs_per_sec": docs_per_sec,
        "bigdoc_mb_per_sec": bigdoc_mb_per_sec,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
