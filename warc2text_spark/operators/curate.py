"""End-to-end corpus-curation sweep: the composition a training-data
pipeline actually runs — quality gate, then exact dedup, then domain-mix
cap — expressed purely in the operators this package already ships, so the
whole sweep stays native Catalyst (three shuffles total: the dedup window,
the host window, plus gopher's zero).

    docs (doc_id, url, text)
      -> gopher_rules(...).pass           [per-row projection, no shuffle]
      -> exact dedup, first doc_id wins   [window over md5(text)]
      -> host_cap(cap)                    [window over host]

Each stage is individually oracle-verified; the composed sweep has its own
chained DuckDB twin (plans/benchqueries 'curate').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import gopher_rules, host_cap


def curate(docs: DataFrame, cap: int = 5, **gopher_kwargs) -> DataFrame:
    """Quality-gate -> dedup-keep-first -> per-host cap over
    (doc_id, url, text) rows; returns host_cap's (doc_id, host, n_chars,
    rank).  Keep-first uses STRING doc_id order (engine-portable, same
    rule as the pair operators)."""
    passing = gopher_rules(docs, **gopher_kwargs) \
        .filter(F.col("pass")).select("doc_id")
    base = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       "url", "text")
    kept = base.join(passing, "doc_id")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    first = (kept.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).drop("rn"))
    return host_cap(first, cap)
