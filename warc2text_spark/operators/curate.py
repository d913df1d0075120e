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

from .textops import gopher_rules, host_cap, host_cap_salted


def curate(docs: DataFrame, cap: int = 5, salted_hosts: bool = True,
           **gopher_kwargs) -> DataFrame:
    """Quality-gate -> dedup-keep-first -> per-host cap over
    (doc_id, url, text) rows; returns host_cap's (doc_id, host, n_chars,
    rank).  Keep-first uses STRING doc_id order (engine-portable, same
    rule as the pair operators).

    ``salted_hosts`` (default) routes the cap through the two-phase
    :func:`host_cap_salted` — exact same output (top-N is associative
    under union; driver-verified on the host_cap row), but no single
    task ever sorts more than 1/salt_buckets of a viral mega-host, so
    the composed sweep inherits the skew-proof path at crawl scale.
    ``salted_hosts=False`` keeps the single-window form for tiny inputs
    where two window stages cost more than the skew they prevent."""
    passing = gopher_rules(docs, **gopher_kwargs) \
        .filter(F.col("pass")).select("doc_id")
    base = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       "url", "text")
    kept = base.join(passing, "doc_id")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    first = (kept.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).drop("rn"))
    capper = host_cap_salted if salted_hosts else host_cap
    return capper(first, cap)
