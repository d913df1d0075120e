"""Training-set selection operators: decontamination, LM-quality scoring,
deterministic sampling.

Beyond-reference (graft mandate): the operations a large-scale LLM
training-data pipeline applies after extraction/dedup to decide what goes
into the training set —

* :func:`decontaminate` — GPT-3/Pile-style benchmark decontamination:
  drop documents sharing any word n-gram with a held-out benchmark set.
* :func:`unigram_surprisal` — CCNet-direction language-model quality
  scoring: per-document mean token surprisal under a corpus-derived
  unigram model (low = fluent/common, high = gibberish or OOV-dense).
* :func:`sample_stratified` — deterministic hash-based per-stratum
  sampling (reproducible across runs/engines, no RNG state).

Scale notes are per-function; none of them shuffles the document payload.
"""

from __future__ import annotations

import math

import re

from pyspark.sql import DataFrame, functions as F

_WS_SPLIT = r"\s+"
# Python twin of the Spark/DuckDB tokenizer: Java and RE2 \s are the
# ASCII class [ \t\n\x0b\f\r], so the kernel must split ASCII-only too —
# Python's default \s would additionally split on U+00A0 etc. (which
# extracted HTML is full of, via &nbsp;), silently diverging from the
# model fit and the oracle.
_PY_WS = re.compile(_WS_SPLIT, re.ASCII)


def _py_tokens(text: str) -> list[str]:
    return [t for t in _PY_WS.split(text) if t]


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), _WS_SPLIT), lambda x: x != "")


def ngram_col(tokens, n: int):
    """Array of word n-grams (space-joined) of ``tokens``; empty when the
    document is shorter than ``n`` tokens.  Pure native expression."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(F.sequence(F.lit(1), F.size(tokens) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(tokens, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, build_hint: str = "auto") -> DataFrame:
    """Drop documents that share any word ``n``-gram with ``benchmark``
    (the GPT-3 appendix-C / Pile decontamination rule: an n-gram hit on a
    held-out eval set disqualifies the training document).

    Scale: the benchmark n-gram set is distinct-ed (a shuffle over the
    *benchmark* only) and joined semi against the document n-grams; the
    contaminated-id set is ids-only and bounded by the hit rate, and the
    final anti join never shuffles document payloads when the id set
    broadcasts.  ``build_hint`` (see :func:`~..operators.textops.hinted`)
    gates both build sides: ``"auto"`` lets AQE broadcast exactly when
    the benchmark/id sets are genuinely small (the common case — eval
    sets are tiny relative to the corpus); ``"merge"``/``"shuffle_hash"``
    is the bucketed-join fallback for benchmark suites too large to
    broadcast — identical output, n-grams shuffle on their hash instead.
    """
    from .textops import hinted
    bench_ng = (benchmark.select(
        F.explode(ngram_col(_tokens(text_col), n)).alias("ng")).distinct())
    doc_ng = docs.select(id_col, F.explode(
        ngram_col(_tokens(text_col), n)).alias("ng"))
    contaminated = (doc_ng.join(hinted(bench_ng, build_hint),
                                "ng", "left_semi")
                    .select(id_col).distinct())
    return docs.join(hinted(contaminated, build_hint), id_col, "left_anti")


def decontaminate_stream(stream: DataFrame, benchmark: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 8) -> DataFrame:
    """Streaming form of :func:`decontaminate`.  The batch form derives
    the contaminated-id set FROM the document side, which on a stream
    becomes an unsupported stream-stream anti join; here the (static,
    eval-set-sized) benchmark n-gram set is collected once and shipped in
    the task closure, and each micro-batch row is filtered by a
    vectorized n-gram membership test — stateless, so it composes with
    any output mode and no watermark is needed."""
    import pandas as pd

    bench_rows = (benchmark.select(
        F.explode(ngram_col(_tokens(text_col), n)).alias("ng"))
        .distinct().collect())
    bench_ng = {r["ng"] for r in bench_rows}
    schema = stream.schema

    def keep(batches):
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            mask = []
            for text in pdf[text_col]:
                toks = _py_tokens(text)
                hit = any(" ".join(toks[i:i + n]) in bench_ng
                          for i in range(len(toks) - n + 1))
                mask.append(not hit)
            yield pdf[pd.Series(mask, index=pdf.index)]

    return stream.mapInPandas(keep, schema)


def unigram_frequencies(docs: DataFrame, text_col: str = "text",
                        vocab_cap: int = 100_000) -> DataFrame:
    """(w, c) head-of-vocabulary term frequencies over the corpus —
    one map-side-combined groupBy; the cap bounds what the scorer must
    hold per executor (ties broken by word for determinism)."""
    return (docs.select(F.explode(_tokens(text_col)).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), "w").limit(vocab_cap))


def unigram_surprisal(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      vocab_cap: int = 100_000) -> DataFrame:
    """Per-document mean token surprisal (nats) under a Laplace-smoothed
    unigram model fit on the corpus itself: p(w) = (c_w + 1) / (T + V + 1)
    with T, V the head-vocabulary token/type totals; out-of-head tokens
    score c_w = 0.  Returns (id, n_tokens, surprisal) — the CCNet-style
    quality signal (high = OOV-dense/gibberish).

    The per-token term factors as ln(T+V+1) - ln(c_w + 1), so the score
    needs only sum(ln(c_w+1)) per document.  Scale: pass 1 is one counts
    shuffle truncated to ``vocab_cap`` rows (collected — bounded, ~MBs at
    the default cap; use a bigger cluster-side join only past ~1M types);
    pass 2 is a zero-shuffle vectorized Arrow kernel over the documents
    with the frequency table shipped in the task closure.
    """
    import pandas as pd

    freq_rows = unigram_frequencies(docs, text_col, vocab_cap).collect()
    freq = {r["w"]: r["c"] for r in freq_rows}
    denom_ln = math.log(sum(freq.values()) + len(freq) + 1)

    out_schema = f"{id_col} string, n_tokens long, surprisal double"

    def score(batches):
        log1p_cache = {w: math.log(c + 1) for w, c in freq.items()}
        for pdf in batches:
            ids, ns, scores = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = _py_tokens(text)
                if not toks:
                    continue
                s = 0.0
                for w in toks:
                    s += log1p_cache.get(w, 0.0)
                ids.append(str(did))
                ns.append(len(toks))
                scores.append(round(denom_ln - s / len(toks), 6))
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": ns, "surprisal": scores})

    return docs.select(id_col, text_col).mapInPandas(score, out_schema)


def sample_stratified(df: DataFrame, strata_col: str, pct: int,
                      key_col: str = "doc_id",
                      salt: str = "s4") -> DataFrame:
    """Deterministic ``pct``-percent sample per stratum: a row is kept
    when md5(strata:key:salt)'s leading 32 bits fall under the threshold.
    Reproducible across runs, engines and partitionings (no RNG state, no
    seed-per-partition drift); changing ``salt`` draws an independent
    sample.  Zero shuffle — a pure native filter that composes with
    partition pruning and pushdown."""
    bucket = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col(strata_col),
                          F.col(key_col).cast("string"), F.lit(salt))),
        1, 8), 16, 10).cast("long") % 100)
    return df.filter(bucket < pct)
