"""BPE tokenizer: training + distributed encoding.

Beyond-reference (graft mandate): completes the tokenizer-training story
started by :func:`warc2text_spark.operators.textops.bpe_pair_counts`
(which computes iteration-0 pair counts).  Public algorithm — Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units" — with the same symbol convention as ``bpe_pair_counts``:
characters at iteration 0, an end-of-word marker ``</w>`` fused onto the
last symbol, deterministic ties (count desc, pair asc).

Scale split (how real pipelines do it):

* **Training** is driver-side over the *capped distinct-word frequency
  table* — the type/token ratio collapses a 100 TB corpus to a bounded
  vocabulary (the ``surprisal`` ``vocab_cap`` precedent; tokenizers are
  trained on a sample/cap in practice).  One map-side-combined groupBy +
  TakeOrderedAndProject, one bounded collect, pure-Python merge loop
  with an incremental pair index (no full recount per merge).
* **Encoding** is distributed with Python cost proportional to distinct
  TYPES, not tokens: tokens explode JVM-side, the merge loop runs once
  per distinct word in a mapInPandas kernel, and the (word ->
  subword count) table joins back (optimizer-sized — broadcast when the
  type table is genuinely small) before a map-side-combined per-doc
  aggregate.  The corpus never crosses into Python.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import DataFrame, functions as F

from .textops import tokens

END = "</w>"


def _syms(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END,)


def _merge_syms(syms: tuple[str, ...],
                pair: tuple[str, str]) -> tuple[str, ...]:
    a, b = pair
    out = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_local(word_counts: dict[str, int],
                    num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table.
    Incremental: a pair -> words index restricts each round's recount to
    the words the chosen merge actually touches."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if not w:
            continue
        s = _syms(w)
        vocab[s] = vocab.get(s, 0) + c
    pairs: Counter = Counter()
    index: defaultdict[tuple[str, str], set] = defaultdict(set)

    def account(s: tuple[str, ...], c: int, sign: int) -> None:
        for p, k in Counter(zip(s, s[1:])).items():
            pairs[p] += sign * k * c
            if sign > 0:
                index[p].add(s)
            else:
                index[p].discard(s)

    for s, c in vocab.items():
        account(s, c, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best_c = 0
        for c in pairs.values():
            if c > best_c:
                best_c = c
        if best_c <= 0:
            break
        best = min(p for p, c in pairs.items() if c == best_c)
        merges.append(best)
        for s in list(index[best]):
            c = vocab.pop(s)
            account(s, c, -1)
            m = _merge_syms(s, best)
            if m in vocab:
                # merged form collides with an existing word's form:
                # fold the counts (un-account the old, re-account merged)
                account(m, vocab[m], -1)
                vocab[m] += c
            else:
                vocab[m] = c
            account(m, vocab[m], +1)
    return merges


def bpe_train_naive(word_counts: dict[str, int],
                    num_merges: int) -> list[tuple[str, str]]:
    """Reference-shaped twin of :func:`bpe_train_local`: full pair
    recount every round (the Sennrich pseudocode verbatim).  Kept for
    differential tests — never delete the slow path."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if not w:
            continue
        s = _syms(w)
        vocab[s] = vocab.get(s, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for s, c in vocab.items():
            for p in zip(s, s[1:]):
                pairs[p] += c
        if not pairs:
            break
        best_c = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_c)
        merges.append(best)
        vocab2: dict[tuple[str, ...], int] = {}
        for s, c in vocab.items():
            m = _merge_syms(s, best)
            vocab2[m] = vocab2.get(m, 0) + c
        vocab = vocab2
    return merges


def bpe_train(df: DataFrame, num_merges: int = 200,
              text_col: str = "text",
              vocab_cap: int = 100_000) -> list[tuple[str, str]]:
    """Distributed pass 1 (capped type table), driver-side merge loop.
    The collect is bounded by ``vocab_cap`` rows — megabytes, not the
    corpus (cap keeps the highest-count types; ties broken by word so
    the sample is deterministic)."""
    wf = (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
          .filter(F.col("w") != "")
          .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("wc"))
          .orderBy(F.col("wc").desc(), F.col("w"))
          .limit(vocab_cap)
          .collect())
    return bpe_train_local({r.w: r.wc for r in wf}, num_merges)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]
                    ) -> list[str]:
    """Rank-greedy BPE encode (the standard fast form: repeatedly merge
    the present pair with the lowest merge rank)."""
    if not word:
        return []
    s = list(_syms(word))
    while len(s) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = s[best_i], s[best_i + 1]
        # merge every occurrence of this pair left-to-right
        out = []
        i = 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_encode_word_sequential(word: str,
                               merges: list[tuple[str, str]]) -> list[str]:
    """Spec twin of :func:`bpe_encode_word`: apply the merge list in
    training order, one full pass each — the literal training-time
    semantics.  Differential tests pin the fast form to this."""
    if not word:
        return []
    s = _syms(word)
    for p in merges:
        if len(s) == 1:
            break
        s = _merge_syms(s, p)
    return list(s)


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document token count under the trained subword vocabulary:
    (id, n_tokens, n_subwords).  The merge loop runs once per distinct
    TYPE (mapInPandas over the distinct-word frame); the corpus-sized
    frames stay JVM-side (explode, equality join on the word, map-side
    combined per-doc aggregate)."""
    from collections.abc import Iterator

    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "w": pdf["w"],
                "n_sub": [len(bpe_encode_word(w, ranks))
                          for w in pdf["w"]]})

    toks = df.select(F.col(id_col).cast("string").alias(id_col),
                     F.explode(tokens(F.col(text_col))).alias("w")) \
        .filter(F.col("w") != "")
    types = toks.select("w").distinct()
    encoded = types.mapInPandas(kernel, "w string, n_sub int")
    agg = (toks.join(encoded, "w")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.sum("n_sub").cast("long").alias("n_subwords")))
    # empty/whitespace-only docs produce no exploded rows: keep them as
    # (id, 0, 0) — the contract is one row per input document
    ids = df.select(F.col(id_col).cast("string").alias(id_col))
    return (ids.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_subwords", F.lit(0))
                    .alias("n_subwords")))
