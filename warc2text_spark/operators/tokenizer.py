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


def _type_table(df: DataFrame, text_col: str,
                vocab_cap: int) -> dict[str, int]:
    """The shared pass 1 of every trainer: the capped distinct-word
    frequency table.  The collect is bounded by ``vocab_cap`` rows —
    megabytes, not the corpus (cap keeps the highest-count types; ties
    broken by word so the sample is deterministic)."""
    wf = (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
          .filter(F.col("w") != "")
          .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("wc"))
          .orderBy(F.col("wc").desc(), F.col("w"))
          .limit(vocab_cap)
          .collect())
    return {r.w: r.wc for r in wf}


def bpe_train(df: DataFrame, num_merges: int = 200,
              text_col: str = "text",
              vocab_cap: int = 100_000) -> list[tuple[str, str]]:
    """Distributed pass 1 (:func:`_type_table`), driver-side merge
    loop."""
    return bpe_train_local(_type_table(df, text_col, vocab_cap),
                           num_merges)


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


class CompiledBPE:
    """Merge list compiled for the vectorized batch encoder (r6, VERDICT
    r5 item 5): symbols interned to int ids, pairs to radix keys.

    ``sym2id`` covers every string appearing in the merges (left, right,
    merged); ``pair_left/right/rank/merged`` are parallel arrays the
    batch kernel radix-keys per batch (the radix base must count the
    batch's unknown symbols too, so keys are rebuilt per batch — an
    O(#merges log #merges) numpy sort, microseconds against the per-word
    work it replaces)."""

    def __init__(self, merges: list[tuple[str, str]]):
        import numpy as np
        sym2id: dict[str, int] = {}

        def intern(s: str) -> int:
            i = sym2id.get(s)
            if i is None:
                i = len(sym2id)
                sym2id[s] = i
            return i

        left, right, merged = [], [], []
        for a, b in merges:
            left.append(intern(a))
            right.append(intern(b))
            merged.append(intern(a + b))
        self.sym2id = sym2id
        self.id2sym = np.array(sorted(sym2id, key=sym2id.get),
                               dtype=object)
        self.pair_left = np.asarray(left, dtype=np.int64)
        self.pair_right = np.asarray(right, dtype=np.int64)
        self.pair_rank = np.arange(len(merges), dtype=np.int64)
        self.pair_merged = np.asarray(merged, dtype=np.int64)


def bpe_encode_words(words, compiled: CompiledBPE,
                     return_subwords: bool = False):
    """Vectorized rank-greedy BPE over a whole batch of words at once —
    the interpreted per-word loop (:func:`bpe_encode_word`) replaced by
    numpy passes over the concatenated symbol stream:

    * all words become one (symbol-id, word-id) stream; per round, every
      adjacent pair is radix-keyed and looked up via ``searchsorted``
      (C), the per-word minimum rank comes from ``minimum.reduceat``
      over the word boundaries, every occurrence of each word's best
      pair merges simultaneously (left-to-right non-overlap within runs
      by the parity rule — a run of equal selected pairs only happens
      for doubled symbols, where the scalar loop merges positions
      0, 2, 4 …), and the stream compacts.  Rounds are bounded by the
      deepest word, not summed over words.

    Returns ``counts`` (np.int64 subword count per word), plus the
    subword lists when ``return_subwords`` (differential tests pin them
    to the scalar twin).  Semantics are EXACTLY :func:`bpe_encode_word`
    per word."""
    import numpy as np
    import pandas as pd

    nw = len(words)
    if nw == 0:
        return (np.zeros(0, np.int64), []) if return_subwords \
            else np.zeros(0, np.int64)
    lens = np.fromiter(map(len, words), np.int64, nw)
    ends = np.cumsum(lens) - 1
    ne = ends[lens > 0]
    wid = np.repeat(np.arange(nw, dtype=np.int64), lens)
    # intern against the compiled table; batch-local ids for unknowns.
    # The char stream is interned via UTF-32 codepoints (one C decode +
    # np.unique + searchsorted — no object array, no factorize); only
    # the per-word END-fused last symbols touch Python, once per word.
    base = len(compiled.sym2id)
    unknown_syms: list[str] = []
    unk2id: dict[str, int] = {}

    def intern_sym(s: str) -> int:
        i = compiled.sym2id.get(s)
        if i is None:
            i = unk2id.get(s)
            if i is None:
                i = base + len(unknown_syms)
                unk2id[s] = i
                unknown_syms.append(s)
        return i

    concat = "".join(words)
    cps = np.frombuffer(concat.encode("utf-32-le"),
                        dtype=np.uint32).astype(np.int64)
    uniq = np.unique(cps)
    lut = np.fromiter((intern_sym(chr(cp)) for cp in uniq),
                      np.int64, len(uniq))
    ids = lut[np.searchsorted(uniq, cps)]
    last_syms = pd.Series([w[-1] + END for w in words if w], dtype=object)
    lcodes, luniq = pd.factorize(last_syms)
    llut = np.fromiter((intern_sym(u) for u in luniq),
                       np.int64, len(luniq))
    ids[ne] = llut[lcodes]
    n_unknown = len(unknown_syms)
    big = base + n_unknown + 1
    inf = np.iinfo(np.int64).max
    # pair lookup: dense direct-address tables when the key space is
    # small (rank/merged indexed by left*big+right — one fancy index,
    # no log factor), sorted-key searchsorted otherwise (50k-merge
    # vocabularies would need a multi-GB dense table)
    dense = big * big <= (1 << 22)
    if dense:
        drank = np.full(big * big, inf, dtype=np.int64)
        dmerged = np.full(big * big, -1, dtype=np.int64)
        dk = compiled.pair_left * big + compiled.pair_right
        # later (higher-rank) duplicates must not overwrite earlier
        # ones; pair lists are unique by construction, plain scatter
        drank[dk] = compiled.pair_rank
        dmerged[dk] = compiled.pair_merged
    else:
        table_keys = compiled.pair_left * big + compiled.pair_right
        order = np.argsort(table_keys, kind="stable")
        tkeys = table_keys[order]
        tranks = compiled.pair_rank[order]
        tmerged = compiled.pair_merged[order]

    def lookup(idx):
        """(rank, merged) for the pairs at symbol indices ``idx``
        (pair = (idx, idx+1)); inf/-1 on miss or word boundary."""
        r = np.full(len(idx), inf, dtype=np.int64)
        g = np.full(len(idx), -1, dtype=np.int64)
        if not len(compiled.pair_rank) or not len(idx):
            return r, g
        ok = idx < ids.size - 1
        ok[ok] = wid[idx[ok]] == wid[idx[ok] + 1]
        ii = idx[ok]
        keys = ids[ii] * big + ids[ii + 1]
        if dense:
            r[ok] = drank[keys]
            g[ok] = dmerged[keys]
            return r, g
        pos = np.minimum(np.searchsorted(tkeys, keys), len(tkeys) - 1)
        hit = tkeys[pos] == keys
        rr = np.full(len(ii), inf, dtype=np.int64)
        gg = np.full(len(ii), -1, dtype=np.int64)
        rr[hit] = tranks[pos[hit]]
        gg[hit] = tmerged[pos[hit]]
        r[ok] = rr
        g[ok] = gg
        return r, g

    # full lookup ONCE; afterwards only pairs adjacent to merge points
    # are re-keyed — lookups total O(stream + 2 * merges), not
    # O(stream * rounds).  Finished words RETIRE from the stream each
    # round (their min rank can never change), so the per-round O(N)
    # passes shrink with the active set, not the batch.
    out_counts = np.zeros(nw, dtype=np.int64)
    retired_ids: list = []
    retired_wid: list = []
    rank_ext, merged_ext = lookup(np.arange(ids.size, dtype=np.int64))
    while ids.size:
        starts = np.flatnonzero(np.r_[True, wid[1:] != wid[:-1]])
        counts = np.diff(np.r_[starts, ids.size])
        wmin = np.minimum.reduceat(rank_ext, starts)
        done = wmin == inf
        if done.any():
            dw = wid[starts[done]]
            out_counts[dw] = counts[done]
            sym_done = np.repeat(done, counts)
            retired_ids.append(ids[sym_done])
            retired_wid.append(wid[sym_done])
            if done.all():
                ids = ids[:0]
                break
            act = ~sym_done
            ids = ids[act]
            wid = wid[act]
            rank_ext = rank_ext[act]
            merged_ext = merged_ext[act]
            # retiring whole words never splits a surviving word, and a
            # surviving word's last pair slot stays a boundary (its
            # next symbol belongs to a different word before AND after)
            starts = np.flatnonzero(np.r_[True, wid[1:] != wid[:-1]])
            counts = np.diff(np.r_[starts, ids.size])
            wmin = wmin[~done]
        rep = np.repeat(wmin, counts)
        sel = rank_ext == rep
        # left-to-right non-overlap: keep parity-even offsets in each
        # run of consecutive selected pairs.  Runs never span words
        # (boundary pairs are never selected) and only happen for
        # doubled symbols — rare, so the accumulate pass is gated on an
        # actual adjacent selection existing.
        if (sel[1:] & sel[:-1]).any():
            c = np.arange(ids.size, dtype=np.int64)
            lf = np.maximum.accumulate(np.where(sel, np.int64(-1), c))
            sel &= ((c - (lf + 1)) % 2) == 0
        m = np.flatnonzero(sel)
        ids[m] = merged_ext[m]
        mask = np.ones(ids.size, dtype=bool)
        mask[m + 1] = False
        ids = ids[mask]
        wid = wid[mask]
        rank_ext = rank_ext[mask]
        merged_ext = merged_ext[mask]
        # new index of each merged symbol: one deletion happened before
        # the i-th merge point (selected pairs are >= 2 apart)
        mp = m - np.arange(len(m), dtype=np.int64)
        touch = np.unique(np.concatenate([mp - 1, mp]))
        touch = touch[touch >= 0]
        tr, tg = lookup(touch)
        rank_ext[touch] = tr
        merged_ext[touch] = tg
    if ids.size:  # exhausted by merging down to single symbols
        starts = np.flatnonzero(np.r_[True, wid[1:] != wid[:-1]])
        counts = np.diff(np.r_[starts, ids.size])
        out_counts[wid[starts]] = counts
        retired_ids.append(ids)
        retired_wid.append(wid)
    ids = np.concatenate(retired_ids) if retired_ids \
        else np.zeros(0, np.int64)
    wid = np.concatenate(retired_wid) if retired_wid \
        else np.zeros(0, np.int64)
    if not return_subwords:
        return out_counts
    all_syms = np.concatenate([compiled.id2sym,
                               np.array(unknown_syms, dtype=object)]) \
        if (len(compiled.id2sym) or unknown_syms) \
        else np.zeros(0, dtype=object)
    # retirement batches interleave words — regroup by word id (stable:
    # within-word symbol order is preserved)
    order2 = np.argsort(wid, kind="stable")
    strs = all_syms[ids[order2]] if ids.size else np.zeros(0, dtype=object)
    bounds = np.cumsum(out_counts)
    subwords = [list(strs[s:e])
                for s, e in zip(np.r_[0, bounds[:-1]], bounds)]
    return out_counts, subwords


# ---------------------------------------------------------------------------
# WordPiece tokenizer (BERT-style).  Public algorithm — Wu et al. 2016
# (GNMT §4.1) / Devlin et al. 2019; the merge criterion differs from BPE:
# pick the pair maximizing the likelihood score count(ab) /
# (count(a) * count(b)) rather than the raw pair count, and inference is
# greedy longest-match-first over the learned vocabulary (independent of
# merge order), with "##" marking word-internal continuations.  Same
# scale split as BPE/unigram: train on the capped type table driver-side,
# encode once per distinct TYPE in mapInPandas.
# ---------------------------------------------------------------------------

WP_CONT = "##"
WP_UNK = "[UNK]"


def _wp_syms(word: str) -> tuple[str, ...]:
    return (word[0],) + tuple(WP_CONT + c for c in word[1:])


def _wp_merge_token(a: str, b: str) -> str:
    return a + (b[len(WP_CONT):] if b.startswith(WP_CONT) else b)


def wordpiece_train_local(word_counts: dict[str, int],
                          vocab_size: int = 1000) -> list[str]:
    """Learn a WordPiece vocabulary: start from characters (+ their
    ``##`` continuation forms), repeatedly merge the adjacent pair with
    the highest likelihood score count(ab)/(count(a)*count(b)) (ties:
    higher pair count, then pair asc — deterministic) until
    ``vocab_size`` tokens exist or no pair occurs twice.  Returns the
    sorted vocabulary list.

    Incremental like :func:`bpe_train_local`: pair AND symbol counts
    are maintained through each merge via the pair -> words index (the
    score numerator and denominators both come from the live counters),
    so a round costs one scan of the pair table plus the touched words
    — not a full recount of the type table."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if not w:
            continue
        s = _wp_syms(w)
        vocab[s] = vocab.get(s, 0) + c
    pairs: Counter = Counter()
    syms: Counter = Counter()
    index: defaultdict[tuple[str, str], set] = defaultdict(set)

    def account(s: tuple[str, ...], c: int, sign: int) -> None:
        for t in s:
            syms[t] += sign * c
        for p, k in Counter(zip(s, s[1:])).items():
            pairs[p] += sign * k * c
            if sign > 0:
                index[p].add(s)
            else:
                index[p].discard(s)

    for s, c in vocab.items():
        account(s, c, +1)
    tokens_seen: set[str] = set()
    for s in vocab:
        tokens_seen.update(s)
    while len(tokens_seen) < vocab_size:
        best, best_key = None, None
        for p, c in pairs.items():
            if c < 2:
                continue
            score = c / (syms[p[0]] * syms[p[1]])
            key = (-score, -c, p)
            if best_key is None or key < best_key:
                best, best_key = p, key
        if best is None:
            break
        tokens_seen.add(_wp_merge_token(*best))
        for s in list(index[best]):
            c = vocab.pop(s)
            account(s, c, -1)
            m = _merge_wp(s, best)
            if m in vocab:
                account(m, vocab[m], -1)
                vocab[m] += c
            else:
                vocab[m] = c
            account(m, vocab[m], +1)
    return sorted(tokens_seen)


def wordpiece_train_naive(word_counts: dict[str, int],
                          vocab_size: int = 1000) -> list[str]:
    """Spec twin of :func:`wordpiece_train_local`: full pair + symbol
    recount every round.  Kept for differential tests — never delete
    the slow path."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if not w:
            continue
        s = _wp_syms(w)
        vocab[s] = vocab.get(s, 0) + c
    tokens_seen: set[str] = set()
    for s in vocab:
        tokens_seen.update(s)
    while len(tokens_seen) < vocab_size:
        pairs: Counter = Counter()
        syms: Counter = Counter()
        for s, c in vocab.items():
            for t in s:
                syms[t] += c
            for p in zip(s, s[1:]):
                pairs[p] += c
        best, best_key = None, None
        for p, c in pairs.items():
            if c < 2:
                continue
            score = c / (syms[p[0]] * syms[p[1]])
            key = (-score, -c, p)
            if best_key is None or key < best_key:
                best, best_key = p, key
        if best is None:
            break
        tokens_seen.add(_wp_merge_token(*best))
        vocab2: dict[tuple[str, ...], int] = {}
        for s, c in vocab.items():
            m = _merge_wp(s, best)
            vocab2[m] = vocab2.get(m, 0) + c
        vocab = vocab2
    return sorted(tokens_seen)


def _merge_wp(syms: tuple[str, ...], pair: tuple[str, str]
              ) -> tuple[str, ...]:
    a, b = pair
    out = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(_wp_merge_token(a, b))
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def wordpiece_encode_word(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match-first (the BERT WordPiece inference rule):
    take the longest vocabulary prefix, then continue with ``##``-forms;
    if no prefix matches at some position the whole word becomes
    ``[UNK]`` (the reference tokenizers do the same)."""
    out = []
    i = 0
    n = len(word)
    while i < n:
        prefix = WP_CONT if i > 0 else ""
        j = n
        piece = None
        while j > i:
            cand = prefix + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [WP_UNK]
        out.append(piece)
        i = j
    return out


def wordpiece_train(df: DataFrame, vocab_size: int = 1000,
                    text_col: str = "text",
                    vocab_cap: int = 100_000) -> list[str]:
    """Distributed pass 1 (:func:`_type_table`), driver-side merge
    loop."""
    return wordpiece_train_local(_type_table(df, text_col, vocab_cap),
                                 vocab_size)


def wordpiece_encode(df: DataFrame, vocab: list[str],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document WordPiece counts: (id, n_tokens, n_pieces, n_unk).
    Longest-match runs once per distinct TYPE; corpus stays JVM-side."""
    from collections.abc import Iterator

    import pandas as pd

    vset = set(vocab)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces = [wordpiece_encode_word(w, vset) for w in pdf["w"]]
            yield pd.DataFrame({
                "w": pdf["w"],
                "n_sub": [len(p) for p in pieces],
                "n_unk": [sum(1 for t in p if t == WP_UNK)
                          for p in pieces]}).astype({"n_sub": "int32",
                                                     "n_unk": "int32"})

    toks = df.select(F.col(id_col).cast("string").alias(id_col),
                     F.explode(tokens(F.col(text_col))).alias("w")) \
        .filter(F.col("w") != "")
    types = toks.select("w").distinct()
    encoded = types.mapInPandas(kernel, "w string, n_sub int, n_unk int")
    agg = (toks.join(encoded, "w")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.sum("n_sub").cast("long").alias("n_pieces"),
                F.sum("n_unk").cast("long").alias("n_unk")))
    ids = df.select(F.col(id_col).cast("string").alias(id_col))
    return (ids.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_pieces", F.lit(0)).alias("n_pieces"),
                    F.coalesce("n_unk", F.lit(0)).alias("n_unk")))


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style).  Public algorithm — Kudo
# 2018, "Subword Regularization" §3 / the SentencePiece unigram trainer:
# seed a large candidate-substring vocabulary, EM over each word's
# segmentation lattice (forward-backward expected piece counts), then
# iterative pruning of the least-useful pieces until the target size.
# Same scale split as BPE above: training collects only the CAPPED
# distinct-word frequency table; encoding runs Viterbi once per distinct
# TYPE inside mapInPandas and joins back — the corpus never crosses into
# Python.
# ---------------------------------------------------------------------------

_MAX_PIECE = 8          # candidate piece length cap (seed + lattices)
_UNK_PENALTY = 16.0     # extra nats for an out-of-vocab character


def _unigram_seed(word_counts: dict[str, int],
                  seed_size: int) -> dict[str, float]:
    """Candidate vocabulary: every substring up to ``_MAX_PIECE`` chars,
    kept = all single characters (segmentation must never fail) + the
    ``seed_size`` highest-count multi-char substrings (ties by string —
    deterministic)."""
    cnt: Counter = Counter()
    for w, c in word_counts.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + _MAX_PIECE, n) + 1):
                cnt[w[i:j]] += c
    singles = {s: float(c) for s, c in cnt.items() if len(s) == 1}
    multi = sorted((s for s in cnt if len(s) > 1),
                   key=lambda s: (-cnt[s], s))
    out = dict(singles)
    for s in multi[:max(0, seed_size - len(singles))]:
        out[s] = float(cnt[s])
    return out


def _normalize_logp(counts: dict[str, float]) -> dict[str, float]:
    import math
    total = sum(counts.values()) or 1.0
    return {s: math.log(c / total) for s, c in counts.items() if c > 0}


def _em_round(word_counts: dict[str, int],
              logp: dict[str, float]) -> tuple[dict[str, float], float]:
    """One full EM round: forward-backward over every word's lattice.
    Returns (expected piece counts, total corpus log-likelihood)."""
    import math
    neg = float("-inf")
    expected: defaultdict[str, float] = defaultdict(float)
    ll = 0.0
    for w, c in word_counts.items():
        n = len(w)
        if n == 0:
            continue
        alpha = [neg] * (n + 1)
        alpha[0] = 0.0
        for j in range(1, n + 1):
            a = neg
            for i in range(max(0, j - _MAX_PIECE), j):
                lp = logp.get(w[i:j])
                if lp is not None and alpha[i] != neg:
                    t = alpha[i] + lp
                    a = t if a == neg else (
                        max(a, t) + math.log1p(math.exp(-abs(a - t))))
            alpha[j] = a
        if alpha[n] == neg:     # unreachable word (no char coverage)
            continue
        beta = [neg] * (n + 1)
        beta[n] = 0.0
        for i in range(n - 1, -1, -1):
            b = neg
            for j in range(i + 1, min(i + _MAX_PIECE, n) + 1):
                lp = logp.get(w[i:j])
                if lp is not None and beta[j] != neg:
                    t = lp + beta[j]
                    b = t if b == neg else (
                        max(b, t) + math.log1p(math.exp(-abs(b - t))))
            beta[i] = b
        z = alpha[n]
        ll += c * z
        for i in range(n):
            if alpha[i] == neg:
                continue
            for j in range(i + 1, min(i + _MAX_PIECE, n) + 1):
                lp = logp.get(w[i:j])
                if lp is not None and beta[j] != neg:
                    expected[w[i:j]] += c * math.exp(
                        alpha[i] + lp + beta[j] - z)
    return dict(expected), ll


def unigram_train_local(word_counts: dict[str, int],
                        vocab_size: int = 1000,
                        seed_size: int = 8000,
                        em_rounds: int = 2,
                        shrink: float = 0.75) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary from a word-frequency table.
    Alternates ``em_rounds`` of full EM with pruning the multi-char
    pieces of lowest expected count (keep-fraction ``shrink``) until at
    most ``vocab_size`` pieces remain; single characters are never
    pruned.  Returns the final piece -> log-probability model."""
    counts = {w: c for w, c in word_counts.items() if w}
    logp = _normalize_logp(_unigram_seed(counts, seed_size))
    while True:
        for _ in range(em_rounds):
            expected, _ll = _em_round(counts, logp)
            # chars stay in the model even at zero expectation (coverage)
            for s in logp:
                if len(s) == 1:
                    expected.setdefault(s, 1e-6)
                    expected[s] = max(expected[s], 1e-6)
            logp = _normalize_logp(expected)
        if len(logp) <= vocab_size:
            return logp
        singles = [s for s in logp if len(s) == 1]
        multi = sorted((s for s in logp if len(s) > 1),
                       key=lambda s: (-logp[s], s))
        keep = max(len(multi) and int(len(multi) * shrink),
                   vocab_size - len(singles))
        keep = max(keep, 0)
        if keep >= len(multi):        # cannot shrink further
            return logp
        import math
        logp = _normalize_logp(
            {s: math.exp(logp[s]) for s in singles + multi[:keep]})


def unigram_encode_word(word: str, logp: dict[str, float]) -> list[str]:
    """Viterbi segmentation under the unigram model: maximize the sum of
    piece log-probs.  Out-of-vocab characters score ``min(logp) -
    _UNK_PENALTY`` so segmentation never fails.  Ties resolve to the
    longest last piece (smallest split point first) — deterministic."""
    n = len(word)
    if n == 0:
        return []
    floor = (min(logp.values()) if logp else 0.0) - _UNK_PENALTY
    neg = float("-inf")
    best = [neg] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - _MAX_PIECE), j):
            if best[i] == neg:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = floor
            score = best[i] + lp
            if score > best[j]:
                best[j], back[j] = score, i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def unigram_encode_word_brute(word: str,
                              logp: dict[str, float]) -> list[str]:
    """Exhaustive twin of :func:`unigram_encode_word`: enumerate every
    segmentation (words in tests are short), same scoring and the same
    tie rule.  Kept for differential tests — never delete the slow
    path."""
    floor = (min(logp.values()) if logp else 0.0) - _UNK_PENALTY

    def score(seg: tuple[str, ...]) -> float:
        s = 0.0
        for p in seg:
            lp = logp.get(p)
            if lp is None:
                if len(p) > 1:
                    return float("-inf")
                lp = floor
            s += lp
        return s

    def segs(w: str):
        if not w:
            yield ()
            return
        for k in range(1, min(_MAX_PIECE, len(w)) + 1):
            for rest in segs(w[k:]):
                yield (w[:k],) + rest

    best_seg, best_s = None, float("-inf")
    for seg in segs(word):
        s = score(seg)
        # Viterbi tie rule: longest last piece wins, then recursively —
        # enumeration order (longer tail pieces later) makes ">=" match
        if s > best_s or (s == best_s and best_seg is not None
                          and len(seg[-1]) > len(best_seg[-1])):
            best_seg, best_s = seg, s
    return list(best_seg or ())


def unigram_train(df: DataFrame, vocab_size: int = 1000,
                  text_col: str = "text",
                  vocab_cap: int = 100_000) -> dict[str, float]:
    """Distributed pass 1 (:func:`_type_table`), driver-side EM."""
    return unigram_train_local(_type_table(df, text_col, vocab_cap),
                               vocab_size)


def unigram_encode(df: DataFrame, model: dict[str, float],
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document piece count under the trained unigram model:
    (id, n_tokens, n_pieces).  Viterbi runs once per distinct TYPE
    (mapInPandas); corpus-sized frames stay JVM-side — the same plan
    shape as :func:`bpe_encode`."""
    from collections.abc import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "w": pdf["w"],
                "n_sub": [len(unigram_encode_word(w, model))
                          for w in pdf["w"]]}).astype({"n_sub": "int32"})

    toks = df.select(F.col(id_col).cast("string").alias(id_col),
                     F.explode(tokens(F.col(text_col))).alias("w")) \
        .filter(F.col("w") != "")
    types = toks.select("w").distinct()
    encoded = types.mapInPandas(kernel, "w string, n_sub int")
    agg = (toks.join(encoded, "w")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.sum("n_sub").cast("long").alias("n_pieces")))
    ids = df.select(F.col(id_col).cast("string").alias(id_col))
    return (ids.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_pieces", F.lit(0)).alias("n_pieces")))


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document token count under the trained subword vocabulary:
    (id, n_tokens, n_subwords).  The merge loop runs once per distinct
    TYPE (mapInPandas over the distinct-word frame — the VECTORIZED
    batch encoder since r6, ~10x the interpreted per-word loop on a
    50k-type table, BENCH.md); the corpus-sized frames stay JVM-side
    (explode, equality join on the word, map-side combined per-doc
    aggregate)."""
    from collections.abc import Iterator

    import pandas as pd

    compiled = CompiledBPE(merges)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = bpe_encode_words(list(pdf["w"]), compiled)
            yield pd.DataFrame({"w": pdf["w"],
                                "n_sub": counts.astype("int32")})

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
