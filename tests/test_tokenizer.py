"""BPE tokenizer: trainer twins, encode twins, Spark encode parity."""

import random

from warc2text_spark.operators.tokenizer import (
    END, bpe_encode, bpe_encode_word, bpe_encode_word_sequential,
    bpe_train, bpe_train_local, bpe_train_naive)


def _random_counts(rng, n_words):
    alpha = "abcdef"
    return {"".join(rng.choice(alpha)
                    for _ in range(rng.randint(1, 7))): rng.randint(1, 9)
            for _ in range(n_words)}


def test_trainer_incremental_matches_naive_recount():
    rng = random.Random(41)
    for trial in range(25):
        wc = _random_counts(rng, rng.randint(1, 40))
        nm = rng.randint(1, 30)
        assert bpe_train_local(wc, nm) == bpe_train_naive(wc, nm), wc


def test_sennrich_style_first_merges():
    # newest/widest dominate: ('e','s') and ('s','t</w>') tie at 9,
    # the asc tie-break picks ('e','s'); then ('es','t</w>') at 9
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_naive(wc, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + END)
    assert bpe_train_local(wc, 4) == merges


def test_encode_roundtrip_and_twin_parity():
    rng = random.Random(43)
    wc = _random_counts(rng, 60)
    merges = bpe_train_local(wc, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    seen = list(wc) + ["zzz", "a", "fedcba", "abecedab"]
    for w in seen:
        fast = bpe_encode_word(w, ranks)
        slow = bpe_encode_word_sequential(w, merges)
        assert fast == slow, (w, fast, slow)
        assert "".join(fast) == w + END
    # more merges never increases the subword count
    fewer = {p: i for i, p in enumerate(merges[:10])}
    for w in seen:
        assert len(bpe_encode_word(w, ranks)) \
            <= len(bpe_encode_word(w, fewer))


def test_spark_train_and_encode_match_local(spark):
    rows = [("1", "the cat sat on the mat"),
            ("2", "the cats sat"),
            ("3", "on and on and on"),
            ("4", "mat mat mat the")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    merges = bpe_train(df, num_merges=12)
    # trainer parity with a locally-built count table
    wc = {}
    for _, t in rows:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1
    assert merges == bpe_train_local(wc, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    for did, t in rows:
        ws = t.split(" ")
        assert out[did].n_tokens == len(ws)
        assert out[did].n_subwords == sum(
            len(bpe_encode_word(w, ranks)) for w in ws)
    # first merge agrees with the iteration-0 pair-count surface
    from warc2text_spark.operators.textops import bpe_pair_counts
    top = bpe_pair_counts(df, k=1).collect()[0].pair
    assert top == f"{merges[0][0]} {merges[0][1]}"


def test_encode_keeps_empty_documents(spark):
    rows = [("1", "a b"), ("2", ""), ("3", "   ")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in bpe_encode(df, []).collect()}
    assert set(out) == {"1", "2", "3"}
    assert out["2"].n_tokens == 0 and out["2"].n_subwords == 0
    assert out["3"].n_tokens == 0 and out["3"].n_subwords == 0
    assert out["1"].n_tokens == 2


def test_vectorized_batch_encoder_matches_scalar_twins():
    """bpe_encode_words (the r6 numpy batch encoder behind bpe_encode)
    produces EXACTLY bpe_encode_word's segmentation for every word —
    including doubled-symbol runs (the left-to-right parity case),
    unknown characters, unicode, empties, and words that merge down to
    a single symbol."""
    import random

    from warc2text_spark.operators.tokenizer import (CompiledBPE,
                                                     bpe_encode_word,
                                                     bpe_encode_words,
                                                     bpe_train_local)
    rng = random.Random(7)
    corpus = {}
    for _ in range(800):
        w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 10)))
        corpus[w] = corpus.get(w, 0) + rng.randint(1, 20)
    merges = bpe_train_local(corpus, 300)
    ranks = {p: i for i, p in enumerate(merges)}
    comp = CompiledBPE(merges)
    cases = (list(corpus)[:300]
             + ["", "a", "aa", "aaa", "aaaa", "aaaaa", "ababab",
                "zzzz", "héllo", "日本語", "𝔘ni", "xqx"]
             + ["".join(rng.choice("abcdexzé") for _ in range(rng.randint(0, 12)))
                for _ in range(800)])
    counts, subs = bpe_encode_words(cases, comp, return_subwords=True)
    for w, c, s in zip(cases, counts, subs):
        ref = bpe_encode_word(w, ranks)
        assert list(s) == ref, (w, list(s), ref)
        assert c == len(ref)
    # empty merge list: every word stays as characters
    comp0 = CompiledBPE([])
    c0, s0 = bpe_encode_words(["abc", ""], comp0, return_subwords=True)
    assert list(c0) == [3, 0] and s0[0] == ["a", "b", "c</w>"]


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style, Kudo 2018)
# ---------------------------------------------------------------------------

def test_unigram_train_basics():
    from warc2text_spark.operators.tokenizer import unigram_train_local
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "west": 4}
    model = unigram_train_local(wc, vocab_size=20, seed_size=40)
    import math
    # a proper distribution in log space
    assert abs(sum(math.exp(p) for p in model.values()) - 1.0) < 1e-6
    # every character of the corpus survives pruning (coverage invariant)
    chars = {c for w in wc for c in w}
    assert chars <= {s for s in model if len(s) == 1}
    # the dominant shared substring is kept as a multi-char piece
    assert any(len(s) > 1 and "est" in s or s == "est" for s in model)
    assert len(model) <= 20 or all(len(s) == 1 for s in model)


def test_unigram_viterbi_matches_bruteforce():
    import random as _r
    from warc2text_spark.operators.tokenizer import (
        unigram_encode_word, unigram_encode_word_brute,
        unigram_train_local)
    rng = _r.Random(47)
    wc = _random_counts(rng, 50)
    model = unigram_train_local(wc, vocab_size=60, seed_size=200)
    for w in list(wc)[:30] + ["zzz", "a", "", "fedcba", "xqxq"]:
        fast = unigram_encode_word(w, model)
        slow = unigram_encode_word_brute(w, model)
        assert "".join(fast) == w
        # same optimal score (tie rules may differ only at equal score)
        def score(seg):
            floor = min(model.values()) - 16.0
            return sum(model.get(p, floor) for p in seg)
        assert abs(score(fast) - score(slow)) < 1e-9, (w, fast, slow)


def test_unigram_oov_chars_never_fail():
    from warc2text_spark.operators.tokenizer import unigram_encode_word
    model = {"a": -1.0, "b": -2.0, "ab": -1.5}
    assert unigram_encode_word("aXb", model) == ["a", "X", "b"]
    assert unigram_encode_word("ab", model) == ["ab"]
    assert unigram_encode_word("", model) == []


def test_unigram_spark_encode_matches_local(spark):
    from warc2text_spark.operators.tokenizer import (
        unigram_encode, unigram_encode_word, unigram_train)
    rows = [("1", "the cat sat on the mat"),
            ("2", "the cats sat"),
            ("3", ""),
            ("4", "mat mat mat the")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    model = unigram_train(df, vocab_size=40)
    out = {r.doc_id: r for r in unigram_encode(df, model).collect()}
    assert set(out) == {"1", "2", "3", "4"}          # empty doc kept
    assert (out["3"].n_tokens, out["3"].n_pieces) == (0, 0)
    for doc_id, text in rows:
        words = [w for w in text.split() if w]
        exp = sum(len(unigram_encode_word(w, model)) for w in words)
        assert out[doc_id].n_tokens == len(words)
        assert out[doc_id].n_pieces == exp, (doc_id, text)


# ---------------------------------------------------------------------------
# WordPiece tokenizer (BERT-style, Wu et al. 2016 likelihood merges)
# ---------------------------------------------------------------------------

def test_wordpiece_likelihood_merge_differs_from_bpe():
    from warc2text_spark.operators.tokenizer import (wordpiece_train_local,
                                                     bpe_train_naive)
    # 'xy' is the most FREQUENT pair but x and y are each very common;
    # 'qz' is rarer but its parts occur nowhere else, so the likelihood
    # score c(ab)/(c(a)c(b)) prefers it while BPE's raw count picks xy
    wc = {"xy": 10, "xa": 8, "yb": 8, "qz": 4}
    vocab = wordpiece_train_local(wc, vocab_size=8)  # 7 chars + 1 merge
    assert "qz" in vocab                       # likelihood winner merged
    merges = bpe_train_naive(wc, 1)
    assert merges[0] == ("x", "y" + END)       # raw-count winner differs


def test_wordpiece_vocab_and_encode_roundtrip():
    from warc2text_spark.operators.tokenizer import (WP_UNK,
                                                     wordpiece_encode_word,
                                                     wordpiece_train_local)
    wc = {"low": 5, "lower": 2, "lowest": 6, "newer": 3, "wider": 3}
    vocab = set(wordpiece_train_local(wc, vocab_size=30))
    for w in wc:
        pieces = wordpiece_encode_word(w, vocab)
        assert pieces and WP_UNK not in pieces
        rebuilt = pieces[0] + "".join(p[2:] for p in pieces[1:])
        assert rebuilt == w, (w, pieces)
    # longest-match-first: a word fully in vocab is one piece
    assert any(len(wordpiece_encode_word(w, vocab)) == 1 for w in wc)
    # unknown character anywhere -> [UNK] for the whole word
    assert wordpiece_encode_word("low!", vocab) == [WP_UNK] or \
        "!" not in "".join(vocab)
    assert wordpiece_encode_word("é", vocab) == [WP_UNK]


def test_wordpiece_greedy_is_longest_match():
    from warc2text_spark.operators.tokenizer import wordpiece_encode_word
    vocab = {"a", "ab", "abc", "##d", "##cd", "b", "##b", "##c"}
    # longest prefix 'abc' wins over 'ab'+'##c...'
    assert wordpiece_encode_word("abcd", vocab) == ["abc", "##d"]
    assert wordpiece_encode_word("abd", vocab) == ["ab", "##d"]


def test_wordpiece_spark_encode_matches_local(spark):
    from warc2text_spark.operators.tokenizer import (wordpiece_encode,
                                                     wordpiece_encode_word,
                                                     wordpiece_train)
    rows = [("1", "the cat sat on the mat"),
            ("2", "the cats sat"),
            ("3", ""),
            ("4", "zebra zebra qqq")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    vocab = wordpiece_train(df, vocab_size=60)
    vset = set(vocab)
    out = {r.doc_id: r for r in wordpiece_encode(df, vocab).collect()}
    assert set(out) == {"1", "2", "3", "4"}
    assert (out["3"].n_tokens, out["3"].n_pieces, out["3"].n_unk) == (0, 0, 0)
    for doc_id, text in rows:
        words = [w for w in text.split() if w]
        pieces = [wordpiece_encode_word(w, vset) for w in words]
        assert out[doc_id].n_tokens == len(words)
        assert out[doc_id].n_pieces == sum(len(p) for p in pieces)


def test_wordpiece_incremental_matches_naive_recount():
    from warc2text_spark.operators.tokenizer import (wordpiece_train_local,
                                                     wordpiece_train_naive)
    rng = random.Random(53)
    for _ in range(20):
        wc = _random_counts(rng, rng.randint(1, 40))
        vs = rng.randint(1, 40)
        assert wordpiece_train_local(wc, vs) == \
            wordpiece_train_naive(wc, vs), (wc, vs)
