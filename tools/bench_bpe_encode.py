"""50k-type BPE encode micro-bench (VERDICT r5 item 5 'done' evidence):
the interpreted per-word rank-greedy loop vs the vectorized batch
encoder (operators/tokenizer.bpe_encode_words).  Pure-Python timing, no
Spark; prints one JSON line.  Append the result to BENCH.md's preserved
section when kernels change."""

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas  # noqa: F401  (pre-import so timing excludes module load)

from warc2text_spark.operators.tokenizer import (CompiledBPE,
                                                 bpe_encode_word,
                                                 bpe_encode_words,
                                                 bpe_train_local)


def main() -> None:
    rng = random.Random(42)
    corpus: dict[str, int] = {}
    for _ in range(3000):
        w = "".join(rng.choice("abcdefgh")
                    for _ in range(rng.randint(1, 12)))
        corpus[w] = corpus.get(w, 0) + rng.randint(1, 50)
    merges = bpe_train_local(corpus, 500)
    ranks = {p: i for i, p in enumerate(merges)}
    comp = CompiledBPE(merges)
    types = list({"".join(rng.choice("abcdefgh")
                          for _ in range(rng.randint(2, 14)))
                  for _ in range(60000)})[:50000]
    bpe_encode_words(types[:100], comp)  # warm
    t_loop = min(_time(lambda: [len(bpe_encode_word(w, ranks))
                                for w in types])
                 for _ in range(2))
    ref = [len(bpe_encode_word(w, ranks)) for w in types]
    out = None

    def vec():
        nonlocal out
        out = bpe_encode_words(types, comp)

    t_vec = min(_time(vec) for _ in range(3))
    assert list(out) == ref, "vectorized encoder diverged"
    print(json.dumps({
        "metric": "bpe_encode_50k_types",
        "n_types": len(types), "n_merges": len(merges),
        "loop_sec": round(t_loop, 3), "vectorized_sec": round(t_vec, 3),
        "speedup": round(t_loop / t_vec, 2),
        "types_per_sec_vectorized": int(len(types) / t_vec)}))


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
