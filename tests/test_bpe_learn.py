"""BPE merge learning pinned against a pure-Python reimplementation of
the identical batched-greedy rule on the identical word counts."""

from __future__ import annotations

import os
from collections import Counter

from tests.conftest import SF_SMOKE


def _python_bpe(word_counts: dict[str, int], n_merges: int, batch: int):
    from amadeus_spark.functions.bpe import END, _apply_merges_py

    vocab = [(list(w) + [END], c) for w, c in word_counts.items()]
    merges = []
    while len(merges) < n_merges:
        pc: Counter = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[: batch * 4]
        used: set = set()
        round_merges = []
        for (a, b), n in top:
            if len(round_merges) >= batch:
                break
            if a in used or b in used or (a + b) in used:
                continue
            used.update((a, b, a + b))
            round_merges.append((a, b))
            merges.append((len(merges) + 1, a, b, n))
        if not round_merges:
            break
        vocab = [(_apply_merges_py(s, round_merges), c) for s, c in vocab]
    return merges[:n_merges]


def test_bpe_matches_python_reference(spark):
    from amadeus_spark.functions import bpe

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    got = bpe.learn_bpe_merges(docs, n_merges=16, batch=8)

    counts: Counter = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].split(" "):
            if w:
                counts[w] += 1
    want = _python_bpe(dict(counts), 16, 8)
    assert got == want, (got[:4], want[:4])


def test_bpe_merges_are_applied_transitively(spark):
    """Later merges must build ON earlier merged symbols (multi-char
    left/right sides appear once enough rounds pass on a corpus with
    strong digraphs) — the property that distinguishes real BPE from a
    one-shot pair count."""
    rows = [(("low " * 8 + "lower " * 6 + "lowest " * 4).strip(),)] * 20
    df = spark.createDataFrame(rows, "text string")
    merges = bpe.learn_bpe_merges(df, n_merges=12, batch=2)
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _ in merges), merges


from amadeus_spark.functions import bpe  # noqa: E402  (used in test 2)


def test_bpe_encode_matches_python_reference(spark):
    """Applying the learned merges distributes: the top-subword stats
    must equal the pure-Python tokenize-and-count on the same corpus."""
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    merges = bpe.learn_bpe_merges(docs, n_merges=16, batch=8)
    got = [
        (r["subword"], r["n_words"], r["freq"])
        for r in bpe.encode_subword_stats(docs, merges, top_n=20).collect()
    ]

    from amadeus_spark.functions.bpe import END, _apply_merges_py

    counts: Counter = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].split(" "):
            if w:
                counts[w] += 1
    ordered = [(a, b) for _, a, b, _ in sorted(merges)]
    # n_words counts SYMBOL OCCURRENCE ROWS over distinct words (a word
    # containing a subword twice contributes twice); freq weights by
    # corpus word count — mirror both
    sub_words: Counter = Counter()
    sub_freq: Counter = Counter()
    for w, c in counts.items():
        for s in _apply_merges_py(list(w) + [END], ordered):
            sub_freq[s] += c
            sub_words[s] += 1
    want = sorted(
        ((s, sub_words[s], sub_freq[s]) for s in sub_freq),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    assert got == want
