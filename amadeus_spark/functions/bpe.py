"""Distributed BPE merge learning — tokenizer TRAINING on the corpus.

Public method: byte-pair encoding for subword vocabularies (Sennrich et
al. 2016; the fastBPE/SentencePiece pre-processing shape). The scale
insight every fast implementation uses: BPE statistics depend only on
the DISTINCT-WORD frequency table, not the corpus — one corpus-wide
``groupBy(word).count()`` shuffle reduces 100 TB of text to a
words-table of a few million rows, and every learning round after that
runs on that small frame.

Batched-greedy variant: classic BPE merges ONE pair per round (k merges
= k global aggregations). Here each round counts all adjacent pairs
once and applies the top ``batch`` SYMBOL-DISJOINT pairs (pairs sharing
a symbol with a higher-ranked pick defer to a later round — disjoint
merges commute, so the batch application is order-independent and
deterministic). k merges cost ceil(k/batch) shuffles. The test pins the
result against a pure-Python reimplementation of the same rule.

Per-round plan: explode adjacent symbol pairs weighted by word count →
one groupBy(pair) sum → top-(overfetch) collect (bounded: batch*4 rows)
→ greedy disjoint pick on the driver → merge application via an
Arrow-batched mapInPandas over the words frame (string scan per word —
Python is fine here: the frame is distinct words, not the corpus) →
localCheckpoint to truncate the growing lineage (the
connected_components lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (classic BPE); any string absent from the data
END = "</w>"


def _apply_merges_py(syms: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Apply symbol-disjoint merges left-to-right, non-overlapping —
    the single shared rule (operator and test reference both call it)."""
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 32,
    batch: int = 8,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(rank, left_symbol, right_symbol, pair_frequency), ...] in learn
    order — rank is global (continues across rounds), frequency is the
    pair's weighted count at the time it was learned."""
    import pandas as pd

    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.expr(f"array_append(split(w, ''), '{END}')").alias("syms"), "c"
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        pairs = (
            words.select(
                # guard: Spark's sequence(1, 0) is DESCENDING [1, 0] — a
                # fully-merged single-symbol word must yield [] (the
                # CLAUDE.md iron-rule-5-adjacent trap, bigram precedent)
                F.explode(
                    F.expr(
                        "case when size(syms) >= 2 then"
                        " transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i-1] AS a, syms[i] AS b))"
                        " else array() end"
                    )
                ).alias("p"),
                "c",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("n"))
        )
        # overfetch so enough disjoint pairs survive the greedy filter
        top = pairs.orderBy(F.desc("n"), "a", "b").limit(batch * 4).collect()
        used: set[str] = set()
        round_merges: list[tuple[str, str]] = []
        for r in top:
            if len(round_merges) >= batch:
                break
            a, b, n = r["a"], r["b"], r["n"]
            if a in used or b in used or (a + b) in used:
                continue
            used.update((a, b, a + b))
            round_merges.append((a, b))
            merges.append((len(merges) + 1, a, b, int(n)))
        if not round_merges:
            break  # no pairs left (degenerate tiny corpus)

        def _apply(batches, _m=tuple(round_merges)):
            for pdf in batches:
                pdf["syms"] = pdf["syms"].map(
                    lambda s: _apply_merges_py(list(s), list(_m))
                )
                yield pdf

        words = words.mapInPandas(
            _apply, schema="syms array<string>, c long"
        ).localCheckpoint()
    return merges[:n_merges]


def bpe_merge_frame(spark, docs: DataFrame, n_merges: int = 32, batch: int = 8):
    """learn_bpe_merges as a DataFrame (the registerable query shape):
    (rank BIGINT, left STRING, right STRING, freq BIGINT)."""
    rows = learn_bpe_merges(docs, n_merges, batch)
    return spark.createDataFrame(
        rows, "rank long, left string, right string, freq long"
    ).orderBy("rank")


def encode_subword_stats(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    top_n: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with LEARNED merges and report the top-N
    subwords — the apply half of the BPE loop. Merges apply in learn
    order (order matters across rounds: a later merge may consume a
    symbol an earlier one built), via the same _apply_merges_py rule
    the learner and the test reference use.

    Scale: the distinct-word table is the only frame that runs Python
    (one mapInPandas over words, not the corpus); corpus frequencies
    ride along as the count column; top-N via TakeOrderedAndProject.
    Output: (subword STRING, n_words BIGINT, freq BIGINT)."""
    ordered = [(a, b) for _, a, b, _ in sorted(merges)]

    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.expr(f"array_append(split(w, ''), '{END}')").alias("syms"), "c"
        )
    )

    def _apply(batches, _m=tuple(ordered)):
        for pdf in batches:
            pdf["syms"] = pdf["syms"].map(
                lambda s: _apply_merges_py(list(s), list(_m))
            )
            yield pdf

    encoded = words.mapInPandas(_apply, schema="syms array<string>, c long")
    return (
        encoded.select(F.explode("syms").alias("subword"), "c")
        .groupBy("subword")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("c").cast("long").alias("freq"),
        )
        .orderBy(F.desc("freq"), "subword")
        .limit(top_n)
    )
