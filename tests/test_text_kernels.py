"""Cross-engine parity for the BPE-ish tokenizer and rolling-hash
fingerprint on adversarial strings — the regex must behave identically
under Java regex (Spark) and RE2 (DuckDB), and the fold must agree
despite the engines' different reduce seeding (list_reduce seeds with
the first element; Spark's aggregate seeds 0)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from amadeus_spark.functions import text
from tests.conftest import SF_ORACLE

ADVERSARIAL = [
    "",
    " ",
    "   \t  ",
    "hello",
    "hello world",
    "world hello",  # order flip must change the rolling fp
    "hello hello",  # repetition must change it vs single
    "it's don't we're I'll you've I'm he'd",
    "12345678901234567890",
    "a1b2c3 !!! ??? ...",
    "CamelCase snake_case kebab-case",
    "unicode: héllo wörld 你好",
    "'s 't 're standalone contractions",
    "ends with space ",
    " starts with space",
]


def test_bpe_and_rolling_fp_cross_engine(spark, duck):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)], "id long, text string")
    got = {
        r.id: (r.bpe, r.fp)
        for r in df.select(
            "id",
            text.bpe_token_count(F.col("text")).alias("bpe"),
            F.expr("filter(split(text, ' '), x -> x != '')").alias("__toks"),
        )
        .select("id", "bpe", text.rolling_fingerprint("__toks").alias("fp"))
        .collect()
    }
    for i, s in enumerate(ADVERSARIAL):
        lit = "'" + s.replace("'", "''") + "'"
        bpe, fp = duck.sql(
            f"SELECT {text.bpe_token_count_sql(lit)},"
            f" {text.rolling_fingerprint_sql(lit)}"
        ).fetchone()
        assert (got[i][0], got[i][1]) == (bpe, fp), (i, s, got[i], (bpe, fp))


def test_rolling_fp_is_order_and_multiplicity_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c a b c"), (4, "")],
        "id long, text string",
    )
    fps = {
        r.id: r.fp
        for r in df.select(
            "id", F.expr("filter(split(text, ' '), x -> x != '')").alias("__toks")
        )
        .select("id", text.rolling_fingerprint("__toks").alias("fp"))
        .collect()
    }
    assert len({fps[1], fps[2], fps[3]}) == 3  # order and repetition matter
    assert fps[4] == 0  # empty doc folds to the seed


def test_pii_redaction(spark):
    """redact_pii removes every planted surface form and leaves clean
    text untouched; both dialects rewrite identically (the gate query
    checks aggregate parity — this pins the row-level rewrite)."""
    import duckdb

    from amadeus_spark.functions import text as tm
    from pyspark.sql import functions as F

    rows = [
        (1, "contact me at alice.smith+spam@mail-host.co for details"),
        (2, "call +1-555-123-4567 or 44. 555 123 9999 now"),
        (3, "server at 192.168.1.254 responded"),
        (4, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    got = {r.id: r.red for r in df.select("id", tm.redact_pii(F.col("text")).alias("red")).collect()}
    assert "alice" not in got[1] and "<PII>" in got[1]
    assert "555" not in got[2]
    assert "192.168" not in got[3] and "<PII>" in got[3]
    assert got[4] == "no pii here at all"

    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    duck = dict(
        con.sql(
            f"SELECT id, {tm.redact_pii_sql('text')} FROM (VALUES {vals}) v(id, text)"
        ).fetchall()
    )
    assert duck == got


def test_line_dedup_semantics(spark):
    """Pinned rules: trimmed-key matching (padded boilerplate still
    dedups), whitespace-only lines never removed, all-boilerplate doc
    reassembles to the empty string, original line order preserved."""
    import hashlib

    from amadeus_spark.functions import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "unique alpha\nfooter line\nunique beta"),
            (2, "  footer line \nunique gamma\n   "),
            (3, "footer line"),  # all-boilerplate doc -> cleaned == ''
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.cleaned_md5)
        for r in dd.line_dedup_stats(docs, min_docs=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1] == (3, 1, md5("unique alpha\nunique beta"))
    # padded variant dedups via trim; whitespace-only line is KEPT verbatim
    assert got[2] == (3, 1, md5("unique gamma\n   "))
    assert got[3] == (1, 1, md5(""))


def test_duplicated_span_semantics(spark):
    """Pinned rules for the substring-dedup stats: overlapping duplicated
    shingles UNION into one span (never double-counted), spans clamp at
    the doc end, short docs (< k tokens) count whole-doc duplication via
    their single short shingle, and a doc with no cross-doc shingle is
    unflagged."""
    from amadeus_spark.functions import dedup as dd

    docs = spark.createDataFrame(
        [
            # docs 1/2 share "a b c d": starts at p=1,2 (k=3) must union
            # to 4 covered tokens in each, not 6
            (1, "en", "a b c d e f"),
            (2, "en", "x y a b c d"),
            (3, "en", "totally unique text here"),
            (4, "de", "tiny doc"),  # 2 tokens, 1 short shingle
            (5, "de", "tiny doc"),  # exact short dup -> both fully covered
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r["lang"]: (
            r["n_docs"],
            r["total_tokens"],
            r["n_docs_flagged"],
            r["dup_tokens"],
        )
        for r in dd.duplicated_span_stats(docs, k=3).collect()
    }
    assert got["en"] == (3, 16, 2, 8)  # 4 covered tokens in each of docs 1,2
    assert got["de"] == (2, 4, 2, 4)  # whole-doc dup at n < k


def test_duplicated_span_matches_bruteforce(spark):
    """Randomized cross-check of the closed-form interval union against
    a brute-force covered-position set, over 60 random small-alphabet
    docs (dense shingle collisions — the adversarial regime for the
    lag arithmetic)."""
    import random

    from amadeus_spark.functions import dedup as dd

    k = 3
    rng = random.Random(99)
    docs = [
        (
            i,
            "xx" if i % 2 else "yy",
            " ".join(rng.choice("ab") for _ in range(rng.randint(1, 12))),
        )
        for i in range(60)
    ]

    # brute force: positions covered by any shingle shared with another doc
    toks = {i: t.split() for i, _, t in docs}
    def starts(ts):
        return list(range(max(len(ts) - k + 1, 1)))
    owners: dict[str, set[int]] = {}
    for i, _, _ in docs:
        for p in starts(toks[i]):
            owners.setdefault(" ".join(toks[i][p : p + k]), set()).add(i)
    want = {}
    for i, lang, _ in docs:
        covered: set[int] = set()
        for p in starts(toks[i]):
            if len(owners[" ".join(toks[i][p : p + k])]) >= 2:
                covered.update(
                    range(p, min(p + k, max(len(toks[i]), p + 1)))
                )
        a = want.setdefault(lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(toks[i])
        a[2] += 1 if covered else 0
        a[3] += len(covered)

    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {
        r["lang"]: [
            r["n_docs"], r["total_tokens"], r["n_docs_flagged"], r["dup_tokens"]
        ]
        for r in dd.duplicated_span_stats(df, k=k).collect()
    }
    assert got == want


def test_bigram_surprisal_semantics(spark):
    """Pinned rules: a doc whose every continuation is deterministic
    under the corpus model scores exactly 1.0 (c1 == c2 for each of its
    bigrams); a doc using a rarer continuation of a shared prefix scores
    higher; docs with < 2 tokens drop out entirely."""
    from amadeus_spark.functions import text as tx

    docs = spark.createDataFrame(
        [
            # 'a b' x3 and 'a c' x1 share the prefix 'a' (c1=4):
            (1, "a b", "en"),
            (2, "a b", "en"),
            (3, "a b", "en"),
            (4, "a c", "en"),
            (5, "solo", "en"),  # 1 token -> no bigrams -> excluded
        ],
        "doc_id long, text string, lang string",
    )
    [r] = tx.bigram_surprisal_stats(docs, flag_ratio=2).collect()
    assert r.n_docs == 4
    # 'a b' docs: ratio 4/3 (floored micro) ~ 1.333; 'a c': ratio 4/1 = 4
    assert r.max_doc_ratio == 4.0
    assert r.n_flagged == 1  # only the 'a c' doc exceeds ratio 2
    # corpus mean = (3*floor(4/3*1e6) + 4e6) / 4 / 1e6
    import math
    expect = (3 * math.floor(4 / 3 * 1e6) + 4_000_000) / 4 / 1e6
    assert r.avg_ratio == expect


def test_dsir_targets_dominate_selection(spark):
    """DSIR semantics: with lang='en' as the target distribution, the
    corpus-wide top-K must be overwhelmingly English — the importance
    ratio is exactly 'looks like the target'. Grouping by lang makes
    the selection composition visible."""
    from amadeus_spark.functions import dsir

    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet"))
    out = {
        r["lang"]: r
        for r in dsir.dsir_importance_stats(
            docs, "lang = 'en'", group_col="lang"
        ).collect()
    }
    assert sum(r["n_selected"] for r in out.values()) == dsir.DSIR_TOP_K
    # the target language must be ENRICHED in the selection relative to
    # its corpus share (the synthetic corpus shares most vocabulary
    # across languages, so full dominance isn't achievable by design)
    n_docs = sum(r["n_docs"] for r in out.values())
    en_share = out["en"]["n_docs"] / n_docs
    sel_share = out["en"]["n_selected"] / dsir.DSIR_TOP_K
    assert sel_share >= 1.25 * en_share, (sel_share, en_share)
    # and the target group's mean importance exceeds every other group's
    for lang, r in out.items():
        if lang != "en":
            assert out["en"]["avg_ratio"] > r["avg_ratio"], (lang, r)


def test_dsir_partitioning_invariance(spark):
    from amadeus_spark.functions import dsir

    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet"))

    def rows(np):
        return sorted(
            tuple(str(v) for _, v in sorted(r.asDict().items()))
            for r in dsir.dsir_importance_stats(
                docs.repartition(np), "lang = 'en'"
            ).collect()
        )

    assert rows(1) == rows(13)


def test_span_rewrite_consistent_with_span_stats(spark):
    """The rewrite must delete EXACTLY the token mass
    duplicated_span_stats measures: per-doc n_removed sums (by lang)
    equal the stats' dup_tokens, and a doc with zero removals keeps an
    md5 equal to md5 of its space-joined tokens."""
    import hashlib

    from amadeus_spark.functions import dedup

    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet"))
    stats = {
        r["lang"]: r["dup_tokens"]
        for r in dedup.duplicated_span_stats(docs).collect()
    }
    rewrite = dedup.span_dedup_rewrite(docs)
    lang_map = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    per_lang: dict = {}
    rows = rewrite.collect()
    for r in rows:
        per_lang[lang_map[r["doc_id"]]] = per_lang.get(lang_map[r["doc_id"]], 0) + r["n_removed"]
    assert per_lang == {k: v for k, v in stats.items()}, (per_lang, stats)
    # untouched docs: md5(rewrite) == md5(original token join)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    untouched = [r for r in rows if r["n_removed"] == 0][:20]
    assert untouched
    for r in untouched:
        toks = [t for t in texts[r["doc_id"]].split(" ") if t]
        want = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert r["cleaned_md5"] == want, r["doc_id"]


def test_span_decontaminate_consistent_with_flag_decon(spark):
    """The surgical scrub and the doc-level flag must agree on WHICH
    corpus docs overlap the probe set: n_removed > 0 exactly for the
    docs decontamination_stats counts as contaminated."""
    from amadeus_spark.functions import dedup

    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet"))
    flags = {
        r["lang"]: r["n_contaminated"]
        for r in dedup.decontamination_stats(docs).collect()
    }
    lang_map = {
        r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()
    }
    scrubbed = dedup.span_decontaminate(docs).collect()
    per_lang: dict = {}
    for r in scrubbed:
        if r["n_removed"] > 0:
            lg = lang_map[r["doc_id"]]
            per_lang[lg] = per_lang.get(lg, 0) + 1
    assert per_lang == {k: v for k, v in flags.items() if v}, (per_lang, flags)


def test_span_rewrite_matches_bruteforce(spark):
    """Randomized brute-force check of the REWRITE itself (not just the
    stats): small-alphabet docs force dense shingle collisions, and the
    per-doc cleaned md5 must equal a Python reimplementation of
    'delete every position covered by a shared k-shingle'."""
    import hashlib
    import random

    from amadeus_spark.functions import dedup as dd

    k = 3
    rng = random.Random(1234)
    docs = [
        (i, " ".join(rng.choice("ab") for _ in range(rng.randint(1, 12))))
        for i in range(50)
    ]
    toks = {i: t.split() for i, t in docs}
    owners: dict[str, set[int]] = {}

    def starts(ts):
        return list(range(max(len(ts) - k + 1, 1)))

    for i, _ in docs:
        for p in starts(toks[i]):
            owners.setdefault(" ".join(toks[i][p : p + k]), set()).add(i)
    want = {}
    for i, _ in docs:
        covered: set[int] = set()
        for p in starts(toks[i]):
            if len(owners[" ".join(toks[i][p : p + k])]) >= 2:
                covered.update(range(p, min(p + k, max(len(toks[i]), p + 1))))
        kept = [t for j, t in enumerate(toks[i]) if j not in covered]
        want[i] = (
            len(toks[i]),
            len(covered),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_md5"])
        for r in dd.span_dedup_rewrite(df, k=k).collect()
    }
    assert got == want


def test_dsir_empty_target_degrades_gracefully(spark):
    """A predicate matching nothing leaves a pure-Laplace model: every
    ratio equals 1e6/(q_b+1)-ish, no crash, selection still exactly
    top_k by the total tie-break."""
    from amadeus_spark.functions import dsir

    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet"))
    out = dsir.dsir_importance_stats(docs, "lang = 'xx'", group_col="lang").collect()
    assert sum(r["n_selected"] for r in out) == dsir.DSIR_TOP_K
    assert all(r["n_docs"] > 0 for r in out)


def test_snapshot_diff_crafted(spark):
    """Hand-built snapshots: one add, one remove, one change, one
    unchanged — each classified exactly once."""
    from amadeus_spark.functions import dedup as dd

    a = spark.createDataFrame(
        [(1, "en", "keep"), (2, "en", "will change"), (3, "de", "going away")],
        "doc_id long, lang string, text string",
    )
    b = spark.createDataFrame(
        [(1, "en", "keep"), (2, "en", "changed now"), (9, "de", "brand new")],
        "doc_id long, lang string, text string",
    )
    got = {
        r["lang"]: (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"])
        for r in dd.snapshot_diff_stats(a, b).collect()
    }
    assert got == {"en": (0, 0, 1, 1), "de": (1, 1, 0, 0)}


# ----- chunk_docs (sliding-window chunking) ---------------------------------


def test_chunk_docs_boundaries(spark):
    from amadeus_spark.functions.text import chunk_docs

    def mk(n):
        return " ".join(f"t{i}" for i in range(n))

    df = spark.createDataFrame(
        [(1, mk(5)), (2, mk(8)), (3, mk(9)), (4, mk(20)), (5, "")],
        "doc_id long, text string",
    )
    out = chunk_docs(df, window=8, stride=4)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    # n <= window -> exactly one chunk, full doc
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 5
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 8
    # n = window + 1 -> two chunks, second short, stride offset
    assert len(by_doc[3]) == 2
    assert by_doc[3][1]["chunk_start"] == 4
    assert by_doc[3][1]["n_chunk_tokens"] == 5
    # full coverage with overlap: chunk i covers [4i, 4i+8)
    c4 = sorted(by_doc[4], key=lambda r: r["chunk_id"])
    assert len(c4) == 4
    covered = set()
    for r in c4:
        toks = r["chunk_text"].split(" ")
        assert toks == [f"t{i}" for i in range(r["chunk_start"], r["chunk_start"] + len(toks))]
        covered.update(range(r["chunk_start"], r["chunk_start"] + len(toks)))
    assert covered == set(range(20))
    # empty doc -> one empty chunk (documented)
    assert len(by_doc[5]) == 1 and by_doc[5][0]["n_chunk_tokens"] == 0
