"""Text analysis for large-scale training-data pipelines: tokenization,
quality scoring, language-ID, document fingerprinting.

Everything here is pure Catalyst expressions (JVM-side, codegen,
no Python UDFs) so the ops run at scan speed on 100 TB — the design
constraint is "each doc row is touched once, all derived stats come from
one projection". Each operator has a DuckDB-SQL twin builder so the
driver's oracle check exercises identical semantics (shared constants,
same expression tree in both dialects).

Reference anchor: the reference's row transforms are arbitrary closures
(amadeus-core/src/par_stream.rs:79-104); these are the domain operators a
user of the reference would write inside ``map``, re-expressed as columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared constants — used by both the Spark exprs and the SQL twins.
STOPWORDS = ("the", "and", "of", "a", "to", "in")
LANG_MARKERS = {
    "en": (" the ", " and ", " of "),
    "es": (" el ", " los ", " una "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " les ", " et "),
}
PUNCT_CHARS = (".", ",", "!", "?", ";", ":")


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped (single-space split so the
    DuckDB twin's string_split agrees exactly)."""
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def occurrences(col_sql: str, needle: str) -> Column:
    """Spark Column: occurrences of ``needle`` in the column named by the
    SQL fragment ``col_sql`` (fragment, so callers can pre-lower)."""
    esc = needle.replace("'", "''")
    return F.expr(
        f"(length({col_sql}) - length(replace({col_sql}, '{esc}', ''))) / {len(needle)}"
    )


def occurrences_sql(col_sql: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return f"(length({col_sql}) - length(replace({col_sql}, '{esc}', ''))) / {len(needle)}"


def punct_count(col_sql: str = "text") -> Column:
    expr = " + ".join(occurrences_sql(col_sql, c) for c in PUNCT_CHARS)
    return F.expr(f"({expr})")


def punct_count_sql(col_sql: str = "text") -> str:
    return "(" + " + ".join(occurrences_sql(col_sql, c) for c in PUNCT_CHARS) + ")"


def stopword_count(col_sql: str = "text") -> Column:
    expr = " + ".join(
        occurrences_sql(f"(' ' || lower({col_sql}) || ' ')", f" {w} ") for w in STOPWORDS
    )
    return F.expr(f"({expr})")


def stopword_count_sql(col_sql: str = "text") -> str:
    return (
        "("
        + " + ".join(
            occurrences_sql(f"(' ' || lower({col_sql}) || ' ')", f" {w} ")
            for w in STOPWORDS
        )
        + ")"
    )


def _tokcount_sql(col_sql: str) -> str:
    return f"len(list_filter(string_split({col_sql}, ' '), x -> x <> ''))"


def _tokcount_spark_sql(col_sql: str) -> str:
    return f"size(filter(split({col_sql}, ' '), x -> x != ''))"


def quality_exprs(col_sql: str = "text") -> dict[str, Column]:
    """Quality-scoring feature set: length, token stats, punctuation and
    stopword ratios, composite score. One projection, no shuffle."""
    ntok = f"cast({_tokcount_spark_sql(col_sql)} as double)"
    nchar = f"cast(length({col_sql}) as double)"
    stop = stopword_count_sql(col_sql)
    punct = punct_count_sql(col_sql)
    return {
        "n_chars_derived": F.expr(f"length({col_sql})"),
        "n_tokens": F.expr(_tokcount_spark_sql(col_sql)),
        "avg_token_len": F.expr(f"{nchar} / {ntok}"),
        "stopword_ratio": F.expr(f"cast({stop} as double) / {ntok}"),
        "punct_ratio": F.expr(f"cast({punct} as double) / {nchar}"),
        "quality_score": F.expr(
            f"cast({stop} as double) / {ntok} * 0.5"
            f" + least({ntok} / 100.0, 1.0) * 0.3"
            f" + (1.0 - cast({punct} as double) / {nchar}) * 0.2"
        ),
    }


def quality_sql(col_sql: str = "text") -> dict[str, str]:
    """DuckDB twin of quality_exprs — same tree, DuckDB list dialect."""
    ntok = f"cast({_tokcount_sql(col_sql)} as double)"
    nchar = f"cast(length({col_sql}) as double)"
    stop = stopword_count_sql(col_sql)
    punct = punct_count_sql(col_sql)
    return {
        "n_chars_derived": f"length({col_sql})",
        "n_tokens": _tokcount_sql(col_sql),
        "avg_token_len": f"{nchar} / {ntok}",
        "stopword_ratio": f"cast({stop} as double) / {ntok}",
        "punct_ratio": f"cast({punct} as double) / {nchar}",
        "quality_score": (
            f"cast({stop} as double) / {ntok} * 0.5"
            f" + least({ntok} / 100.0, 1.0) * 0.3"
            f" + (1.0 - cast({punct} as double) / {nchar}) * 0.2"
        ),
    }


def _lang_score_sql(col_sql: str, lang: str) -> str:
    padded = f"(' ' || lower({col_sql}) || ' ')"
    return (
        "(" + " + ".join(occurrences_sql(padded, m) for m in LANG_MARKERS[lang]) + ")"
    )


def lang_id_sql(col_sql: str = "text") -> str:
    """n-gram-marker language ID, identical text in both dialects
    (pure standard SQL: replace/length/CASE)."""
    en, es, de, fr = (_lang_score_sql(col_sql, lg) for lg in ("en", "es", "de", "fr"))
    return (
        f"CASE WHEN {en} = 0 AND {es} = 0 AND {de} = 0 AND {fr} = 0 THEN 'und' "
        f"WHEN {en} >= {es} AND {en} >= {de} AND {en} >= {fr} THEN 'en' "
        f"WHEN {es} >= {de} AND {es} >= {fr} THEN 'es' "
        f"WHEN {de} >= {fr} THEN 'de' ELSE 'fr' END"
    )


def lang_id(col_sql: str = "text") -> Column:
    return F.expr(lang_id_sql(col_sql))


# BPE-ish subword tokenizer: the GPT-2 pattern family without lookahead
# (portable between Java regex and DuckDB's RE2) — contraction suffixes,
# letter runs, 1-3 digit chunks (BPE number splitting), punctuation runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"
# Polynomial rolling-hash fingerprint constants (Rabin-Karp over token
# hashes). M = 2^31-1 (Mersenne prime) keeps acc*B + h inside int64 in
# both engines (acc < 2^31, B ≈ 2^20, h < 2^32 → products ≤ 2^52).
ROLL_B = 1_000_003
ROLL_M = 2_147_483_647


def bpe_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def bpe_token_count_sql(col_sql: str = "text") -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({col_sql}, '{pat}'))"


def rolling_fingerprint(tok_col: str) -> Column:
    """Order-sensitive document fingerprint: left fold of
    (acc * B + hash32(token)) mod M over a PRE-STAGED token-array column
    (stage it — no CSE inside HOF lambdas). Unlike the md5 fingerprint,
    token order and repetition matter, and prefixes share hash state —
    the rolling-hash construction (Rabin-Karp; winnowing's primitive)."""
    from amadeus_spark.functions.dedup import hash32_frag

    hs, _ = hash32_frag("t", "t")
    return F.expr(
        f"aggregate(transform({tok_col}, t -> {hs}), 0L,"
        f" (acc, h) -> (acc * {ROLL_B} + h) % {ROLL_M})"
    )


def rolling_fingerprint_sql(col_sql: str = "text") -> str:
    """DuckDB twin. list_reduce seeds acc with the FIRST element (Spark's
    aggregate seeds 0, making its first step h1 % M) — congruent mod M at
    every later step, so one outer % M restores equality; empty token
    lists (list_reduce errors) map to Spark's init value 0."""
    from amadeus_spark.functions.dedup import hash32_frag, toks_frag

    _, hd = hash32_frag("t", "t")
    _, td = toks_frag(col_sql)
    return (
        f"CASE WHEN len({td}) = 0 THEN 0 ELSE"
        f" list_reduce(list_transform({td}, t -> {hd}),"
        f" (acc, h) -> (acc * {ROLL_B} + h) % {ROLL_M}) % {ROLL_M} END"
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowered
    text — stable content key for exact dedup across formatting noise."""
    return F.md5(F.concat_ws(" ", tokens(F.lower(col))))


def fingerprint_sql(col_sql: str = "text") -> str:
    return f"md5(array_to_string(list_filter(string_split(lower({col_sql}), ' '), x -> x <> ''), ' '))"


# ---- sequence packing (training-data context assembly) --------------------


def sequence_packing(
    df: DataFrame,
    capacity: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
    n_shards: int = 64,
) -> DataFrame:
    """Contiguous greedy sequence packing: documents are laid out in
    ``id_col`` order within each (stream, shard) and cut into fixed
    token-capacity bins (a doc lands in the bin its running offset
    falls in) — the standard streaming packer used to assemble
    training contexts. Output: per-(stream, shard, bin) stats.

    Pure window math (cumulative sum → floor-divide), so it is exactly
    expressible in both engines — unlike best-fit bin packing, which is
    order-dependent on a mutable bin state.

    ``n_shards`` is the scale key: a handful of language streams would
    otherwise funnel the whole corpus through a handful of window
    tasks at 100×. The shard is ``id_col % n_shards`` — deterministic,
    identical in SQL, and each shard packs independently (exactly how a
    distributed packer shards work across writers; bins never span
    shards). 100 TB posture: n_shards ≳ executor-core count.
    """
    from pyspark.sql import Window

    shard = (F.col(id_col) % n_shards).cast("bigint")
    w = (
        Window.partitionBy(stream_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per = df.select(
        stream_col,
        id_col,
        shard.alias("shard"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tok"),
    )
    binned = per.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(capacity)
        ).cast("bigint"),
    )
    return (
        binned.groupBy(stream_col, "shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.sum("n_tok").cast("double") / capacity).alias("fill_ratio"),
        )
        .orderBy(stream_col, "shard", "bin")
    )


def sequence_packing_oracle(
    table: str = "documents",
    capacity: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
    n_shards: int = 64,
) -> str:
    """DuckDB twin of sequence_packing — identical shard/window math."""
    return f"""
WITH per AS (
  SELECT {stream_col}, {id_col},
         CAST({id_col} % {n_shards} AS BIGINT) AS shard,
         CAST(len(list_filter(string_split({text_col}, ' '), x -> x <> '')) AS BIGINT) AS n_tok
  FROM {table}
), binned AS (
  SELECT {stream_col}, shard, n_tok,
         CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
             PARTITION BY {stream_col}, shard ORDER BY {id_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {capacity}) AS BIGINT) AS bin
  FROM per
)
SELECT {stream_col}, shard, bin, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tok) AS DOUBLE) / {capacity} AS fill_ratio
FROM binned GROUP BY {stream_col}, shard, bin
ORDER BY {stream_col}, shard, bin
"""


# ---- within-document repetition metrics (quality filtering) ---------------


def repetition_stats(
    df: DataFrame,
    top2_frac_flag: float = 0.10,
    diversity_flag: float = 0.35,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> DataFrame:
    """Within-document repetition metrics, the published quality-filter
    family (Gopher/MassiveText repetition rules, token-count form):

    - ``top2_frac``: tokens covered by the most frequent 2-gram / total
      tokens — boilerplate detector;
    - ``diversity``: distinct tokens / total tokens — low values mark
      TEMPLATE/keyword-stuffed docs.

    Docs are flagged when top2_frac >= ``top2_frac_flag`` OR diversity
    <= ``diversity_flag``. Output per stream: doc counts, flag counts,
    and exact extrema (max/min are order-independent, so doubles stay
    hash-comparable — no float summation anywhere).

    Physical plan: the gram path carries ONLY (stream, doc, gram) —
    per-doc stat columns must NOT ride through the explode, because
    Catalyst inlines their token-array expressions into the projection
    above the generator and re-evaluates split/filter per EXPLODED row
    (measured 7× on this operator: 7.1 s → 1.0 s at sf0.1 when the
    stats moved to a separate tiny frame joined after the per-doc max).
    Explode 2-grams → one (doc, gram) count shuffle with map-side
    combine → per-doc max (one row per doc) → join per-doc stats →
    per-stream aggregate."""
    toks = tokens(F.col(text_col))
    base = df.select(stream_col, F.col(id_col).alias("doc"), toks.alias("t"))
    stats = base.select(
        stream_col,
        "doc",
        F.size("t").cast("bigint").alias("n_tok"),
        F.size(F.array_distinct("t")).cast("bigint").alias("n_distinct"),
    )
    # guard: Spark's sequence(1, 0) is DESCENDING [1, 0] — a <2-token
    # doc must yield [] (matching DuckDB's exclusive range(1, 1)).
    # Docs with <2 tokens drop out of the gram explode in BOTH engines,
    # so n_docs counts docs with >= 2 tokens.
    gram_rows = base.select(
        "doc",
        F.explode(
            F.expr(
                "case when size(t) >= 2 then"
                " transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"
                " else array() end"
            )
        ).alias("g"),
    )
    per_doc = (
        gram_rows.groupBy("doc", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc")
        .agg(F.max("c").alias("max2"))
    )
    scored = per_doc.join(stats, "doc").select(
        stream_col,
        "doc",
        (F.col("max2") * 2 / F.col("n_tok")).alias("top2_frac"),
        (F.col("n_distinct") / F.col("n_tok")).alias("diversity"),
    )
    flagged = (F.col("top2_frac") >= top2_frac_flag) | (
        F.col("diversity") <= diversity_flag
    )
    return (
        scored.groupBy(stream_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(flagged.cast("bigint")).alias("n_flagged"),
            F.max("top2_frac").alias("max_top2_frac"),
            F.min("diversity").alias("min_diversity"),
        )
        .orderBy(stream_col)
    )


def repetition_stats_oracle(
    table: str = "documents",
    top2_frac_flag: float = 0.10,
    diversity_flag: float = 0.35,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> str:
    """DuckDB twin of repetition_stats — identical token/2-gram math."""
    return f"""
WITH per AS MATERIALIZED (
  SELECT {stream_col}, {id_col} AS doc,
         list_filter(string_split({text_col}, ' '), x -> x <> '') AS t
  FROM {table}
), sized AS (
  SELECT {stream_col}, doc,
         CAST(len(t) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS grams
  FROM per
), gram_rows AS (
  SELECT {stream_col}, doc, n_tok, n_distinct, unnest(grams) AS g FROM sized
), gram_counts AS (
  SELECT {stream_col}, doc, g, COUNT(*) AS c,
         FIRST(n_tok) AS n_tok, FIRST(n_distinct) AS n_distinct
  FROM gram_rows GROUP BY {stream_col}, doc, g
), per_doc AS (
  SELECT {stream_col}, doc, MAX(c) AS max2,
         FIRST(n_tok) AS n_tok, FIRST(n_distinct) AS n_distinct
  FROM gram_counts GROUP BY {stream_col}, doc
), scored AS (
  SELECT {stream_col}, doc,
         max2 * 2 / n_tok AS top2_frac,
         CAST(n_distinct AS DOUBLE) / n_tok AS diversity
  FROM per_doc
)
SELECT {stream_col}, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN top2_frac >= {top2_frac_flag}
                       OR diversity <= {diversity_flag} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       MAX(top2_frac) AS max_top2_frac,
       MIN(diversity) AS min_diversity
FROM scored GROUP BY {stream_col} ORDER BY {stream_col}
"""


# ---- PII detection / redaction --------------------------------------------

#: Conservative patterns that behave identically under Java regex (Spark)
#: and RE2 (DuckDB): character classes + bounded quantifiers only — no
#: lookarounds, no backreferences. Deliberately simple surface forms; a
#: production pass layers NER on top, but regex scrubbing is the
#: always-on first stage of every training-data pipeline.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}
PII_TOKEN = "<PII>"


def redact_pii(col: Column) -> Column:
    """Replace every PII match with the redaction token (patterns apply
    in a fixed order so both dialects rewrite identically)."""
    out = col
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, PII_TOKEN)
    return out


def redact_pii_sql(col_sql: str) -> str:
    out = col_sql
    for pat in PII_PATTERNS.values():
        esc = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{esc}', '{PII_TOKEN}', 'g')"
    return out


def pii_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> DataFrame:
    """Per-stream PII exposure report: docs containing each PII class,
    total redacted characters (length delta after scrubbing). One
    projection + one aggregate — scan-speed, no shuffle beyond the
    final small aggregate."""
    # Column-API rlike, NOT F.expr with an embedded string literal: the
    # SQL parser would eat the \. escapes in the patterns.
    flags = {
        name: F.col(text_col).rlike(pat).cast("bigint")
        for name, pat in PII_PATTERNS.items()
    }
    per = df.select(
        stream_col,
        *[v.alias(f"has_{k}") for k, v in flags.items()],
        (
            F.length(F.col(text_col)) - F.length(redact_pii(F.col(text_col)))
        ).cast("bigint").alias("chars_delta"),
    )
    return (
        per.groupBy(stream_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[F.sum(f"has_{k}").alias(f"n_{k}") for k in PII_PATTERNS],
            F.sum("chars_delta").alias("redacted_char_delta"),
        )
        .orderBy(stream_col)
    )


def pii_stats_oracle(
    table_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> str:
    """DuckDB twin of pii_stats — same patterns, same order."""
    flag_cols = ", ".join(
        f"CAST(regexp_matches({text_col}, '{p.replace(chr(39), chr(39)*2)}') AS INT) AS has_{k}"
        for k, p in PII_PATTERNS.items()
    )
    sums = ", ".join(
        f"CAST(SUM(has_{k}) AS BIGINT) AS n_{k}" for k in PII_PATTERNS
    )
    return f"""
WITH per AS (
  SELECT {stream_col}, {flag_cols},
         CAST(length({text_col}) - length({redact_pii_sql(text_col)}) AS BIGINT)
           AS chars_delta
  FROM {table_sql}
)
SELECT {stream_col}, COUNT(*) AS n_docs, {sums},
       CAST(SUM(chars_delta) AS BIGINT) AS redacted_char_delta
FROM per GROUP BY {stream_col} ORDER BY {stream_col}
"""


# ---- statistical-LM quality filter (CCNet-family, surprisal proxy) --------

#: a document is flagged low-quality when its mean inverse conditional
#: bigram frequency (avg over bigrams of c(prefix)/c(bigram), the
#: surprisal-ratio proxy for perplexity) exceeds this. Shared by both
#: dialects; the flag compare runs in exact integer cross-multiplied
#: form so the boundary can't drift.
SURPRISAL_FLAG_RATIO = 32


def bigram_surprisal_stats(
    df: DataFrame,
    flag_ratio: int = SURPRISAL_FLAG_RATIO,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> DataFrame:
    """Corpus-LM quality scoring, the CCNet/KenLM perplexity-filter
    shape with a transcendental-free score: the "model" is the corpus's
    own bigram table, and a document's score is its mean inverse
    conditional frequency avg(c(w1)/c(w1 w2)) — high when the document's
    token continuations are rare under the corpus distribution (exactly
    what high perplexity means), but built only from counts, one
    division, and a floor, so the DuckDB oracle is bit-identical (log()
    is NOT guaranteed identically rounded across libm implementations;
    a hash-exact gate can't use it).

    Scale plan: bigrams explode map-side from the staged token array
    (the CLAUDE.md HOF rule: array staged as a column first); the model
    is two aggregations on the same (w1,w2) shuffle (bigram counts, then
    prefix counts from the bigram frame — the corpus is NOT rescanned);
    scoring joins bigram rows to the model on (w1,w2) — at 100 TB the
    model is orders of magnitude smaller than the corpus and usually
    broadcasts under AQE; per-doc and per-stream rollups keep every sum
    in exact integer micro-units. The gram frame feeds TWO consumers
    (model build + scoring join), so it persists through the tracked
    registry — without it the scan+explode subtree runs twice (the
    CLAUDE.md multi-consumer rule; measured ~1.5x at sf0.1)."""
    from amadeus_spark.cache import tracked_persist

    toks = tokens(F.col(text_col))
    base = df.select(stream_col, F.col(id_col).alias("doc"), toks.alias("t"))
    grams = tracked_persist(
        base.filter(F.size("t") >= 2)
        .select(
            stream_col,
            "doc",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select(stream_col, "doc", "bg.w1", "bg.w2")
    )
    bg_counts = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    prefix = bg_counts.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    model = bg_counts.join(prefix, "w1").select(
        "w1", "w2", F.floor(F.col("c1") / F.col("c2") * 1e6).alias("ratio_us")
    )
    per_doc = (
        grams.join(model, ["w1", "w2"])
        .groupBy(stream_col, "doc")
        .agg(
            F.sum("ratio_us").cast("long").alias("sum_us"),
            F.count(F.lit(1)).alias("n_bg"),
        )
    )
    flagged = F.col("sum_us") > F.lit(flag_ratio) * F.col("n_bg") * F.lit(1_000_000)
    return (
        per_doc.groupBy(stream_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(flagged, 1).otherwise(0)).cast("long").alias("n_flagged"),
            (F.sum("sum_us").cast("long") / F.sum("n_bg").cast("long") / F.lit(1e6))
            .alias("avg_ratio"),
            F.max(F.col("sum_us") / F.col("n_bg") / F.lit(1e6)).alias("max_doc_ratio"),
        )
        .orderBy(stream_col)
    )


def bigram_surprisal_oracle(
    table: str = "documents",
    flag_ratio: int = SURPRISAL_FLAG_RATIO,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> str:
    """DuckDB twin of bigram_surprisal_stats — same tokenization, same
    floored micro-unit ratios, same integer flag compare. DuckDB's `/`
    on integers is float division like Spark's, so c1/c2*1e6 runs the
    identical IEEE op sequence before the shared floor."""
    return f"""
WITH base AS (
  SELECT {stream_col}, {id_col} AS doc,
         list_filter(string_split({text_col}, ' '), x -> x <> '') AS t
  FROM {table}
), grams AS (
  SELECT {stream_col}, doc, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT {stream_col}, doc, t, unnest(range(1, len(t))) AS i
        FROM base WHERE len(t) >= 2)
), bg_counts AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM grams GROUP BY w1, w2
), prefix AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bg_counts GROUP BY w1
), model AS (
  SELECT b.w1, b.w2, CAST(FLOOR(c1 / c2 * 1e6) AS BIGINT) AS ratio_us
  FROM bg_counts b JOIN prefix p ON b.w1 = p.w1
), per_doc AS (
  SELECT {stream_col}, doc,
         CAST(SUM(ratio_us) AS BIGINT) AS sum_us,
         COUNT(*) AS n_bg
  FROM grams g JOIN model m ON g.w1 = m.w1 AND g.w2 = m.w2
  GROUP BY {stream_col}, doc
)
SELECT {stream_col},
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN sum_us > {flag_ratio} * n_bg * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(sum_us) AS BIGINT) / CAST(SUM(n_bg) AS BIGINT) / 1e6 AS avg_ratio,
       MAX(sum_us / n_bg / 1e6) AS max_doc_ratio
FROM per_doc GROUP BY {stream_col} ORDER BY {stream_col}
"""


# ----- sliding-window chunking (context-window preparation) -----------------

#: default context window / stride in tokens
CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def chunk_docs(
    df: DataFrame,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — split every document's token
    sequence into overlapping ``window``-token chunks advanced by
    ``stride`` (the long-document preparation step before packing/
    training; the overlap keeps context across chunk boundaries, the
    published GPT-2/BERT "stride" evaluation shape). Complements
    ``sequence_packing`` (which packs SHORT docs together; this splits
    LONG docs apart).

    Chunk count = 1 + ceil(max(n - window, 0) / stride) — every token is
    covered, the final chunk may be short, and a doc shorter than one
    window yields exactly one chunk.

    Plan shape: tokens staged ONCE as an array column (HOF lambda
    bodies re-evaluate per element — CLAUDE.md perf note), chunk ids
    exploded from a ``sequence()``, the per-chunk slice taken AFTER the
    explode where it's one codegen'd ``slice`` per output row. Map-only
    (explode is pipelined, no shuffle); at 100 TB chunking fuses into
    the feeding scan. Output: one row per chunk with ``chunk_id``,
    ``chunk_start`` (0-based token offset), ``n_chunk_tokens``,
    ``chunk_text``."""
    toks = F.expr(f"filter(split({text_col}, ' '), w -> w != '')")
    staged = df.withColumn("__toks", toks).withColumn(
        "__n", F.size("__toks")
    )
    n_chunks = F.expr(
        f"1 + CAST(ceil(greatest(__n - {window}, 0)"
        f" / CAST({stride} AS DOUBLE)) AS INT)"
    )
    exploded = staged.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    chunk = F.expr(f"slice(__toks, chunk_id * {stride} + 1, {window})")
    return (
        exploded.withColumn("__chunk", chunk)
        .select(
            *df.columns,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("long").alias("chunk_start"),
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def chunk_stats_oracle(
    table: str = "documents",
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> str:
    """DuckDB twin of the per-stream chunk report (same constants; the
    chunk construction re-derived via unnest(range(...)) + list_slice).
    Reports chunk/token counts, boundary coverage and an
    order-independent per-chunk content checksum."""
    from amadeus_spark.functions.dedup import hash32_frag

    _, hd = hash32_frag(
        "",
        f"CAST({id_col} AS VARCHAR) || chr(1) || CAST(chunk_id AS VARCHAR)"
        " || chr(1) || chunk_text",
    )
    return f"""
WITH staged AS (
  SELECT {stream_col}, {id_col},
         list_filter(string_split({text_col}, ' '), w -> w <> '') AS toks
  FROM {table}
), sized AS (
  SELECT {stream_col}, {id_col}, toks, len(toks) AS n,
         1 + CAST(ceil(greatest(len(toks) - {window}, 0)
                       / CAST({stride} AS DOUBLE)) AS INT) AS n_chunks
  FROM staged
), chunks AS (
  SELECT {stream_col}, {id_col},
         unnest(range(0, n_chunks)) AS chunk_id, toks
  FROM sized
), sliced AS (
  SELECT {stream_col}, {id_col}, chunk_id,
         list_slice(toks, chunk_id * {stride} + 1,
                    chunk_id * {stride} + {window}) AS chunk
  FROM chunks
), rows_ AS (
  SELECT {stream_col}, {id_col}, chunk_id,
         len(chunk) AS n_chunk_tokens,
         array_to_string(chunk, ' ') AS chunk_text
  FROM sliced
)
SELECT {stream_col},
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n_docs,
       CAST(SUM(n_chunk_tokens) AS BIGINT) AS total_chunk_tokens,
       CAST(MAX(n_chunk_tokens) AS BIGINT) AS max_chunk_tokens,
       CAST(SUM({hd}) AS BIGINT) AS content_sum
FROM rows_ GROUP BY {stream_col} ORDER BY {stream_col}
"""
