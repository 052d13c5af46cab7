"""Lexical (keyword) retrieval — BM25-shape scoring over the corpus,
complementing the embedding-side ANN family (similarity.py) with the
sparse half of standard hybrid search.

Scoring follows the BM25 structure (Robertson/Spärck Jones, public):

    score(d, q) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·|d|/avgdl))

with the one house deviation that keeps the gate strict-hash: idf is
the RATIONAL core ``(N - df + 0.5)/(df + 0.5)`` without the log wrap —
``ln()`` is not identically rounded across libm builds, so a log-based
score can never hash-match DuckDB (the same reasoning as
perplexity_filter's inverse-frequency proxy, functions/text.py). The
log is monotone per term but the SUM across terms weights differently,
so production ranking that must match Lucene swaps ``_idf_frag`` to
``ln(...)`` — the plan is unchanged; only the gate-compare demands the
rational form.

Physical plan at 100 TB: the query's term stats (df per term, N,
avgdl) are TINY aggregates — broadcast; the corpus side is one explode
→ filter-to-query-terms (pushes the non-matching token stream out
before any shuffle) → per-(doc, term) count → per-doc weighted sum →
top-k. One corpus scan, shuffles keyed by doc, top-k via
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: standard BM25 free parameters (Robertson et al. defaults)
K1 = 1.2
B = 0.75

#: default gate query terms — present across the synthetic corpus with
#: very different document frequencies, so idf ordering matters
DEFAULT_TERMS = ("spark", "join", "window")


def _score_frag(tf: str, dl: str, avgdl: str, n: str, df: str) -> str:
    """The per-(doc,term) BM25 contribution — ONE string emitted into
    both dialects (every input is a SQL fragment)."""
    idf = f"(({n} - {df} + 0.5) / ({df} + 0.5))"
    denom = f"({tf} + {K1} * (1.0 - {B} + {B} * {dl} / {avgdl}))"
    return f"{idf} * {tf} * (1.0 + {K1}) / {denom}"


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    terms: tuple[str, ...] = DEFAULT_TERMS,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs for a bag-of-terms query. Output: doc_id BIGINT,
    n_hits BIGINT (query terms present), score DOUBLE — ordered by
    (score DESC, doc_id) with the full deterministic tie-break."""
    terms_arr = F.array(*[F.lit(t) for t in terms])
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        ).cast("double").alias("dl"),
        F.explode(
            F.filter(
                F.split(F.col(text_col), " "),
                lambda t: F.array_contains(terms_arr, t),
            )
        ).alias("t"),
    )
    tf = toks.groupBy("doc", "t").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").alias("dl"),
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(
            F.size(
                F.filter(
                    F.split(F.col(text_col), " "), lambda t: t != F.lit("")
                )
            )
        ).alias("avgdl"),
    )
    dfreq = (
        tf.groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    # Determinism of the per-doc sum: tf holds exactly ONE row per
    # (doc, term), so each per-term conditional SUM has a single
    # nonzero addend (exact in any order), and the final score is a
    # FIXED-ORDER addition chain written identically in both dialects
    # — bit-identical, no engine-specific float summation anywhere.
    per_term = [
        F.sum(
            F.when(F.col("t") == t, F.col("__s")).otherwise(F.lit(0.0))
        ).alias(f"__s{i}")
        for i, t in enumerate(terms)
    ]
    chain = " + ".join(f"__s{i}" for i in range(len(terms)))
    scored = (
        tf.join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__s", F.expr(_score_frag("tf", "dl", "avgdl", "n", "df"))
        )
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hits"), *per_term)
        .withColumn("score", F.expr(f"({chain})"))
    )
    return (
        scored.select(F.col("doc").alias(id_col), "n_hits", "score")
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def bm25_topk_oracle(
    table: str = "documents",
    terms: tuple[str, ...] = DEFAULT_TERMS,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of bm25_topk — same tokenization, same score
    fragment, same per-term exact sums + fixed-order addition chain,
    same tie-break."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    score = _score_frag("tf", "dl", "avgdl", "n", "df")
    per_term = ",\n       ".join(
        f"SUM(CASE WHEN t = '{t}' THEN {score} ELSE 0.0 END) AS __s{i}"
        for i, t in enumerate(terms)
    )
    chain = " + ".join(f"__s{i}" for i in range(len(terms)))
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc,
         CAST(len(list_filter(string_split({text_col}, ' '),
                              x -> x <> '')) AS DOUBLE) AS dl,
         unnest(list_filter(string_split({text_col}, ' '),
                            x -> list_contains([{tlist}], x))) AS t
  FROM {table}
), tf AS (
  SELECT doc, t, CAST(COUNT(*) AS DOUBLE) AS tf, FIRST(dl) AS dl
  FROM toks GROUP BY doc, t
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(CAST(len(list_filter(string_split({text_col}, ' '),
                                  x -> x <> '')) AS DOUBLE)) AS avgdl
  FROM {table}
), dfreq AS (
  SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t
), grouped AS (
  SELECT tf.doc,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       {per_term}
  FROM tf JOIN dfreq USING (t) CROSS JOIN stats
  GROUP BY tf.doc
)
SELECT doc AS {id_col}, n_hits, ({chain}) AS score
FROM grouped ORDER BY score DESC, {id_col} LIMIT {k}
"""


def hard_negatives(
    docs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hard-negative mining for retrieval training — for each QUERY
    document, the top-k highest-BM25 OTHER documents (lexically close =
    hard; the standard negatives source for dual-encoder training).
    Output: (query_id, neg_id, n_shared BIGINT, score_us BIGINT),
    ordered (query_id, score desc, neg_id).

    Scoring is the module's rational-idf BM25, with one extra exactness
    device: each (query, term, candidate) contribution is floored to
    INTEGER MICRO-UNITS before the per-pair sum — a query doc's term
    set is dynamic, so the fixed-order addition chain bm25_topk uses is
    unavailable, and summing raw doubles is order-dependent across
    engines (iron rule 2). Integer sums are exact in any order;
    quantization at 1e-6 only reorders genuinely tied candidates and
    the (score, id) tie-break is total anyway.

    Scale: query docs are FEW (a training batch) — their distinct term
    set broadcasts twice (corpus token filter + scoring join); the
    corpus explodes once, shuffles once on (doc, term); top-k per query
    is a literal-bound row_number → WindowGroupLimit truncates map-side.
    The tf frame feeds dfreq AND the scoring join, so it persists."""
    from pyspark.sql import Window

    from amadeus_spark.cache import tracked_persist

    ids = ", ".join(str(i) for i in query_ids)
    # stage the token array ONCE per row (no CSE across inlined
    # subexpressions — the old shape split+filtered the text twice per
    # row, once for dl and once for the explode; the r15 staging halves
    # the tokenize work in the corpus-wide pass)
    toks_all = docs.select(
        F.col(id_col).alias("doc"),
        F.filter(
            F.split(F.col(text_col), " "), lambda t: t != F.lit("")
        ).alias("__arr"),
    ).select(
        "doc",
        F.size("__arr").cast("double").alias("dl"),
        F.explode("__arr").alias("t"),
    )
    qterms = (
        toks_all.filter(F.expr(f"doc IN ({ids})"))
        .select(F.col("doc").alias("q"), "t")
        .distinct()
    )
    tf = tracked_persist(
        toks_all.join(F.broadcast(qterms.select("t").distinct()), "t")
        .groupBy("doc", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(
            F.size(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
            )
        ).alias("avgdl"),
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    contrib = F.expr(
        "cast(floor((" + _score_frag("tf", "dl", "avgdl", "n", "df") + ") * 1e6) as bigint)"
    )
    pair = (
        tf.join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "t")
        .filter(F.col("doc") != F.col("q"))
        .withColumn("__c", contrib)
        .groupBy("q", "doc")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum("__c").alias("score_us"),
        )
    )
    w = Window.partitionBy("q").orderBy(F.desc("score_us"), F.asc("doc"))
    return (
        pair.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            F.col("q").alias("query_id"),
            F.col("doc").alias("neg_id"),
            "n_shared",
            "score_us",
        )
        .orderBy("query_id", F.desc("score_us"), "neg_id")
    )


def hard_negatives_oracle(
    table: str,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of hard_negatives — same micro-unit contributions,
    same tie-breaks."""
    ids = ", ".join(str(i) for i in query_ids)
    score = _score_frag("tf", "dl", "avgdl", "n", "df")
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc,
         CAST(len(list_filter(string_split({text_col}, ' '),
                              x -> x <> '')) AS DOUBLE) AS dl,
         unnest(list_filter(string_split({text_col}, ' '), x -> x <> '')) AS t
  FROM {table}
), qterms AS (
  SELECT DISTINCT doc AS q, t FROM toks WHERE doc IN ({ids})
), tf AS (
  SELECT doc, t, CAST(COUNT(*) AS DOUBLE) AS tf, FIRST(dl) AS dl
  FROM toks WHERE t IN (SELECT DISTINCT t FROM qterms)
  GROUP BY doc, t
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(CAST(len(list_filter(string_split({text_col}, ' '),
                                  x -> x <> '')) AS DOUBLE)) AS avgdl
  FROM {table}
), dfreq AS (
  SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t
), pair AS (
  SELECT q, doc,
         CAST(COUNT(*) AS BIGINT) AS n_shared,
         CAST(SUM(CAST(FLOOR(({score}) * 1e6) AS BIGINT)) AS BIGINT) AS score_us
  FROM tf JOIN dfreq USING (t) CROSS JOIN stats JOIN qterms USING (t)
  WHERE doc <> q
  GROUP BY q, doc
)
SELECT q AS query_id, doc AS neg_id, n_shared, score_us FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY score_us DESC, doc) AS rn
  FROM pair
) WHERE rn <= {k}
ORDER BY query_id, score_us DESC, neg_id
"""


# ----- inverted index (postings) build --------------------------------------

#: posting-list head length retained per term
POSTINGS_TOP_N = 5


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = POSTINGS_TOP_N,
) -> DataFrame:
    """Inverted-index build — the MATERIALIZED form of what bm25_topk
    computes on the fly: one row per term with document frequency,
    collection frequency, and the posting-list HEAD (top ``top_n`` docs
    by tf, tie-broken by doc id) serialized as ``doc:tf`` pairs. A
    search tier serves lookups from this table; rebuilding it is the
    batch indexing job.

    Physical plan at 100 TB: explode → per-(term, doc) count (shuffle 1,
    keyed by the pair — co-groups each doc's duplicates map-side via
    partial aggregation), then the tf frame PERSISTS (it feeds two
    consumers — the tracked-registry self-join discipline) and splits:

    - HEAD branch: rank window with the LITERAL ``top_n`` filter so
      WindowGroupLimit truncates per map task before the term shuffle —
      a stopword's shuffle volume is top_n × tasks, not its postings;
    - STATS branch: plain groupBy(term) — partial aggregation combines
      map-side, so the same hot term ships one partial per task.

    The branches broadcast-join per term (head frame is ≤ top_n rows per
    term). A single-window formulation would be one shuffle fewer but
    CANNOT truncate (df/cf need every row), so every hot term's full
    posting list would sort through one reducer — the branched shape is
    the one that survives skew. Full posting lists for serving would be
    written bucketed BY TERM HASH so lookups partition-prune
    (storage.write_bucketed)."""
    from pyspark.sql import Window

    from amadeus_spark.cache import tracked_persist

    toks = F.expr(f"filter(split({text_col}, ' '), w -> w != '')")
    tf = tracked_persist(
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col(id_col)
    )
    heads = (
        tf.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_n)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("tf")).alias("nt"),
                                F.col(id_col).alias("d"),
                            )
                        )
                    ),
                    lambda x: F.concat_ws(
                        ":",
                        x["d"].cast("string"),
                        (-x["nt"]).cast("string"),
                    ),
                ),
                ",",
            ).alias("head")
        )
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    return stats.join(heads, "term").select("term", "df", "cf", "head")


def build_postings_oracle(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = POSTINGS_TOP_N,
) -> str:
    """DuckDB twin — same tokenization, stats and head ordering
    (tf desc, id asc), head via filtered string_agg ORDER BY."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(list_filter(string_split({text_col}, ' '), w -> w <> ''))
             AS term
  FROM {table}
), tf AS (
  SELECT term, {id_col}, COUNT(*) AS tf FROM toks GROUP BY term, {id_col}
), ranked AS (
  SELECT term, {id_col}, tf,
         ROW_NUMBER() OVER (
             PARTITION BY term ORDER BY tf DESC, {id_col}
         ) AS __rn
  FROM tf
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS cf,
       COALESCE(string_agg(
           CASE WHEN __rn <= {top_n}
                THEN CAST({id_col} AS VARCHAR) || ':' || CAST(tf AS VARCHAR)
           END, ','
           ORDER BY tf DESC, {id_col}), '') AS head
FROM ranked GROUP BY term
"""
