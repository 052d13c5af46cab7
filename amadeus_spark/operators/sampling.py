"""Sampling and top-n — SURVEY.md §2.5/2.6.

- ``sort_n_by(n, cmp)`` (par_stream.rs:181-191, amadeus-streaming/src/
  sort.rs:24-31): bounded top-n, mergeable. Spark's orderBy().limit(n)
  plans as TakeOrderedAndProject — each task keeps n rows, driver merges;
  the identical algorithm, already distributed.
- ``sample_unstable(k)`` (par_stream.rs:375-389, sample.rs:125-185):
  exact-k uniform reservoir, mergeable across partitions. Spark has
  Bernoulli ``df.sample`` (fraction, not exact-k); exact-k is
  orderBy(rand(seed)).limit(k) — a uniform random permutation's first k
  elements IS a uniform k-reservoir, and TakeOrderedAndProject keeps it
  one pass, no full sort. Deterministic under a fixed seed *and* fixed
  partitioning; for cross-engine oracle checks use hash-based sampling
  (deterministic_sample) instead of rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort_n_by(df: DataFrame, n: int, *order: Column) -> DataFrame:
    """Top-n by comparator → TakeOrderedAndProject."""
    return df.orderBy(*order).limit(n)


def reservoir_sample(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """Exact-k uniform sample (reference sample_unstable semantics)."""
    return df.orderBy(F.rand(seed)).limit(k)


def deterministic_sample(df: DataFrame, key: str, k: int, salt: str = "rs") -> DataFrame:
    """Exact-k sample that is reproducible across engines: order by a hash
    of a unique key. Uniform over keys for a good hash; cross-checkable in
    SQL (same md5 expression in DuckDB)."""
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    return df.orderBy(h, F.col(key)).limit(k)


def stratified_sample(
    df: DataFrame, stratum: str, key: str, k: int, salt: str = "rs"
) -> DataFrame:
    """Exact-k-per-stratum sample, engine-reproducible: within each
    stratum, rank rows by md5(salt||key) — a fixed uniform permutation —
    and keep the first k. One shuffle (the window's partitionBy); no
    per-stratum driver loop, so the stratum count can be unbounded.
    Equal-size strata sampling is the standard class-balance primitive
    for training-data pipelines; cross-checkable in SQL (row_number over
    the same md5 in DuckDB)."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(stratum).orderBy(h, F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Streaming-friendly fraction sample (reference SampleTotal shape,
    sample.rs:7-39): no shuffle at all, each task keeps ~fraction rows."""
    return df.sample(fraction=fraction, seed=seed)


def weighted_sample(
    df: DataFrame, key: str, weight: str, k: int, salt: str = "ws"
) -> DataFrame:
    """Deterministic weight-biased exact-k sample: rank by
    hash32(salt||key) / weight ascending — items with larger weights get
    systematically smaller ranks (the exponential-clocks shape of
    Efraimidis-Spirakis A-ES with the hash standing in for u; the
    uniform-instead-of-exponential draw biases inclusion odds slightly
    toward heavy items, documented, but keeps the rank EXACT across
    engines: integer-hash / weight is one correctly-rounded IEEE
    division in both, where the faithful u^(1/w) would hang on pow()'s
    libm rounding). Non-positive and NULL weights are EXCLUDED before
    ranking (weight 0 = never sample; Spark's hash/0 is NULL and would
    otherwise sort FIRST ascending while DuckDB's +Infinity sorts last
    — both wrong and mutually divergent). TakeOrderedAndProject — no
    global sort."""
    from amadeus_spark.functions.dedup import hash32_frag

    hs, _ = hash32_frag(f"concat('{salt}', cast({key} as string))", "")
    rank = F.expr(hs) / F.col(weight)
    return (
        df.filter(F.col(weight) > 0)
        .orderBy(rank, F.col(key))
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    total_k: int,
    weights: dict[str, float],
    salt: str = "mx",
) -> DataFrame:
    """Deterministic mixture resampling — the training-data MIXTURE
    primitive: draw exactly ``round(total_k * w_s)`` rows from each
    stratum (source/language/domain), so the output corpus hits a target
    composition regardless of the input's skew. Selection within a
    stratum is the fixed md5 permutation (engine-reproducible, same as
    stratified_sample), so re-running on a grown corpus keeps previously
    selected rows stable except where the permutation prefix shifts.

    One window shuffle keyed by stratum; per-stratum quotas ride along
    as a broadcast CASE expression (no driver loop, no N jobs). Strata
    missing from ``weights`` get quota 0.

    100 TB shape: strata are few (languages, sources), so an unbounded
    per-stratum window would sort whole strata through a handful of
    tasks. The filter therefore carries a LITERAL ``rn <= max_quota``
    conjunct alongside the CASE — Spark's WindowGroupLimit rule only
    fires on constant bounds, and with it every map task truncates to
    max_quota rows per stratum BEFORE the shuffle (Partial+Final
    WindowGroupLimit, plan-tested), so the window's input is
    O(max_quota × partitions), never the corpus."""
    from pyspark.sql import Window

    quotas = {s: int(round(total_k * wt)) for s, wt in weights.items()}
    quota = F.lit(0)
    for s, k in quotas.items():
        quota = F.when(F.col(stratum) == s, F.lit(k)).otherwise(quota)
    max_quota = max(quotas.values(), default=0)
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(stratum).orderBy(h, F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") <= max_quota) & (F.col("__rn") <= quota))
        .drop("__rn")
    )


def mixture_sample_oracle(
    table: str,
    stratum: str,
    key: str,
    total_k: int,
    weights: dict[str, float],
    salt: str = "mx",
    cols: str = "*",
) -> str:
    """DuckDB twin — same quotas, same md5 permutation (iron rule 7:
    both dialects from one constant set)."""
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(total_k * w))}" for s, w in weights.items()
    )
    return f"""
        SELECT {cols} FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY {stratum}
                ORDER BY md5('{salt}' || CAST({key} AS VARCHAR)), {key}
            ) AS __rn
            FROM {table}
        ) WHERE __rn <= (CASE {stratum} {cases} ELSE 0 END)
    """


def epoch_shuffle(
    df: DataFrame, key: str, n_shards: int, epoch: int, salt: str = "ep"
) -> DataFrame:
    """Deterministic epoch-wise global shuffle — the training-data
    ordering primitive: every epoch e induces a DIFFERENT but fully
    reproducible permutation (shard = hash(salt‖e‖key) mod n_shards,
    position within shard = rank of that hash), so any worker can
    recompute exactly which examples it owns in which order — no
    shuffle-file bookkeeping, no seed drift between engines.

    Plan shape: one hash computation (codegen) + one window per shard
    key — the window partitions by shard (n_shards ≥ cluster cores keeps
    it parallel; same shard-key rule as sequence_packing). Appends
    ``shard`` and ``pos`` columns."""
    from pyspark.sql import Window

    from amadeus_spark.functions.dedup import hash32_frag

    hs, _ = hash32_frag(
        f"concat('{salt}', cast({epoch} as string), '|', cast({key} as string))",
        "",
    )
    h = F.expr(hs)
    shard = (h % n_shards).cast("bigint")
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(key))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__h")
    )


def epoch_shuffle_oracle(
    table: str, key: str, n_shards: int, epoch: int, salt: str = "ep", cols: str = "*"
) -> str:
    """DuckDB twin — same hash, same shard and rank math."""
    from amadeus_spark.functions.dedup import hash32_frag

    _, hd = hash32_frag(
        "", f"'{salt}' || CAST({epoch} AS VARCHAR) || '|' || CAST({key} AS VARCHAR)"
    )
    return f"""
        SELECT {cols} FROM (
            SELECT *, CAST({hd} % {n_shards} AS BIGINT) AS shard,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY {hd} % {n_shards}
                       ORDER BY {hd}, {key}
                   ) AS BIGINT) AS pos
            FROM {table}
        )
    """


def weighted_sample_oracle(
    table: str,
    key: str,
    weight: str,
    k: int,
    salt: str = "ws",
    cols: str = "*",
) -> str:
    """DuckDB twin of ``weighted_sample``, emitted from the SAME salt
    constant and the SAME positive-weight filter (iron rule 7: dual
    dialects derive from one builder, never hand-duplicated) — changing
    the operator's salt default or NULL/non-positive-weight policy
    changes this fragment in lockstep."""
    from amadeus_spark.functions.dedup import hash32_frag

    _, hd = hash32_frag("", f"'{salt}' || CAST({key} AS VARCHAR)")
    return f"""
        SELECT {cols} FROM {table}
        WHERE {weight} > 0
        ORDER BY {hd} / {weight}, {key}
        LIMIT {k}
    """


#: token-budget sampling constants — shared by both dialects.
TOKEN_BUDGET_SALT = "tb1"
TOKEN_BUDGET_SHARDS = 32


def token_budget_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    tokens_col: str,
    budgets: dict[str, int],
    n_shards: int = TOKEN_BUDGET_SHARDS,
    salt: str = TOKEN_BUDGET_SALT,
) -> DataFrame:
    """Token-budget mixture sampling — the training-data quota primitive
    in TOKENS, not documents: keep the md5-permutation prefix of each
    stratum whose running token count stays under the stratum's budget
    (a doc is kept iff the budget is not exhausted BEFORE it, so the
    boundary doc that crosses the budget is included — deterministic in
    both engines). Doc-count quotas (mixture_sample) mis-size mixtures
    when per-stratum document lengths differ; published data recipes
    state their mixtures in tokens.

    100 TB shape: a running sum per stratum cannot use one window —
    strata are FEW (languages/sources), so a per-stratum cumsum would
    sort whole strata through a handful of tasks, and unlike
    mixture_sample's rank cutoff there is no WindowGroupLimit rule for
    sum frames. The cumsum therefore decomposes into the classic
    two-level scan:

      1. shard = h div S (RANGE sharding on the permutation hash, so
         (shard, h, key) lexicographic == global (h, key) order — a
         modulo shard would interleave and the offsets would not
         compose);
      2. within-(stratum, shard) cumsum window — n_shards × strata
         partitions, shards with the data;
      3. per-shard token totals roll up to a TINY offsets frame
         (n_shards rows per stratum — the only coarse window, over
         rows, not the corpus) that broadcast-joins back.

    Integer addition is associative, so two-level == one-level cumsum
    exactly; the DuckDB oracle runs the plain one-level window and must
    hash-match. The windowed frame feeds two consumers (shard totals +
    the final filter), so it persists through the tracked registry."""
    from pyspark.sql import Window

    from amadeus_spark.cache import tracked_persist
    from amadeus_spark.functions.dedup import hash32_frag

    hs, _ = hash32_frag(f"concat('{salt}', cast({key} as string))", "")
    shard_div = (1 << 32) // n_shards + 1
    w_in = (
        Window.partitionBy(stratum, "__shard")
        .orderBy("__h", key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wd = tracked_persist(
        df.withColumn("__h", F.expr(hs))
        .withColumn("__shard", F.expr(f"__h div {shard_div}"))
        .withColumn(
            "__cum_in", F.coalesce(F.sum(tokens_col).over(w_in), F.lit(0))
        )
    )
    w_off = (
        Window.partitionBy(stratum)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        wd.groupBy(stratum, "__shard")
        .agg(F.sum(tokens_col).alias("__st"))
        .withColumn("__off", F.coalesce(F.sum("__st").over(w_off), F.lit(0)))
        .select(stratum, "__shard", "__off")
    )
    budget = F.lit(0)
    for s, b in budgets.items():
        budget = F.when(F.col(stratum) == s, F.lit(b)).otherwise(budget)
    return (
        wd.join(F.broadcast(offsets), [stratum, "__shard"])
        .filter((F.col("__off") + F.col("__cum_in")) < budget)
        .drop("__h", "__shard", "__cum_in", "__off")
    )


def token_budget_sample_oracle(
    table: str,
    stratum: str,
    key: str,
    tokens_expr: str,
    budgets: dict[str, int],
    salt: str = TOKEN_BUDGET_SALT,
    cols: str = "*",
) -> str:
    """DuckDB twin — the SAME permutation hash and budget CASE, but the
    cumsum as ONE plain window per stratum: the two-level decomposition
    is a physical-plan choice, and integer-sum associativity makes the
    values identical, so the hash compare verifies the decomposition
    itself."""
    from amadeus_spark.functions.dedup import hash32_frag

    _, hd = hash32_frag("", f"'{salt}' || CAST({key} AS VARCHAR)")
    cases = " ".join(f"WHEN '{s}' THEN {b}" for s, b in budgets.items())
    return f"""
        SELECT {cols} FROM (
            SELECT *, COALESCE(SUM({tokens_expr}) OVER (
                PARTITION BY {stratum} ORDER BY {hd}, {key}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), 0) AS __cum
            FROM {table}
        ) WHERE __cum < (CASE {stratum} {cases} ELSE 0 END)
    """


#: dyadic temperature exponents supported for engine-exact parity:
#: alpha -> number of IEEE sqrt applications on the stratum count.
#: sqrt is correctly rounded in both engines, so any sqrt CHAIN is
#: bit-identical cross-engine; arbitrary pow(x, a) routes through
#: exp/log and is NOT parity-safe (the perplexity_filter discipline).
TEMPERATURE_ALPHAS = {1.0: 0, 0.5: 1, 0.25: 2}
TEMPERATURE_SALT = "tm"


def _temp_weight_frag(count_sql: str, alpha: float) -> str:
    """floor(c^alpha * 1e6) as BIGINT — micro-unit weight, exact and
    order-independent to sum. Same fragment runs in both engines."""
    expr = f"CAST({count_sql} AS DOUBLE)"
    for _ in range(TEMPERATURE_ALPHAS[alpha]):
        expr = f"sqrt({expr})"
    return f"CAST(floor({expr} * 1000000) AS BIGINT)"


def temperature_mixture(
    df: DataFrame,
    stratum: str,
    key: str,
    total_k: int,
    alpha: float = 0.5,
    salt: str = TEMPERATURE_SALT,
) -> DataFrame:
    """Temperature-based mixture resampling (the mT5/UniMax family:
    Xue et al. 2021 §3.1 sample language l with p_l ∝ |D_l|^alpha) —
    unlike ``mixture_sample`` the per-stratum quotas are DERIVED FROM
    THE DATA, not supplied: low-resource strata are up-weighted as the
    temperature alpha drops below 1. Quota math is integer-exact in
    micro-units (W_l = floor(c_l^alpha·1e6); quota_l = round-half-up of
    total_k·W_l/ΣW as pure BIGINT arithmetic), so both engines agree
    bit-for-bit; Σ quota_l may differ from total_k by < n_strata
    (largest-remainder correction would need a global rank over strata
    — not worth a coarse window for a sub-strata-count delta, and the
    round-half-up rule is itself a published allocation).

    Plan shape: one count aggregate over strata (tiny) → 1-row ΣW
    aggregate cross-joined broadcast (no empty-partitionBy window, per
    the plans sweep) → quota frame broadcast-joined onto the
    md5-permutation rank filter. The literal ``rn <= total_k`` conjunct
    keeps WindowGroupLimit active so map tasks truncate before the
    shuffle; the table is scanned twice (counts + rank), never thrice.

    Overflow: the quota numerator total_k·W_l·2 exceeds BIGINT at
    realistic corpus scale (total_k=1e6 × a 5M-doc stratum at alpha=1
    → 1e19 > 9.2e18; Spark 4 ANSI throws, DuckDB silently widens), so
    the arithmetic runs in 128-bit integers in BOTH engines —
    DECIMAL(38,0) in Spark, HUGEINT in DuckDB, exact to ~1e38 — and
    only the final quota casts back to BIGINT."""
    from pyspark.sql import Window

    wfrag = _temp_weight_frag("__c", alpha)
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("__c"))
    weights = counts.select(stratum, F.expr(wfrag).alias("__w"))
    total = weights.agg(F.sum("__w").alias("__sw"))
    quotas = (
        weights.crossJoin(F.broadcast(total))
        .select(
            stratum,
            # round-half-up(total_k * W / S) in exact 128-bit math
            F.expr(
                f"CAST((CAST({total_k} AS DECIMAL(38,0)) * __w * 2 + __sw)"
                f" div (__sw * 2) AS BIGINT)"
            ).alias("__quota"),
        )
    )
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(stratum).orderBy(h, F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(total_k))
        .join(F.broadcast(quotas), stratum)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def temperature_mixture_oracle(
    table: str,
    stratum: str,
    key: str,
    total_k: int,
    alpha: float = 0.5,
    salt: str = TEMPERATURE_SALT,
    cols: str = "*",
) -> str:
    """DuckDB twin — same micro-unit weight fragment, same round-half-up
    quota arithmetic, same md5 permutation."""
    wfrag = _temp_weight_frag("__c", alpha)
    return f"""
        SELECT {cols} FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY {stratum}
                ORDER BY md5('{salt}' || CAST({key} AS VARCHAR)), {key}
            ) AS __rn
            FROM {table}
        ) t
        JOIN (
            SELECT {stratum} AS __qs,
                   CAST((CAST({total_k} AS HUGEINT) * __w * 2 + __sw)
                        // (__sw * 2) AS BIGINT) AS __quota
            FROM (
                SELECT {stratum}, {wfrag} AS __w,
                       SUM({wfrag}) OVER () AS __sw
                FROM (SELECT {stratum}, COUNT(*) AS __c
                      FROM {table} GROUP BY {stratum})
            )
        ) q ON t.{stratum} = q.__qs
        WHERE __rn <= __quota AND __rn <= {total_k}
    """
