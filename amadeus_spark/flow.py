"""Fluent ParallelStream façade — the reference's combinator-chain API
shape (``source.par_stream().map(..).filter(..).count()``,
par_stream.rs:61-547) over a Spark DataFrame, so a reference user's
query reads the same left-to-right way here.

This is a ZERO-COST veneer: every combinator delegates to the module
that owns the operator (operators/transforms, aggregates, sampling,
sketches, group_sink) and just re-wraps the resulting DataFrame — no
logic lives here, so Catalyst sees one declarative plan per chain and
the plan-quality test suite keeps applying. Combinators are LAZY
(return ``Flow``); sinks are terminal (run a job, return a value or a
small DataFrame) — exactly the reference's DistributedPipe/Sink split.

Column-expression closures, not Python lambdas: the reference's map
takes an arbitrary Rust closure; here the fast path is a Catalyst
Column per the repo's no-row-Python rule, and the fully-general escape
hatch is :meth:`Flow.map_partitions` (Arrow-batched), mirroring
transforms.map_partitions_pandas.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession

from amadeus_spark.operators import aggregates, sampling, sketches, transforms
from amadeus_spark.operators.group_sink import Sink, group_by_sink


class Flow:
    """A lazily-composed stream of rows (the reference's ParallelStream /
    DistributedStream — one type here, since partitioning is Spark's
    concern; SURVEY §2.7)."""

    def __init__(self, df: DataFrame):
        self.df = df

    # ---- sources (par_stream.rs: IteratorParallelStream / Source) ----

    @classmethod
    def of(cls, spark: SparkSession, rows, schema=None) -> "Flow":
        """In-memory collection source (the reference's
        ``.into_par_stream()`` on iterators)."""
        return cls(spark.createDataFrame(rows, schema))

    # ---- combinators: lazy, return Flow (par_stream.rs:61-135) ----

    def map(self, **cols: Column) -> "Flow":
        """1→1 named column transforms (``map``, par_stream.rs:79-85);
        also covers ``update`` when a name overwrites an existing
        column (par_stream.rs:70-76)."""
        return Flow(transforms.map_rows(self.df, **cols))

    update = map  # the reference's update is map-overwrite

    def filter(self, cond: Column) -> "Flow":
        return Flow(self.df.filter(cond))

    def flat_map(self, **out_cols: Column) -> "Flow":
        """1→N: generator expressions (explode/posexplode/inline) expand
        in the Generate node (par_stream.rs:88-95)."""
        return Flow(transforms.flat_map(self.df, dict(out_cols)))

    def inspect(self, observation, *metrics: Column) -> "Flow":
        return Flow(transforms.inspect(self.df, observation, *metrics))

    def chain(self, *others: "Flow") -> "Flow":
        return Flow(transforms.chain(self.df, *[o.df for o in others]))

    def map_partitions(
        self, fn: Callable[[Iterable], Iterable], schema
    ) -> "Flow":
        """Fully-general closure escape hatch (Arrow-batched, never
        row-at-a-time) — the reference's arbitrary-closure map."""
        return Flow(transforms.map_partitions_pandas(self.df, fn, schema))

    def identity(self) -> "Flow":  # par_stream Identity combinator
        return self

    def cloned(self) -> "Flow":
        """The reference's ``cloned`` exists for Rust ownership; a
        DataFrame is immutable, so this is a plan-sharing alias."""
        return Flow(self.df)

    def pipe(self, fn: Callable[["Flow"], "Flow"]) -> "Flow":
        """Apply a reusable sub-pipeline (the reference's ``pipe``)."""
        return fn(self)

    # ---- distribution knobs (§2.7: ThreadPool/ProcessPool analogs) ----

    def repartition(self, n: int, *cols) -> "Flow":
        return Flow(self.df.repartition(n, *cols))

    # ---- sinks: terminal, run a job (par_sink/*) ----

    def count(self) -> int:
        return self.df.count()

    def collect(self) -> list:
        return self.df.collect()

    def to_df(self) -> DataFrame:
        return self.df

    def for_each(self, f: Callable, per_partition: bool = True) -> None:
        transforms.for_each(self.df, f, per_partition)

    def summary(self, col: str) -> DataFrame:
        """count/sum/mean/stddev_pop in ONE pass (the reference's tuple
        sink, par_sink/tuple.rs via fork)."""
        return aggregates.summary_agg(self.df, col)

    def histogram(self, col: str) -> DataFrame:
        return aggregates.histogram(self.df, col)

    def max_by(self, value_col: str, ord_col: str) -> DataFrame:
        return aggregates.max_by(self.df, value_col, ord_col)

    def min_by(self, value_col: str, ord_col: str) -> DataFrame:
        return aggregates.min_by(self.df, value_col, ord_col)

    def all(self, predicate: Column) -> bool:
        return aggregates.all_match(self.df, predicate)

    def any(self, predicate: Column) -> bool:
        return aggregates.any_match(self.df, predicate)

    def fork(self, sink_a, sink_b):
        """Two sinks, one pass (par_sink/fork.rs)."""
        return aggregates.fork(self.df, sink_a, sink_b)

    def group_by(self, keys: list[str], sinks: dict[str, Sink]) -> DataFrame:
        """``group_by(nested sink)`` in its full generality
        (par_sink/group_by.rs): any composition of the Sink specs."""
        return group_by_sink(self.df, keys, sinks)

    def most_frequent(self, col: str, k: int) -> DataFrame:
        return sketches.most_frequent(self.df, col, k)

    def most_distinct(self, key_col: str, val_col: str, k: int) -> DataFrame:
        return sketches.most_distinct(self.df, key_col, val_col, k)

    def sort_n_by(self, n: int, *order: Column) -> DataFrame:
        return sampling.sort_n_by(self.df, n, *order)

    def sample_unstable(self, k: int, seed: int = 42) -> DataFrame:
        return sampling.reservoir_sample(self.df, k, seed)


class CorpusFlow(Flow):
    """Fluent façade over the LLM-pipeline operators (functions/dedup,
    text, gopher, sampling) for a DOCUMENTS frame — the training-data
    counterpart of Flow's reference combinators. Same zero-cost rule:
    every stage delegates to the owning module and re-wraps; lazy
    stages return CorpusFlow, report stages are terminal DataFrames.

    >>> CorpusFlow(docs).quality().dedup_exact().mixture(
    ...     200, {"en": .5, "de": .5}).to_df()
    """

    def __init__(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ):
        super().__init__(df)
        self.id_col = id_col
        self.text_col = text_col

    def _wrap(self, df: DataFrame) -> "CorpusFlow":
        return CorpusFlow(df, self.id_col, self.text_col)

    # ---- lazy cleaning stages ----

    def quality(self, min_tokens: int = 5, max_tokens: int = 100_000) -> "CorpusFlow":
        """Token-count shape gate (the cheap first Gopher rule)."""
        from pyspark.sql import functions as F

        from amadeus_spark.functions.dedup import toks_frag

        ts, _ = toks_frag(self.text_col)
        n = F.size(F.expr(ts))
        return self._wrap(self.df.filter((n >= min_tokens) & (n <= max_tokens)))

    def scrub_pii(self) -> "CorpusFlow":
        from pyspark.sql import functions as F

        from amadeus_spark.functions import text as _text

        return self._wrap(
            self.df.withColumn(
                self.text_col, _text.redact_pii(F.col(self.text_col))
            )
        )

    def dedup_exact(self) -> "CorpusFlow":
        """Keep the min-id doc per exact content fingerprint."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(F.xxhash64(F.col(self.text_col))).orderBy(
            self.id_col
        )
        return self._wrap(
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def dedup_near(self, threshold: float = 0.8, max_bucket: int | None = 500) -> "CorpusFlow":
        """Drop every doc with a more-senior MinHash near-duplicate."""
        from pyspark.sql import functions as F

        from amadeus_spark.functions import dedup as _dedup

        pairs = _dedup.minhash_lsh_pairs(
            self.df, self.id_col, self.text_col, threshold, max_bucket
        )
        drop = pairs.select(F.col("doc_b").alias(self.id_col)).distinct()
        return self._wrap(self.df.join(drop, self.id_col, "left_anti"))

    def normalize(self) -> "CorpusFlow":
        """NFKC-lite unicode/whitespace fold (functions/normalize.py) —
        runs FIRST in a real chain so dedup keys see canonical text."""
        from pyspark.sql import functions as F

        from amadeus_spark.functions import normalize as _norm

        return self._wrap(
            self.df.withColumn(
                self.text_col, _norm.normalize_text(F.col(self.text_col))
            )
        )

    def c4(self) -> "CorpusFlow":
        """C4 line/page cleaning REWRITE (functions/c4.py): drops failing
        pages and replaces text with the kept lines."""
        from pyspark.sql import functions as F

        from amadeus_spark.functions import c4 as _c4

        cleaned = _c4.c4_clean(self.df, self.text_col, self.id_col)
        return self._wrap(
            cleaned.filter(F.col("keep_doc"))
            .withColumn(self.text_col, F.col("cleaned"))
            .drop("n_lines", "n_kept_lines", "keep_doc", "cleaned")
        )

    def temperature(self, total_k: int, alpha: float = 0.5, stratum: str = "lang") -> "CorpusFlow":
        """Temperature language resampling (UniMax law) — quotas derived
        from the current frame's per-stratum counts."""
        from amadeus_spark.operators import sampling as _sampling

        return self._wrap(
            _sampling.temperature_mixture(
                self.df, stratum, self.id_col, total_k, alpha
            )
        )

    def chunk(self, window: int = 64, stride: int = 48) -> "CorpusFlow":
        """Sliding-window chunking: text becomes per-chunk rows (the
        id column stays; chunk_id disambiguates)."""
        from pyspark.sql import functions as F

        from amadeus_spark.functions import text as _text

        chunks = _text.chunk_docs(
            self.df, window, stride, self.id_col, self.text_col
        )
        return self._wrap(
            chunks.withColumn(self.text_col, F.col("chunk_text")).drop(
                "chunk_text", "chunk_start", "n_chunk_tokens"
            )
        )

    def mixture(self, total_k: int, weights: dict[str, float], stratum: str = "lang") -> "CorpusFlow":
        from amadeus_spark.operators import sampling as _sampling

        return self._wrap(
            _sampling.mixture_sample(self.df, stratum, self.id_col, total_k, weights)
        )

    def token_budget(self, budgets: dict[str, int], stratum: str = "lang") -> "CorpusFlow":
        from pyspark.sql import functions as F

        from amadeus_spark.functions.dedup import toks_frag
        from amadeus_spark.operators import sampling as _sampling

        ts, _ = toks_frag(self.text_col)
        with_n = self.df.withColumn("n_tok", F.size(F.expr(ts)).cast("long"))
        return self._wrap(
            _sampling.token_budget_sample(
                with_n, stratum, self.id_col, "n_tok", budgets
            ).drop("n_tok")
        )

    # ---- terminal reports ----

    def quality_report(self) -> DataFrame:
        from amadeus_spark.functions import gopher as _gopher

        return _gopher.gopher_report(self.df, text_col=self.text_col)

    def split_report(self, threshold: float = 0.8) -> DataFrame:
        """Leakage-safe split stats over the current (cleaned) frame."""
        from amadeus_spark.functions import dedup as _dedup

        pairs = _dedup.minhash_lsh_pairs(
            self.df, self.id_col, self.text_col, threshold, 500
        )
        return _dedup.cluster_safe_split_stats(
            self.df, pairs, id_col=self.id_col
        )

    def export_shards(self, path: str, n_shards: int, epoch: int) -> None:
        from amadeus_spark.operators import storage as _storage

        _storage.write_training_shards(
            self.df, path, self.id_col, n_shards, epoch
        )
