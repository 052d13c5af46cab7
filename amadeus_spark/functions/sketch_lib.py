"""Mergeable sketch library: Count-Min (conservative update) + Top-k —
sketch-parity with the reference's ``most_frequent``.

Reference spec (re-implemented from its documented behavior, no code
copied): ``Top<Item, usize>`` keeps the current top-n in an ordered map
backed by a Count-Min sketch for the tail, with *conservative update*
(only counters that equal the current minimum are incremented —
amadeus-streaming/src/top.rs:18-35 documents the algorithm; CMS sizing
width=ceil(e/tolerance), depth=ceil(ln(1-probability)/ln(0.5)),
count_min.rs:58-96). Both structures are mergeable (UnionAssign), which
is what makes them distributed-safe partial aggregates.

Spark integration: one sketch per partition via ``applyInPandas`` over a
partition-id group (zero shuffle of raw rows beyond partition locality),
partials serialized as JSON state rows, merged to a final sketch. At
100 TB this is the standard two-level sketch topology: executors build
partials over their partitions; the driver (or a tree-reduce stage)
unions ~num_partitions fixed-size states — exactly the reference's
ReduceA→ReduceC folding (par_sink/folder.rs:17-35).

When to prefer this over exact groupBy-count-orderBy-limit: key
cardinality too high to shuffle (the exact plan shuffles every distinct
key; the sketch shuffles width×depth integers per partition).
"""

from __future__ import annotations

import hashlib
import json
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_params(probability: float, tolerance: float) -> tuple[int, int]:
    """width, depth from the reference's sizing (count_min.rs:58-77)."""
    width = int(math.ceil(math.e / tolerance))
    depth = int(math.ceil(math.log(1.0 - probability) / math.log(0.5)))
    return width, depth


def _bucket(key: str, row: int, width: int) -> int:
    h = hashlib.md5(f"{row}:{key}".encode()).digest()
    return int.from_bytes(h[:8], "big") % width


class CountMinTopK:
    """Count-Min sketch with conservative update + exact top-k heap.

    Mergeable: ``merge`` takes element-wise max-free union (counters add;
    top candidates re-estimated). Estimates are upper bounds; with
    conservative update the overestimate is minimized."""

    def __init__(self, k: int, probability: float = 0.99, tolerance: float = 0.001):
        self.k = k
        self.width, self.depth = cms_params(probability, tolerance)
        self.table = [[0] * self.width for _ in range(self.depth)]
        self.candidates: dict[str, int] = {}  # key -> estimated count

    def _rows(self, key: str) -> list[int]:
        return [_bucket(key, r, self.width) for r in range(self.depth)]

    def estimate(self, key: str) -> int:
        return min(self.table[r][b] for r, b in enumerate(self._rows(key)))

    def push(self, key: str, count: int = 1) -> None:
        rows = self._rows(key)
        est = min(self.table[r][b] for r, b in enumerate(rows))
        new = est + count
        for r, b in enumerate(rows):
            # conservative update: only raise counters below the new est
            if self.table[r][b] < new:
                self.table[r][b] = new
        self._offer(key, new)

    def _offer(self, key: str, est: int) -> None:
        self.candidates[key] = est
        if len(self.candidates) > 4 * self.k:
            keep = sorted(self.candidates.items(), key=lambda kv: (-kv[1], kv[0]))[
                : 2 * self.k
            ]
            self.candidates = dict(keep)

    def merge(self, other: "CountMinTopK") -> "CountMinTopK":
        assert (self.width, self.depth) == (other.width, other.depth)
        for r in range(self.depth):
            mine, theirs = self.table[r], other.table[r]
            for b in range(self.width):
                mine[b] += theirs[b]
        for key in set(self.candidates) | set(other.candidates):
            self.candidates[key] = self.estimate(key)
        self._offer_trim()
        return self

    def _offer_trim(self) -> None:
        if len(self.candidates) > 4 * self.k:
            keep = sorted(self.candidates.items(), key=lambda kv: (-kv[1], kv[0]))[
                : 2 * self.k
            ]
            self.candidates = dict(keep)

    def top(self) -> list[tuple[str, int]]:
        return sorted(self.candidates.items(), key=lambda kv: (-kv[1], kv[0]))[: self.k]

    # -- serialization (partial-aggregate state) --
    def dumps(self) -> str:
        return json.dumps(
            {"k": self.k, "w": self.width, "d": self.depth, "t": self.table, "c": self.candidates}
        )

    @classmethod
    def loads(cls, s: str) -> "CountMinTopK":
        o = json.loads(s)
        sk = cls.__new__(cls)
        sk.k, sk.width, sk.depth = o["k"], o["w"], o["d"]
        sk.table, sk.candidates = o["t"], o["c"]
        return sk


def most_frequent_sketch(
    df: DataFrame,
    col: str,
    k: int,
    probability: float = 0.99,
    tolerance: float = 0.001,
    fan_in: int = 64,
) -> list[tuple[str, int]]:
    """Distributed most_frequent via CMS+TopK: per-partition partial
    sketches, **tree-merged** — an executor-side partial-merge level
    collapses every ``fan_in`` partials into one before the driver sees
    them, so the driver union is O(P / fan_in) instead of O(P). At 100 TB
    (~10⁵-10⁶ partitions) a flat driver loop serializes the job; the
    tree keeps it flat. Returns [(key, estimated_count)] — estimates are
    CMS upper bounds. Merging is order-independent for the counter table
    (sums); candidate-set trims only depend on order in deep-tie corner
    cases (same property as the reference's ReduceA→ReduceC fold tree).

    Topology: mapInPandas builds one sketch per INPUT partition with NO
    shuffle of raw rows; the only Exchange moves serialized sketches
    (width×depth ints each), grouped ``fan_in``-to-1.
    """

    def build(batches):
        # one sketch per INPUT partition: mapInPandas receives this
        # partition's Arrow batches as an iterator — accumulate, emit one
        # state row. (groupBy(spark_partition_id) would plan an Exchange
        # funnelling every partition's rows through one reducer — the
        # opposite of the zero-shuffle topology this function promises.)
        sk = CountMinTopK(k, probability, tolerance)
        saw = False
        for pdf in batches:
            saw = True
            for key, cnt in pdf[col].value_counts().items():
                sk.push(str(key), int(cnt))
        if saw:
            yield pd.DataFrame({"state": [sk.dumps()]})

    def _merge_states(states: list[str]) -> CountMinTopK:
        merged = CountMinTopK.loads(states[0])
        for s in states[1:]:
            merged.merge(CountMinTopK.loads(s))
        return merged

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"state": [_merge_states(list(pdf["state"])).dumps()]})

    states = df.select(F.col(col)).mapInPandas(build, schema="state string")
    n_parts = df.rdd.getNumPartitions()
    if n_parts > fan_in:
        # executor-side level: fan_in partials per reducer. spark_partition_id
        # of the states frame is the source partition (mapInPandas is 1:1),
        # so the grouping is deterministic and evenly spread.
        n_groups = math.ceil(n_parts / fan_in)
        states = (
            states.withColumn("g", F.spark_partition_id() % n_groups)
            .groupBy("g")
            .applyInPandas(merge_group, schema="state string")
        )
    partials = states.collect()
    if not partials:
        return []
    return _merge_states([row.state for row in partials]).top()


# ----- mergeable quantile sketch (merging t-digest) -------------------------


class TDigest:
    """Merging t-digest (Dunning & Ertl, public algorithm): centroid
    spans capped at one unit of the k1 (asin) scale function, so the
    centroid COUNT stays <= ~compression while tail resolution scales
    with q(1-q) — the standard mergeable quantile sketch. State is O(compression) (mean, weight) pairs
    regardless of input size; ``merge`` is re-compression of the
    concatenated centroid lists, which is what makes it a distributed
    partial aggregate (the reference's UnionAssign discipline,
    amadeus-streaming/src/traits.rs — re-implemented from the published
    papers, no code consulted).

    Estimates interpolate between centroid means; rank error is
    O(q(1-q)/compression). Not bit-deterministic across partitionings
    (centroid boundaries shift with merge order) — tests pin ERROR
    BOUNDS, and the registered query is rows-only by design."""

    def __init__(self, compression: int = 100):
        self.compression = compression
        self.centroids: list[tuple[float, float]] = []  # (mean, weight)
        self.total = 0.0

    def _k(self, q: float) -> float:
        # k1 scale function (Dunning & Ertl §2.2): centroid spans are
        # capped at one unit of k, giving <= ~compression centroids
        # TOTAL with tail resolution ∝ q(1-q)
        q = min(1.0, max(0.0, q))
        return self.compression / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)

    def _compress(self, cents: list[tuple[float, float]]) -> None:
        cents = sorted(cents)
        out: list[tuple[float, float]] = []
        cum = 0.0
        cur_m, cur_w = cents[0]
        for m, w in cents[1:]:
            q_l = cum / self.total if self.total else 0.0
            q_r = (cum + cur_w + w) / self.total if self.total else 1.0
            if self._k(q_r) - self._k(q_l) <= 1.0:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out.append((cur_m, cur_w))
                cum += cur_w
                cur_m, cur_w = m, w
        out.append((cur_m, cur_w))
        self.centroids = out

    def push_sorted(self, values) -> None:
        """Bulk add of a pre-sorted numeric array."""
        add = [(float(v), 1.0) for v in values]
        if not add:
            return
        self.total += len(add)
        self._compress(self.centroids + add)

    def merge(self, other: "TDigest") -> "TDigest":
        if not other.centroids:
            return self
        self.total += other.total
        if not self.centroids:
            self.centroids = list(other.centroids)
            return self
        self._compress(self.centroids + other.centroids)
        return self

    def quantile(self, q: float) -> float:
        if not self.centroids:
            return float("nan")
        if len(self.centroids) == 1:
            return self.centroids[0][0]
        target = q * self.total
        cum = 0.0
        for i, (m, w) in enumerate(self.centroids):
            if cum + w >= target:
                # interpolate within the centroid toward its neighbors
                lo = self.centroids[i - 1][0] if i > 0 else m
                hi = self.centroids[i + 1][0] if i + 1 < len(self.centroids) else m
                frac = (target - cum) / w if w else 0.0
                left = (lo + m) / 2.0
                right = (m + hi) / 2.0
                return left + (right - left) * frac
            cum += w
        return self.centroids[-1][0]

    # -- serialization (partial-aggregate state) --
    def dumps(self) -> str:
        return json.dumps(
            {"c": self.compression, "n": self.total, "cs": self.centroids}
        )

    @classmethod
    def loads(cls, s: str) -> "TDigest":
        o = json.loads(s)
        d = cls(o["c"])
        d.total = o["n"]
        d.centroids = [tuple(c) for c in o["cs"]]
        return d


def quantile_sketch(
    df: DataFrame, col: str, compression: int = 100, fan_in: int = 64
) -> TDigest:
    """Distributed quantile sketch: one t-digest per input partition via
    mapInPandas (zero shuffle of raw rows), partials tree-merged with
    the same executor-side ``fan_in`` level as most_frequent_sketch /
    bloom (the driver sees O(P/fan_in) states of O(compression) floats).
    The exact-percentile alternative shuffles and sorts every value;
    this shuffles ~compression·16 bytes per partition — the 100 TB
    trade the reference's sketch family exists for."""

    def build(batches):
        d = TDigest(compression)
        saw = False
        for pdf in batches:
            vals = pdf[col].dropna().to_numpy()
            if len(vals):
                saw = True
                vals.sort()
                d.push_sorted(vals)
        if saw:
            yield pd.DataFrame({"state": [d.dumps()]})

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        it = list(pdf["state"])
        merged = TDigest.loads(it[0])
        for s in it[1:]:
            merged.merge(TDigest.loads(s))
        return pd.DataFrame({"state": [merged.dumps()]})

    states = df.select(F.col(col)).mapInPandas(build, schema="state string")
    n_parts = df.rdd.getNumPartitions()
    if n_parts > fan_in:
        n_groups = math.ceil(n_parts / fan_in)
        states = (
            states.withColumn("g", F.spark_partition_id() % n_groups)
            .groupBy("g")
            .applyInPandas(merge_group, schema="state string")
        )
    partials = [r.state for r in states.collect()]
    if not partials:
        return TDigest(compression)
    merged = TDigest.loads(partials[0])
    for s in partials[1:]:
        merged.merge(TDigest.loads(s))
    return merged
