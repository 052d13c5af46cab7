"""Nested-type coverage (VERDICT r1 item #1): array/map/struct *data*
queries vs the DuckDB oracle + the reference's typed/dynamic parity
discipline over nested parquet (tests/parquet.rs:113-290 reads
nested_lists/nested_maps both as static types and as dynamic Value;
here: explicit StructType schema vs schema inference)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amadeus_spark.operators import nested
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_matches


def _li(spark):
    import os

    return spark.read.parquet(os.path.join(SF_ORACLE, "lineitem.parquet"))


def test_nested_array_ops_oracle(spark, duck):
    got = nested.nested_array_ops(_li(spark))
    assert_matches("nested_array_ops", got, duck.sql(nested.nested_array_ops_oracle()))


def test_nested_struct_map_oracle(spark, duck):
    got = nested.nested_struct_map(_li(spark))
    assert_matches("nested_struct_map", got, duck.sql(nested.nested_struct_map_oracle()))


NESTED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("tags", T.ArrayType(T.LongType())),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("score", T.DoubleType()),
                    T.StructField("deep", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType())),
        T.StructField("pairs", T.ArrayType(
            T.StructType([
                T.StructField("k", T.StringType()),
                T.StructField("v", T.LongType()),
            ])
        )),
    ]
)

NESTED_ROWS = [
    (1, [1, 2, 3], ("a", 0.5, ["x", "y"]), {"p": 1, "q": 2}, [("k1", 10)]),
    (2, [], ("b", -1.0, []), {}, []),
    (3, None, (None, None, None), None, None),
    (4, [7], ("d", 2.25, ["z"]), {"r": 9}, [("k2", 20), ("k3", 30)]),
]


@pytest.fixture(scope="module")
def nested_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("nested") / "nested.parquet")
    spark.createDataFrame(NESTED_ROWS, NESTED_SCHEMA).repartition(2).write.parquet(p)
    return p


def _canon(df):
    return sorted(str(r) for r in df.collect())


def test_nested_typed_vs_dynamic_read_parity(spark, nested_path):
    """Same nested file read with an explicit schema (typed) and with
    inference (dynamic) must yield identical rows AND identical schema —
    the reference's typed↔Value downcast round-trip, Spark-style."""
    typed = spark.read.schema(NESTED_SCHEMA).parquet(nested_path)
    dynamic = spark.read.parquet(nested_path)
    assert typed.schema == dynamic.schema
    assert _canon(typed) == _canon(dynamic)


def test_nested_ops_round_trip(spark, nested_path):
    """Operate on every nested shape in one query: array HOF, struct
    field access (2 deep), map key access, array-of-struct explode."""
    df = spark.read.parquet(nested_path)
    flat = df.select(
        "id",
        F.expr("aggregate(tags, 0L, (a, x) -> a + x)").alias("tag_sum"),
        F.col("meta.name").alias("name"),
        F.try_element_at("meta.deep", F.lit(1)).alias("deep1"),
        F.try_element_at("attrs", F.lit("p")).alias("p_val"),
        F.expr("aggregate(transform(pairs, s -> s.v), 0L, (a, x) -> a + x)").alias("pair_sum"),
    )
    rows = {r.id: r for r in flat.collect()}
    assert rows[1].tag_sum == 6 and rows[1].name == "a" and rows[1].deep1 == "x"
    assert rows[1].p_val == 1 and rows[1].pair_sum == 10
    assert rows[2].tag_sum == 0 and rows[2].pair_sum == 0
    assert rows[3].tag_sum is None and rows[3].name is None
    assert rows[4].pair_sum == 50


def test_nested_schema_pruning(spark, nested_path):
    """Selecting one struct field must prune the ReadSchema to that leaf
    (nested column pruning) — reads of meta.score/deep would be waste."""
    df = spark.read.parquet(nested_path).select(F.col("meta.name"))
    from amadeus_spark import plans

    txt = plans.plan_text(df)
    rs = [ln for ln in txt.splitlines() if "ReadSchema" in ln]
    assert rs and "name" in rs[0] and "score" not in rs[0], txt


def test_nested_duckdb_cross_engine_read(spark, nested_path, duck):
    """The nested file Spark wrote is readable by DuckDB with the same
    scalar projections — cross-engine nested parquet compatibility."""
    got = duck.sql(
        f"""
        SELECT id, CAST(COALESCE(list_sum(tags), 0) AS BIGINT) AS tag_sum, meta.name AS name
        FROM read_parquet('{nested_path}/*.parquet') ORDER BY id
        """
    ).fetchall()
    exp = {1: (6, "a"), 2: (0, "b"), 3: (0, None), 4: (7, "d")}
    for id_, tag_sum, name in got:
        assert (tag_sum, name) == exp[id_]
