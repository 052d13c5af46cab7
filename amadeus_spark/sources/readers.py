"""File sources — SURVEY.md §2.1.

The reference implements CSV (amadeus-serde/src/csv.rs), JSON (json.rs), a
full vendored Parquet reader (amadeus-parquet/), Postgres COPY BINARY
(amadeus-postgres/), and in-memory collections (amadeus-core/src/
into_par_stream/). On Spark, the readers themselves are built-in; what we
preserve from the reference is its *semantics*:

- **Gradual typing** (README.md:31): every source is readable either with
  an explicit schema ("typed", ≈ #[derive(Data)] structs) or dynamically
  ("untyped", ≈ Value) — and the two must agree (`tests/csv.rs:45-59`).
  Typed = ``.schema(...)``; dynamic = ``inferSchema``/default inference.
- **CSV has no headers** in the reference (csv.rs:113 sets
  has_headers(false)) → header=False, positional `_c0.._cN` ≈ a
  positional Group with field_names=None (group.rs:20).
- **Unsigned widening** (SURVEY §1.2): u8→short, u16→int, u32→long,
  u64→decimal(20,0) — Spark has no unsigned ints.
- **Projection pushdown** is Catalyst's column pruning; verified in
  tests by asserting ReadSchema on the scan node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: amadeus Value variant → Spark type (SURVEY §1.2 table;
#: amadeus-types/src/value.rs:91-157)
AMADEUS_TYPE_MAP: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "u8": T.ShortType(),
    "i8": T.ByteType(),
    "u16": T.IntegerType(),
    "i16": T.ShortType(),
    "u32": T.LongType(),
    "i32": T.IntegerType(),
    "u64": T.DecimalType(20, 0),
    "i64": T.LongType(),
    "f32": T.FloatType(),
    "f64": T.DoubleType(),
    "date": T.DateType(),
    "time": T.LongType(),  # µs from midnight; Spark has no TimeType
    "datetime": T.TimestampType(),
    "datetime_notz": T.TimestampNTZType(),
    "timezone": T.StringType(),  # IANA id
    "decimal": T.DecimalType(38, 18),
    "bson": T.BinaryType(),
    "string": T.StringType(),
    "json": T.StringType(),
    "enum": T.StringType(),
    "url": T.StringType(),
    "ip": T.StringType(),
    "webpage": T.StructType(
        [
            T.StructField("ip", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("contents", T.BinaryType()),
        ]
    ),
}


def schema_from_amadeus(fields: list[tuple[str, str, bool]]) -> T.StructType:
    """Build a Spark schema from (name, amadeus_type, nullable) triples —
    the typed-struct path (≈ #[derive(Data)])."""
    return T.StructType(
        [
            T.StructField(name, AMADEUS_TYPE_MAP[atype], nullable)
            for name, atype, nullable in fields
        ]
    )


#: per-row Result semantics (amadeus-serde yields Result<T, CsvError> /
#: Result<T, JsonError> PER ROW — csv.rs:47-65, json.rs:18-40):
#: 'permissive' keeps bad rows with nulls + the raw line in
#: ``_corrupt_record`` (≈ Err carried alongside Ok rows), 'drop' discards
#: them (≈ filter_map(Result::ok)), 'fail' aborts on the first (≈ .?).
_ERROR_MODES = {"permissive": "PERMISSIVE", "drop": "DROPMALFORMED", "fail": "FAILFAST"}


def _with_error_mode(reader, schema: T.StructType | None, errors: str):
    mode = _ERROR_MODES[errors]
    reader = reader.option("mode", mode)
    if errors == "permissive" and schema is not None:
        # Spark populates the corrupt column only when it's in the schema
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    return reader, schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = False,
    errors: str = "permissive",
) -> DataFrame:
    """CSV source (amadeus-serde/src/csv.rs:47-135). Typed when ``schema``
    given, dynamic (inferSchema → positional _c0.._cN) otherwise.
    ``errors`` maps the reference's per-row Result to Spark malformed-row
    modes (see _ERROR_MODES)."""
    reader = spark.read.option("header", header)
    reader, schema = _with_error_mode(reader, schema, errors)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    errors: str = "permissive",
) -> DataFrame:
    """JSON source (amadeus-serde/src/json.rs:18-120): newline-delimited;
    dynamic mode infers a named Group ≈ inferred struct. ``errors`` maps
    the reference's per-row Result to Spark malformed-row modes."""
    reader, schema = _with_error_mode(spark.read, schema, errors)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Parquet source (amadeus-parquet/src/lib.rs:75-158). The reference's
    projection-at-parse (record/predicates.rs) is Catalyst column pruning:
    select() reaches the scan as ReadSchema."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def variant_cells(df: DataFrame, json_col: str, out_col: str = "v") -> DataFrame:
    """Native mapping for the reference's dynamic ``Value`` cells
    (amadeus-types/src/value.rs:148-153: Value::Json and heterogeneous
    Map<Value, Value>): parse the JSON-string cell ONCE into Spark 4's
    VARIANT type. Downstream code extracts typed leaves on use with
    ``try_variant_get(v, '$.path', 'type')`` — schema-on-read like the
    reference's Value enum, but without re-parsing the string per field
    access (VARIANT stores a binary-encoded tree; extraction is an
    offset walk, and shredded readers can push it into the scan).
    ``schema_of_variant`` gives the per-row dynamic shape."""
    return df.withColumn(out_col, F.parse_json(F.col(json_col)))


def read_parquet_filtered(
    spark: SparkSession, path: str, path_glob: str
) -> DataFrame:
    """Path-based partition selection — the reference's
    ``Directory::partitions_filter(|path| ...)`` (amadeus-core/src/
    file.rs:186-193): only files matching the glob are listed, so the
    filter prunes at *listing* time, before any read."""
    return spark.read.option("pathGlobFilter", path_glob).parquet(path)


def read_postgres(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Postgres source (amadeus-postgres/src/lib.rs:62-245). The reference
    parallelizes by (url, table) pairs; JDBC parallelizes by
    partitionColumn ranges — strictly more granular. Column pruning and
    filter pushdown are built into the JDBC source (SURVEY §4)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({table_or_query}) q" if " " in table_or_query.strip() else table_or_query)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def from_collection(spark: SparkSession, data, schema=None) -> DataFrame:
    """In-memory source (amadeus-core/src/into_par_stream/collections.rs:
    24-351): Vec/HashMap/… → stream ≈ createDataFrame (Arrow path for
    pandas input)."""
    return spark.createDataFrame(data, schema=schema)


# ---- sinks ---------------------------------------------------------------
# The reference declares Destination but ships no writer (README.md:60-73
# marks Postgres/Parquet writers WIP); Spark's df.write covers all of them.


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = False) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC source (beyond the reference — a standard lakehouse columnar
    format Spark supports natively). Same pruning/pushdown posture as
    read_parquet: select() reaches the scan as ReadSchema, filters push
    to the ORC reader (PushedFilters)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML source (beyond the reference — Spark 4 ships the former
    spark-xml as a built-in format). Typed when ``schema`` is given,
    dynamic (schema inference over the row elements) otherwise — the
    same typed/dynamic dual every other source here exposes. XML files
    split by row tag across tasks, so a directory of documents reads
    distributed like any other source."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )
