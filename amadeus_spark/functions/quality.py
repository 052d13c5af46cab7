"""Declarative data-quality expectations (the deequ/Great-Expectations
shape, Spark-first): a constraint suite evaluates in as few passes as
the constraint types allow and returns one tidy violations report —
the validation gate a production pipeline runs before publishing a
table.

Three constraint families, each with its minimal physical plan:

- **row predicates** (non-null, range, set membership, regex): ALL of
  them fold into ONE conditional aggregate over a single scan — adding
  a predicate adds a column, never a pass;
- **uniqueness** over a key tuple: count(*) - count(distinct struct)
  in the same single-scan aggregate (no groupBy materialization);
- **referential integrity** (foreign key): one LEFT ANTI join per
  referenced table, counted — broadcast when the dimension is small
  (AQE decides; no forced broadcast).

Reference anchor: amadeus validates per-row through its typed
deserializers (Result-per-row, amadeus-serde); this is the table-level
generalization a warehouse needs. Beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame,
    predicates: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
    foreign_keys: dict[str, tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Evaluate a constraint suite; returns (check STRING,
    violations BIGINT) with one row per named check, ordered by name.

    predicates: name -> boolean Column that must hold per row.
    unique_keys: name -> column tuple that must be unique.
    foreign_keys: name -> (referenced_df, local_col, referenced_col);
        violations = rows whose NON-NULL local value has no match (SQL
        foreign-key semantics: a NULL FK passes — and NOT IN oracles
        would silently disagree on NULLs otherwise).
    """
    # internal aliases are positional (__c0..__cN): user-supplied check
    # names never become SQL identifiers, and they enter the stack()
    # call only as escaped string literals — a name with spaces or
    # quotes is data, not syntax.
    names = list(predicates) + list(unique_keys or {})
    if names:
        # every aggregate coalesces to 0: on an EMPTY input frame F.sum
        # over zero rows is NULL, and a NULL violation count would
        # stringify as 'None' under the strict gate compare (and read as
        # "violated" to a human) — an empty table violates nothing.
        aggs = [
            F.coalesce(F.sum(F.when(~pred, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"__c{i}")
            for i, (_, pred) in enumerate(predicates.items())
        ]
        for j, cols in enumerate((unique_keys or {}).values()):
            key = F.struct(*[F.col(c) for c in cols])
            aggs.append(
                F.coalesce(F.count(key) - F.count_distinct(key), F.lit(0))
                .cast("long")
                .alias(f"__c{len(predicates) + j}")
            )
        wide = df.agg(*aggs)
        lits = ", ".join(
            "'{}', __c{}".format(n.replace("'", "''"), i)
            for i, n in enumerate(names)
        )
        report = wide.selectExpr(
            f"stack({len(names)}, {lits}) AS (check, violations)"
        )
    else:
        # no row-level checks: stack(0, ) would be a syntax error —
        # start from an empty report and let FK checks union in.
        report = df.sparkSession.createDataFrame(
            [], "check string, violations long"
        )
    for name, (ref, local, remote) in (foreign_keys or {}).items():
        orphans = (
            df.select(F.col(local))
            .filter(F.col(local).isNotNull())
            .join(
                ref.select(F.col(remote).alias(local)).distinct(),
                local,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(F.lit(name).alias("check"), "violations")
        )
        report = report.unionByName(orphans)
    return report.orderBy("check")
