from amadeus_spark.plans.barrier import plan_barrier
from amadeus_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_python_udf,
    assert_pushed_filters,
    assert_read_schema,
    plan_text,
    shuffle_count,
    single_partition_windows,
)

__all__ = [
    "plan_barrier",
    "plan_text",
    "shuffle_count",
    "assert_pushed_filters",
    "assert_read_schema",
    "assert_broadcast_join",
    "assert_no_python_udf",
    "single_partition_windows",
]
