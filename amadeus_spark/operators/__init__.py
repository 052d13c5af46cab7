# NOTE: operators.udaf is intentionally NOT imported here — its
# @pandas_udf decorators require an active SparkSession at import time;
# import it after creating a session (as __spark_entry__.q_fold_udaf does).
from amadeus_spark.operators import (
    aggregates,
    joins,
    sampling,
    sketches,
    storage,
    transforms,
)

__all__ = ["aggregates", "joins", "sampling", "sketches", "storage", "transforms"]
