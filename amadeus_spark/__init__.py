"""amadeus_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of constellation-rs/amadeus (the reference).

Design stance (see SURVEY.md): declare logical plans with the DataFrame/SQL
API and let Catalyst + Tungsten pick the physical strategy. Custom code only
where Spark genuinely lacks the semantics (sketches, WARC parsing, as-of
joins, LLM-pipeline operators); those drop to Pandas UDFs / applyInPandas.

Public surface:
    from amadeus_spark import get_spark, load_tables
    from amadeus_spark.operators import aggregates, joins, sketches, sampling
    from amadeus_spark.functions import text, dedup, similarity
"""

from amadeus_spark.cache import release_cached
from amadeus_spark.session import get_spark
from amadeus_spark.tables import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES", "release_cached"]

__version__ = "0.1.0"
