from amadeus_spark.operators import aggregates, joins, sampling, sketches, transforms

__all__ = ["aggregates", "joins", "sampling", "sketches", "transforms"]
