from amadeus_spark.functions import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
