from amadeus_spark.functions import dedup, multimodal, similarity, sketch_lib, text

__all__ = ["dedup", "multimodal", "similarity", "sketch_lib", "text"]
