from amadeus_spark.streaming import events

__all__ = ["events"]
