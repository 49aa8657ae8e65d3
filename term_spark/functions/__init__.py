from term_spark.functions.datetime import epoch_seconds

__all__ = ["epoch_seconds"]
