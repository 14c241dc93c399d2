from distributed_deduplicator_spark.functions import text  # noqa: F401

__all__ = ["text"]
