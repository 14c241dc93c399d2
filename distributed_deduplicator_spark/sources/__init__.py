from distributed_deduplicator_spark.sources.fixtures import (
    TABLES,
    load_table,
    load_all,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_all", "register_views"]
