from distributed_deduplicator_spark.sources.fixtures import (
    TABLES,
    fanout,
    load_table,
    load_all,
    register_views,
)

__all__ = ["TABLES", "fanout", "load_table", "load_all", "register_views"]
