from multi_threaded_mapreduce_framework_spark.sources.fixtures import (
    TABLES,
    load_table,
    register_views,
    table_path,
)

__all__ = ["TABLES", "load_table", "register_views", "table_path"]
