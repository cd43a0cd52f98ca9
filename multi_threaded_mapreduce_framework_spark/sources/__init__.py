from multi_threaded_mapreduce_framework_spark.sources.fixtures import (
    TABLES,
    layout_tag,
    load_table,
    register_views,
    spread_small_scan,
    table_path,
)
from multi_threaded_mapreduce_framework_spark.sources.pydatasource import (
    DocGenDataSource,
    JsonlDataSource,
    register_python_sources,
)

__all__ = [
    "TABLES",
    "layout_tag",
    "load_table",
    "register_views",
    "spread_small_scan",
    "table_path",
    "DocGenDataSource",
    "JsonlDataSource",
    "register_python_sources",
]
