"""IO layer: batch sources and sinks."""

from docker_etl_spark.sources.io import (  # noqa: F401
    TableCatalog,
    load_table,
    load_tables,
    write_table,
)
