"""Catalog/templating and incremental-orchestration layer."""

from docker_etl_spark.plans.catalog import Project, ViewDef  # noqa: F401
from docker_etl_spark.plans.incremental import (  # noqa: F401
    WatermarkStore,
    incremental_append,
)
