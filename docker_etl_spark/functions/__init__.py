"""Scalar Column-function library (SURVEY.md §2.8, §2.9 F1-F4)."""

from docker_etl_spark.functions.scalars import (  # noqa: F401
    bug_id_from_bugzilla_url,
    decimal_money,
    deterministic_order_key,
    extract_array,
    host_variants,
    safe_divide,
    truncate_version,
    url_host,
    url_parse,
)
from docker_etl_spark.functions.histograms import (  # noqa: F401
    hist_count_at0,
    hist_enum_nz,
    hist_extract,
    hist_sum_maps,
)
