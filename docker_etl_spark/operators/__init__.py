"""Named relational operators from the SURVEY.md §2 inventory."""

from docker_etl_spark.operators.dedupe import (  # noqa: F401
    dedupe_latest_per_key,
    dedupe_min_by_join,
    dedupe_natural_key,
)
from docker_etl_spark.operators.aggregates import (  # noqa: F401
    conditional_counts,
    ordered_limited_collect,
    group_percentiles,
    elementwise_vector_sum,
    jackknife_sum_ci,
)
from docker_etl_spark.operators.windows import (  # noqa: F401
    lag_features,
    moving_average,
    share_of_total,
)
from docker_etl_spark.operators.joins import (  # noqa: F401
    date_spine,
    range_join_active_at,
    stratified_sampling_join,
    semi_join,
    anti_join,
)
