"""Sparse-histogram algebra (SURVEY.md §1.1 Histogram, §2.9 F2/F4).

The reference models telemetry histograms as sparse
``{bucket -> count}`` dicts — deliberately sparse, because dense
encoding "ballooned memory ~50-100x" (update_orphaning_dashboard/
sql/out_of_date_details.sql:28-36, processing.py:78-85). The engine
keeps that choice: histograms are ``map<int,bigint>`` columns and all
algebra stays in higher-order functions (JVM-side, no shuffle, no
densify).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hist_extract(json_str: Column | str) -> Column:
    """``mozfun.hist.extract`` equivalent (F4): parse a telemetry
    histogram JSON payload's ``values`` field into map<int,bigint>.

    Reference usage: out_of_date_details.sql:57,67.
    """
    c = F.col(json_str) if isinstance(json_str, str) else json_str
    parsed = F.from_json(c, "struct<values:map<string,bigint>>")
    entries = F.map_entries(parsed["values"])
    return F.map_from_entries(
        F.transform(entries, lambda e: F.struct(e["key"].cast("int").alias("key"), e["value"].alias("value")))
    )


def hist_count_at0(hist: Column | str) -> Column:
    """Temp-UDF ``count_at0`` (F2): count in bucket 0.

    Reference: out_of_date_details.sql:56-63.
    """
    c = F.col(hist) if isinstance(hist, str) else hist
    return F.coalesce(F.element_at(c, F.lit(0)), F.lit(0))


def hist_enum_nz(hist: Column | str) -> Column:
    """Temp-UDF ``enum_nz`` (F2): non-zero buckets of an enumerated
    histogram, as a sorted array<struct<key,value>>.

    Reference: out_of_date_details.sql:64-73.
    """
    c = F.col(hist) if isinstance(hist, str) else hist
    nz = F.map_filter(c, lambda k, v: v > 0)
    return F.sort_array(F.map_entries(nz))


def hist_sum_maps(hists: Column) -> Column:
    """Element-wise sum of an array of sparse histograms (A10) —
    shuffle-free per-row reduction via higher-order aggregate.

    For the grouped variant (sum histograms across rows), explode +
    groupBy(bucket) remains the scalable formulation; this HOF form
    covers the per-entity longitudinal reduce
    (update_orphaning_dashboard/processing.py:68-117).
    """
    return F.aggregate(
        hists,
        F.create_map().cast("map<int,bigint>"),
        lambda acc, h: F.map_zip_with(
            acc, h, lambda _k, v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0))
        ),
    )
