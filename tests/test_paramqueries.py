"""Typed-parameter query catalog tests (reference redashdata.py
validation semantics: enum membership, type coercion, defaults,
unknown-parameter rejection, date-range expansion)."""

from __future__ import annotations

import datetime as dt

import pytest

from docker_etl_spark.plans.paramqueries import (
    ParamSpec,
    load_query_catalog,
    load_query_dir,
)

FIXTURE = "/root/repo/fixtures/demo_dashboards"


def test_catalog_loads_and_binds_defaults():
    cat = load_query_catalog(FIXTURE)
    tpl = cat["orders_by_priority"]
    args = tpl.bind()
    assert args["status"] == "O"
    assert args["min_total"] == 150000
    assert args["window_start"] == dt.date(1996, 1, 1)
    assert args["window_end"] == dt.date(1997, 12, 31)


def test_enum_membership_enforced():
    tpl = load_query_dir(FIXTURE + "/queries/orders_by_priority")
    with pytest.raises(ValueError, match="not in enum"):
        tpl.bind({"status": "X"})
    assert tpl.bind({"status": "F"})["status"] == "F"


def test_unknown_and_missing_parameters_rejected():
    tpl = load_query_dir(FIXTURE + "/queries/orders_by_priority")
    with pytest.raises(ValueError, match="unknown parameters"):
        tpl.bind({"nope": 1})
    no_default = ParamSpec("d", "date")
    tpl.params["d"] = no_default
    with pytest.raises(ValueError, match="no value"):
        tpl.bind()
    del tpl.params["d"]


def test_type_coercions_and_rejections():
    assert ParamSpec("n", "number").coerce(3.5) == 3.5
    with pytest.raises(ValueError, match="expected number"):
        ParamSpec("n", "number").coerce("3")
    with pytest.raises(ValueError, match="expected number"):
        ParamSpec("n", "number").coerce(True)  # bool is not a number
    assert ParamSpec("d", "date").coerce("2024-02-29") == dt.date(2024, 2, 29)
    with pytest.raises(ValueError):
        ParamSpec("d", "date").coerce("not-a-date")
    rng = ParamSpec("w", "date-range").coerce(
        {"start": "2024-01-01", "end": "2024-01-02"}
    )
    assert rng == {"start": dt.date(2024, 1, 1), "end": dt.date(2024, 1, 2)}
    with pytest.raises(ValueError, match="start after end"):
        ParamSpec("w", "date-range").coerce(
            {"start": "2024-01-03", "end": "2024-01-02"}
        )


def test_supplied_values_change_results(spark, sf_dir):
    from docker_etl_spark.sources.io import load_table

    cat = load_query_catalog(FIXTURE)
    tpl = cat["orders_by_priority"]
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    base = tpl.run(spark).agg({"n_orders": "sum"}).collect()[0][0]
    narrowed = (
        tpl.run(spark, {"min_total": 400000})
        .agg({"n_orders": "sum"})
        .collect()[0][0]
    )
    assert narrowed is None or narrowed < base
