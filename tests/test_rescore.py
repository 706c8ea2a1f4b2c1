"""Rescore lifecycle tests — mirrors the reference's
tests/test_metrics_rescores.py parametrized staging/archive cases,
plus the TOML round-trip, one-at-a-time rule, and plan-snapshot
archive on the demo project."""

from __future__ import annotations

import pytest

from docker_etl_spark.plans.rescore import (
    Rescore,
    SchemaRef,
    dump,
    get_undeployed_rescores,
    load,
    pick_rescore_to_deploy,
    update,
)

FIXTURE = "/root/repo/fixtures/demo_project"


@pytest.mark.parametrize(
    "kind,expected",
    [
        ("table", SchemaRef("dataset", "rescore_test_name")),
        ("view", SchemaRef("dataset", "rescore_test_name")),
        ("routine", SchemaRef("dataset", "RESCORE_TEST_name")),
    ],
)
def test_staging_ref(kind, expected):
    rescore = Rescore("test", "reason", (), False)
    assert rescore.staging_ref(kind, SchemaRef("dataset", "name")) == expected


@pytest.mark.parametrize(
    "kind,expected",
    [
        ("table", SchemaRef("dataset_archive", "name_before_rescore_test")),
        ("view", SchemaRef("dataset_archive", "name_before_rescore_test")),
        ("routine", SchemaRef("dataset_archive", "name_BEFORE_RESCORE_TEST")),
    ],
)
def test_archive_ref(kind, expected):
    rescore = Rescore("test", "reason", (), False)
    assert rescore.archive_ref(kind, SchemaRef("dataset", "name")) == expected


def test_delta_and_routine_maps():
    r = Rescore(
        "test", "reason", (SchemaRef("analytics", "PRIORITY_RANK"),), False
    )
    assert r.delta_ref("analytics") == SchemaRef("analytics", "rescore_test_delta")
    assert r.staging_routine_refs() == {
        SchemaRef("analytics", "PRIORITY_RANK"): SchemaRef(
            "analytics", "RESCORE_TEST_PRIORITY_RANK"
        )
    }
    assert r.archive_routine_refs() == {
        SchemaRef("analytics", "PRIORITY_RANK"): SchemaRef(
            "analytics_archive", "PRIORITY_RANK_BEFORE_RESCORE_TEST"
        )
    }


def test_load_rescores_toml():
    rs = load(FIXTURE, default_dataset="analytics")
    assert set(rs) == {"ranks_update", "experimental_weights"}
    r = rs["ranks_update"]
    assert r.reason == "priority rank formula refresh"
    assert r.routine_updates == (SchemaRef("analytics", "PRIORITY_RANK"),)
    assert not r.stage
    assert rs["experimental_weights"].stage


def test_dump_round_trips(tmp_path):
    rs = load(FIXTURE, default_dataset="analytics")
    proj = tmp_path / "proj"
    (proj / "metrics").mkdir(parents=True)
    (proj / "metrics" / "rescores.toml").write_text(dump(rs))
    again = load(proj, default_dataset="analytics")
    assert again == rs


def test_update_adds_entry_and_respects_dry_run(tmp_path):
    proj = tmp_path / "proj"
    (proj / "metrics").mkdir(parents=True)
    (proj / "metrics" / "rescores.toml").write_text(
        '[a]\nreason = "r"\nroutine_updates = ["ds.f"]\n'
    )
    new = Rescore("b", "new reason", (SchemaRef("ds", "g"),), True)
    text = update(proj, new, write=False)  # dry run: returns, no write
    assert "[b]" in text
    assert "[b]" not in (proj / "metrics" / "rescores.toml").read_text()
    update(proj, new, write=True)
    got = load(proj, default_dataset="ds")
    assert got["b"] == new and got["a"].reason == "r"


def test_one_at_a_time_rule():
    rs = load(FIXTURE, default_dataset="analytics")
    # staged rescores never count as undeployed
    assert set(get_undeployed_rescores(rs, set())) == {"ranks_update"}
    assert pick_rescore_to_deploy(rs, set()).name == "ranks_update"
    assert pick_rescore_to_deploy(rs, {"ranks_update"}) is None
    two = dict(rs)
    two["second"] = Rescore("second", "x", (), False)
    with pytest.raises(ValueError, match="one rescore at a time"):
        pick_rescore_to_deploy(two, set())


def test_archive_objects_snapshots_plan(spark, sf_dir):
    """Archiving must freeze the CURRENT view output: after the
    underlying routine is redeployed with new logic, the archive
    still answers with pre-rescore values (the reference's
    *_before_rescore_* contract)."""
    from docker_etl_spark.plans.projectdata import FileProject
    from docker_etl_spark.plans.rescore import archive_objects
    from docker_etl_spark.sources.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    project = FileProject(
        spark,
        FIXTURE,
        table_bindings={"analytics.priority_orders": orders},
        prefix="rsc_",
    )
    project.deploy()
    rescore = Rescore("test", "reason", (), False)
    ref = SchemaRef("analytics", "orders_enriched")
    [arch_phys] = archive_objects(project, rescore, [("view", ref)])
    assert arch_phys == "rsc_analytics_archive__orders_enriched_before_rescore_test"
    before = spark.table(arch_phys).agg({"priority_rank": "sum"}).collect()[0][0]
    # redeploy the routine with different logic; live view shifts,
    # archive must not
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rsc_analytics__PRIORITY_RANK("
        "priority STRING) RETURNS INT RETURN 99"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW rsc_analytics__orders_enriched AS "
        "SELECT rsc_analytics__PRIORITY_RANK(o_orderpriority) AS priority_rank "
        "FROM rsc_analytics__priority_orders"
    )
    live = (
        spark.table("rsc_analytics__orders_enriched")
        .agg({"priority_rank": "sum"})
        .collect()[0][0]
    )
    after = spark.table(arch_phys).agg({"priority_rank": "sum"}).collect()[0][0]
    assert live != before
    assert after == before
    with pytest.raises(ValueError, match="routines are archived"):
        archive_objects(project, rescore, [("routine", ref)])
