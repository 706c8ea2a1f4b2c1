"""Schema-update orchestration tests (reference
etl/update_schema.py:295-474 updaters + :551-623 hash-gated loop):
unchanged projects deploy nothing; a changed declaration deploys
exactly the affected object plus its transitive dependents."""

from __future__ import annotations

import shutil

import pytest

from docker_etl_spark.plans.projectdata import FileProject, tree_hash
from docker_etl_spark.sources.io import load_table

FIXTURE = "/root/repo/fixtures/demo_project"


@pytest.fixture()
def proj_dir(tmp_path):
    dst = tmp_path / "proj"
    shutil.copytree(FIXTURE, dst)
    return dst


def _project(spark, sf_dir, root, prefix):
    orders = load_table(spark, sf_dir, "orders")
    return FileProject(
        spark,
        root,
        table_bindings={"analytics.priority_orders": orders},
        prefix=prefix,
    )


def test_tree_hash_tracks_content(proj_dir):
    h0 = tree_hash(proj_dir)
    assert h0 == tree_hash(proj_dir)  # deterministic
    toml = proj_dir / "sql/analytics/tables/priority_orders/table.toml"
    toml.write_text(toml.read_text() + '\n[extra]\ntype = "STRING"\n')
    assert tree_hash(proj_dir) != h0


def test_unchanged_project_deploys_nothing(spark, sf_dir, proj_dir):
    p = _project(spark, sf_dir, proj_dir, prefix="up1_")
    first = p.update_if_needed()
    assert len(first) == len(p.deploy_order())  # cold start: everything
    assert p.update_if_needed() == []  # same tree hash: untouched
    # the log recorded exactly one run with the current hash
    t, h = p.get_last_update()
    assert h == tree_hash(proj_dir) and t is not None


def test_added_nested_field_redeploys_table_and_dependents(
    spark, sf_dir, proj_dir
):
    p = _project(spark, sf_dir, proj_dir, prefix="up2_")
    p.update_if_needed()
    toml = proj_dir / "sql/analytics/tables/priority_orders/table.toml"
    toml.write_text(
        toml.read_text()
        + '\n[audit]\ntype = "RECORD"\n[audit.fields.loaded_at]\ntype = "DATETIME"\n'
    )
    out = p.update_if_needed()
    assert set(out) == {
        "up2_analytics__priority_orders",
        "up2_analytics__orders_enriched",  # refs priority_orders
        "up2_reporting__priority_rollup",  # refs orders_enriched
    }
    # untouched siblings must NOT redeploy: import_runs, PRIORITY_RANK
    assert "up2_analytics__import_runs" not in out
    assert "up2_analytics__PRIORITY_RANK" not in out
    # and the deployed table now carries the nested field
    assert "audit" in spark.table("up2_analytics__priority_orders").columns


def test_view_text_edit_redeploys_view_and_dependents(
    spark, sf_dir, proj_dir
):
    p = _project(spark, sf_dir, proj_dir, prefix="up3_")
    p.update_if_needed()
    sql = proj_dir / "sql/analytics/views/orders_enriched/view.sql"
    sql.write_text(sql.read_text().replace("o_totalprice,", "o_totalprice, o_orderpriority,"))
    out = p.update_if_needed()
    assert set(out) == {
        "up3_analytics__orders_enriched",
        "up3_reporting__priority_rollup",
    }
    assert "o_orderpriority" in spark.table("up3_analytics__orders_enriched").columns
    # dependent view actually sees the new upstream plan (temp views
    # freeze plans at creation — the closure redeploy is what keeps
    # the DAG coherent)
    assert spark.table("up3_reporting__priority_rollup").count() >= 0
    # idempotent again afterwards
    assert p.update_if_needed() == []


def test_routine_text_edit_redeploys_routine_and_dependents(
    spark, sf_dir, proj_dir
):
    p = _project(spark, sf_dir, proj_dir, prefix="up4_")
    p.update_if_needed()
    sql = proj_dir / "sql/analytics/routines/PRIORITY_RANK/routine.sql"
    sql.write_text(sql.read_text().replace("AS INT)", "AS INT) + 10"))
    out = p.update_if_needed()
    assert set(out) == {
        "up4_analytics__PRIORITY_RANK",
        "up4_analytics__orders_enriched",
        "up4_reporting__priority_rollup",
    }
    ranks = {
        r.priority_rank
        for r in spark.table("up4_analytics__orders_enriched")
        .select("priority_rank")
        .distinct()
        .collect()
    }
    assert ranks and all(r >= 11 for r in ranks)


def test_declared_checks_run_against_deployed_tables(spark, sf_dir, proj_dir):
    p = _project(spark, sf_dir, proj_dir, prefix="chk1_")
    p.deploy()
    rep = p.validate("priority_orders")
    got = {(r.check, r.target): r.passed for r in rep.collect()}
    assert got == {
        ("not_null", "o_orderkey"): True,
        ("not_null", "o_custkey"): True,
        ("unique", "o_orderkey"): True,
        ("accepted_values", "o_orderstatus"): True,
    }
    # a poisoned binding must FAIL the gate, proving the checks bite
    import pyspark.sql.functions as F
    from docker_etl_spark.plans.projectdata import FileProject
    from docker_etl_spark.sources.io import load_table

    bad = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderstatus", F.lit("Z")
    )
    p2 = FileProject(
        spark,
        proj_dir,
        table_bindings={"analytics.priority_orders": bad},
        prefix="chk2_",
    )
    p2.deploy()
    failed = {
        (r.check, r.target)
        for r in p2.validate().collect()
        if not r.passed
    }
    assert ("accepted_values", "o_orderstatus") in failed
    with pytest.raises(ValueError, match="no declared checks"):
        p2.validate("import_runs")
