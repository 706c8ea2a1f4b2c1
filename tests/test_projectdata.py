"""File-driven project catalog (plans/projectdata.py): TOML schema
parsing, template rendering, ref resolution, cycle detection, and
end-to-end deploy (reference webcompat_kb/projectdata.py +
etl/update_schema.py contracts)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docker_etl_spark.plans.projectdata import (
    FileProject,
    conform_binding,
    load_project_dir,
    schema_from_toml,
)

FIXTURE = Path(__file__).resolve().parent.parent / "fixtures" / "demo_project"


# -- schema_from_toml -------------------------------------------------


def test_schema_from_toml_scalar_modes():
    s = schema_from_toml(
        """
[a]
type = "INT64"
mode = "REQUIRED"

[b]
type = "STRING"

[c]
type = "FLOAT64"
mode = "REPEATED"
"""
    )
    assert s["a"].dataType == T.LongType() and not s["a"].nullable
    assert s["b"].dataType == T.StringType() and s["b"].nullable
    assert s["c"].dataType == T.ArrayType(T.DoubleType(), False)


def test_schema_from_toml_nested_record():
    s = schema_from_toml(
        """
[stats]
type = "RECORD"

[stats.fields.inner]
type = "RECORD"
mode = "REPEATED"

[stats.fields.inner.fields.x]
type = "INT64"
"""
    )
    stats = s["stats"].dataType
    assert isinstance(stats, T.StructType)
    inner = stats["inner"].dataType
    assert isinstance(inner, T.ArrayType)
    assert isinstance(inner.elementType, T.StructType)
    assert inner.elementType["x"].dataType == T.LongType()


def test_schema_from_toml_record_without_fields_rejected():
    with pytest.raises(ValueError, match="no defined fields"):
        schema_from_toml('[r]\ntype = "RECORD"\n')


def test_schema_from_toml_unknown_type_rejected():
    with pytest.raises(ValueError, match="unsupported type"):
        schema_from_toml('[a]\ntype = "GEOGRAPHY"\n', where="t.toml")


def test_schema_from_toml_bad_mode_rejected():
    with pytest.raises(ValueError, match="invalid mode"):
        schema_from_toml('[a]\ntype = "STRING"\nmode = "SOMETIMES"\n')


# -- loader -----------------------------------------------------------


def test_load_project_dir_fixture():
    datasets = load_project_dir(FIXTURE)
    assert set(datasets) == {"analytics", "reporting"}
    an = datasets["analytics"]
    assert set(an.tables) == {"priority_orders", "import_runs"}
    assert set(an.routines) == {"PRIORITY_RANK"}
    assert set(an.views) == {"orders_enriched"}
    runs = an.tables["import_runs"]
    assert runs.etl == ("orders-import",)
    assert runs.partition is not None and runs.partition.interval == 100
    assert isinstance(runs.schema["stats"].dataType, T.StructType)


def test_load_project_dir_missing_sql_dir(tmp_path):
    with pytest.raises(ValueError, match="sql/"):
        load_project_dir(tmp_path)


def _write_project(tmp_path: Path, views: dict[str, str]) -> Path:
    ds = tmp_path / "sql" / "d1"
    (ds / "views").mkdir(parents=True)
    (ds / "meta.toml").write_text('name = "d1"\n')
    for name, sql in views.items():
        vd = ds / "views" / name
        vd.mkdir()
        (vd / "meta.toml").write_text(f'name = "{name}"\n')
        (vd / "view.sql").write_text(sql)
    return tmp_path


# -- ref resolution / deploy order -----------------------------------


def test_ref_cycle_detected(spark, tmp_path):
    root = _write_project(
        tmp_path,
        {
            "a": "SELECT * FROM {{ ref('b') }}",
            "b": "SELECT * FROM {{ ref('a') }}",
        },
    )
    proj = FileProject(spark, root)
    with pytest.raises(ValueError, match="dependency cycle"):
        proj.deploy_order()


def test_unknown_ref_rejected(spark, tmp_path):
    root = _write_project(tmp_path, {"a": "SELECT * FROM {{ ref('nope') }}"})
    proj = FileProject(spark, root)
    with pytest.raises(KeyError, match="nope"):
        proj.deploy_order()


def test_unbound_declared_table_deploys_empty(spark, tmp_path):
    ds = tmp_path / "sql" / "d1"
    (ds / "tables" / "t").mkdir(parents=True)
    (ds / "meta.toml").write_text('name = "d1"\n')
    (ds / "tables" / "t" / "meta.toml").write_text('name = "t"\n')
    (ds / "tables" / "t" / "table.toml").write_text('[x]\ntype = "INT64"\n')
    proj = FileProject(spark, tmp_path, prefix="tpd_empty_")
    proj.deploy()
    df = proj.table("d1.t")
    assert df.count() == 0
    assert df.schema["x"].dataType == T.LongType()


def test_bad_table_binding_key_rejected(spark):
    with pytest.raises(ValueError, match="matches no declared table"):
        FileProject(
            spark,
            FIXTURE,
            table_bindings={"analytics.nope": None},  # type: ignore[dict-item]
        )


# -- conform_binding --------------------------------------------------


def test_conform_binding_casts_fills_and_drops(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame([(1, 9)], "a int, extra int")
    out = conform_binding(df, schema, where="t")
    assert out.columns == ["a", "b"]
    assert out.schema["a"].dataType == T.LongType()
    row = out.first()
    assert row.a == 1 and row.b is None


def test_conform_binding_missing_required_rejected(spark):
    schema = T.StructType([T.StructField("a", T.LongType(), False)])
    df = spark.createDataFrame([(1,)], "other int")
    with pytest.raises(ValueError, match="REQUIRED column 'a'"):
        conform_binding(df, schema, where="t")


# -- end-to-end -------------------------------------------------------


def test_fixture_project_deploys_and_inlines(spark, sf_dir):
    from docker_etl_spark.sources.io import load_table

    proj = FileProject(
        spark,
        FIXTURE,
        table_bindings={
            "analytics.priority_orders": load_table(spark, sf_dir, "orders")
        },
        prefix="tpd_",
    )
    deployed = proj.deploy()
    # tables before dependents; routine before the view that calls it
    assert deployed.index("tpd_analytics__priority_orders") < deployed.index(
        "tpd_analytics__orders_enriched"
    )
    assert deployed.index("tpd_analytics__PRIORITY_RANK") < deployed.index(
        "tpd_analytics__orders_enriched"
    )
    top = proj.table("reporting.priority_rollup")
    assert top.count() > 0
    ranks = {r.priority_rank for r in top.select("priority_rank").distinct().collect()}
    assert ranks <= {1, 2, 3, 4, 5}
    # The SQL routine must be Catalyst-inlined: no UDF/BatchEvalPython
    # in the physical plan of a view that calls it per-row.
    plan = proj.table("analytics.orders_enriched")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "SQLFunction" not in plan


def test_routine_must_be_create_function(spark, tmp_path):
    ds = tmp_path / "sql" / "d1"
    (ds / "routines" / "r").mkdir(parents=True)
    (ds / "meta.toml").write_text('name = "d1"\n')
    (ds / "routines" / "r" / "meta.toml").write_text('name = "r"\n')
    (ds / "routines" / "r" / "routine.sql").write_text("SELECT 1")
    proj = FileProject(spark, tmp_path, prefix="tpd_r_")
    with pytest.raises(ValueError, match="CREATE"):
        proj.deploy()
