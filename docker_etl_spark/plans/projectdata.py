"""File-driven project catalog: TOML schemas + SQL templates → a
deployable Spark catalog (SURVEY.md §3.1; reference
webcompat_kb/projectdata.py:67-127 load_templates and
webcompat_kb/etl/update_schema.py:60-230 render/topo-deploy).

The reference's backbone is an on-disk project::

    sql/<dataset>/meta.toml                      # dataset metadata
    sql/<dataset>/tables/<name>/meta.toml        # name/description/etl/partition
    sql/<dataset>/tables/<name>/table.toml       # field definitions
    sql/<dataset>/views/<name>/meta.toml
    sql/<dataset>/views/<name>/view.sql          # {{ ref('x') }} templates
    sql/<dataset>/routines/<name>/meta.toml
    sql/<dataset>/routines/<name>/routine.sql    # scalar SQL function

Engine mapping — each piece lands on the Spark-native equivalent:

* table.toml field definitions (BigQuery types, NULLABLE/REQUIRED/
  REPEATED modes, nested RECORDs) → ``StructType`` via
  ``schema_from_toml``; a deployed table is a typed temp view —
  either a bound DataFrame conformed to the declared schema or an
  empty frame carrying the contract.
* routine.sql → ``CREATE OR REPLACE TEMPORARY FUNCTION`` SQL UDFs
  (Spark 4 SQL scalar functions). Catalyst *inlines* these into the
  calling plan, so routine calls cost nothing at runtime — the
  direct analogue of BigQuery persistent UDF expansion.
* view.sql → ``CREATE OR REPLACE TEMPORARY VIEW`` in dependency
  order; views are logical, so a query over the top of the DAG
  optimizes globally (pushdown through every layer).

Template rendering is the same contract as the reference's Jinja
use (``{{ ref('x') }}``, ``{{ ref(name) }}`` self-reference,
``{{ name }}``, ``{{ dataset }}``) handled by a small resolver — no
Jinja dependency. References may be unqualified (same dataset, then
unique across datasets, then an externally-bound base table) or
``dataset.name`` qualified, mirroring SchemaId.from_str
(bqhelpers.py:99-128). Deploy order is a topological sort over ref
edges with cycle detection (update_schema.py:218 topological_sort).
"""

from __future__ import annotations

import re
import tomllib
from dataclasses import dataclass, field
from graphlib import CycleError, TopologicalSorter
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# BigQuery standard-SQL type → Spark type. DATETIME (no zone) is
# TIMESTAMP_NTZ; TIMESTAMP (an instant) is the session-zoned type.
_BQ_TYPE_MAP: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "INT64": T.LongType(),
    "INTEGER": T.LongType(),
    "INT": T.LongType(),
    "FLOAT64": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 18),
    "BOOL": T.BooleanType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "DATETIME": T.TimestampNTZType(),
    "TIMESTAMP": T.TimestampType(),
    "JSON": T.StringType(),  # JSON flows as string; parse at use site
}

_MODES = {"NULLABLE", "REQUIRED", "REPEATED"}


def _field_from_toml(name: str, dfn: object, *, where: str) -> T.StructField:
    if not isinstance(dfn, dict):
        raise ValueError(f"{where}: field {name!r} must be a table, got {type(dfn).__name__}")
    ftype = dfn.get("type")
    if not isinstance(ftype, str):
        raise ValueError(f"{where}: field {name!r} missing 'type'")
    mode = dfn.get("mode", "NULLABLE")
    if mode not in _MODES:
        raise ValueError(f"{where}: field {name!r} has invalid mode {mode!r}")
    if ftype == "RECORD":
        sub = dfn.get("fields")
        if not isinstance(sub, dict) or not sub:
            raise ValueError(
                f"{where}: field {name!r} of type RECORD has no defined fields"
            )
        spark_type: T.DataType = T.StructType(
            [_field_from_toml(n, d, where=where) for n, d in sub.items()]
        )
    elif ftype in _BQ_TYPE_MAP:
        spark_type = _BQ_TYPE_MAP[ftype]
    else:
        raise ValueError(f"{where}: field {name!r} has unsupported type {ftype!r}")
    if mode == "REPEATED":
        # BigQuery REPEATED = array of the element type; arrays are
        # themselves nullable-elements=false per BQ semantics.
        return T.StructField(name, T.ArrayType(spark_type, False), nullable=True)
    return T.StructField(name, spark_type, nullable=(mode != "REQUIRED"))


def schema_from_toml(text: str, *, where: str = "<table.toml>") -> T.StructType:
    """Parse a table.toml field-definition document into a StructType.

    Mirrors TableSchemaDefinition/SchemaFieldDefinition.to_schema
    (projectdata.py:66-103): top-level keys are field names; each is
    a table with ``type``, optional ``mode``, optional nested
    ``fields`` for RECORDs.
    """
    try:
        data = tomllib.loads(text)
    except tomllib.TOMLDecodeError as ex:
        raise ValueError(f"{where}: invalid TOML: {ex}") from ex
    if not data:
        raise ValueError(f"{where}: empty table schema")
    return T.StructType(
        [_field_from_toml(n, d, where=where) for n, d in data.items()]
    )


@dataclass(frozen=True)
class RangePartition:
    field: str
    start: int
    end: int
    interval: int = 1


def _partition_from_meta(meta: dict, *, where: str) -> RangePartition | None:
    p = meta.get("partition")
    if p is None:
        return None
    if not isinstance(p, dict) or p.get("type") != "range":
        raise ValueError(f"{where}: partition must be a table with type='range'")
    try:
        return RangePartition(
            field=p["field"],
            start=int(p["start"]),
            end=int(p["end"]),
            interval=int(p.get("interval", 1)),
        )
    except KeyError as ex:
        raise ValueError(f"{where}: partition missing key {ex}") from ex


@dataclass(frozen=True)
class TableTemplate:
    dataset: str
    name: str
    schema: T.StructType
    description: str | None = None
    etl: tuple[str, ...] = ()
    partition: RangePartition | None = None


@dataclass(frozen=True)
class SqlTemplate:
    dataset: str
    name: str
    sql: str
    kind: str  # 'view' | 'routine'
    description: str | None = None


@dataclass
class DatasetTemplates:
    name: str
    description: str | None = None
    tables: dict[str, TableTemplate] = field(default_factory=dict)
    views: dict[str, SqlTemplate] = field(default_factory=dict)
    routines: dict[str, SqlTemplate] = field(default_factory=dict)


def _load_meta(path: Path) -> dict:
    try:
        with open(path, "rb") as f:
            meta = tomllib.load(f)
    except OSError as ex:
        raise ValueError(f"missing metadata file {path}") from ex
    except tomllib.TOMLDecodeError as ex:
        raise ValueError(f"{path}: invalid TOML: {ex}") from ex
    name = meta.get("name")
    if not isinstance(name, str) or not name:
        raise ValueError(f"{path}: 'name' is required and must be a string")
    desc = meta.get("description")
    if desc is not None and not isinstance(desc, str):
        raise ValueError(f"{path}: 'description' must be a string")
    return meta


def load_project_dir(root: str | Path) -> dict[str, DatasetTemplates]:
    """Walk ``<root>/sql/<dataset>/{tables,views,routines}/<name>/``
    into DatasetTemplates (projectdata.py:518-563 load_templates).

    Directories without a meta.toml are skipped with the reference's
    lenient behavior; malformed metadata raises with the offending
    path in the message.
    """
    sql_path = Path(root) / "sql"
    if not sql_path.is_dir():
        raise ValueError(f"expected a project directory with sql/, got {root}")
    datasets: dict[str, DatasetTemplates] = {}
    for dataset_dir in sorted(p for p in sql_path.iterdir() if p.is_dir()):
        meta_path = dataset_dir / "meta.toml"
        if not meta_path.exists():
            continue
        meta = _load_meta(meta_path)
        ds = DatasetTemplates(meta["name"], meta.get("description"))
        for sub, kind in (("tables", "table"), ("views", "view"), ("routines", "routine")):
            sub_dir = dataset_dir / sub
            if not sub_dir.is_dir():
                continue
            for obj_dir in sorted(p for p in sub_dir.iterdir() if p.is_dir()):
                obj_meta_path = obj_dir / "meta.toml"
                if not obj_meta_path.exists():
                    continue
                obj_meta = _load_meta(obj_meta_path)
                name = obj_meta["name"]
                if kind == "table":
                    body = obj_dir / "table.toml"
                    if not body.exists():
                        continue
                    etl = obj_meta.get("etl") or []
                    if not isinstance(etl, list) or not all(
                        isinstance(x, str) for x in etl
                    ):
                        raise ValueError(f"{obj_meta_path}: 'etl' must be a list of strings")
                    ds.tables[name] = TableTemplate(
                        dataset=ds.name,
                        name=name,
                        schema=schema_from_toml(
                            body.read_text(), where=str(body)
                        ),
                        description=obj_meta.get("description"),
                        etl=tuple(etl),
                        partition=_partition_from_meta(obj_meta, where=str(obj_meta_path)),
                    )
                else:
                    body = obj_dir / ("view.sql" if kind == "view" else "routine.sql")
                    if not body.exists():
                        continue
                    tpl = SqlTemplate(
                        dataset=ds.name,
                        name=name,
                        sql=body.read_text(),
                        kind=kind,
                        description=obj_meta.get("description"),
                    )
                    (ds.views if kind == "view" else ds.routines)[name] = tpl
        datasets[ds.name] = ds
    if not datasets:
        raise ValueError(f"no datasets found under {sql_path}")
    return datasets


# {{ ref('x') }} / {{ ref("ds.x") }} / {{ ref(name) }} / {{ name }} / {{ dataset }}
_TOKEN_RE = re.compile(
    r"\{\{\s*(?:"
    r"ref\(\s*(?:['\"](?P<ref>[\w.]+)['\"]|(?P<selfref>name))\s*\)"
    r"|(?P<var>name|dataset)"
    r")\s*\}\}"
)


def conform_binding(df: DataFrame, schema: T.StructType, *, where: str) -> DataFrame:
    """Cast/select a bound DataFrame to the declared table schema.

    Declared columns present in the frame are cast to the declared
    type; missing NULLABLE columns become typed nulls; missing
    REQUIRED columns are an error. Extra columns are dropped (the
    declared schema is the table's contract).
    """
    have = {f.name for f in df.schema.fields}
    cols = []
    for f_ in schema.fields:
        if f_.name in have:
            cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
        elif f_.nullable:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        else:
            raise ValueError(
                f"{where}: bound data is missing REQUIRED column {f_.name!r}"
            )
    return df.select(*cols)


class FileProject:
    """A loaded on-disk project, deployable into a SparkSession.

    ``base_tables`` binds *external* names (reference: ReferenceType
    .external — objects outside the project, here the scan layer) to
    DataFrames. ``table_bindings`` binds ``dataset.name`` declared
    tables to source DataFrames, conformed to the declared schema at
    deploy time; unbound tables deploy as empty typed views so the
    DAG still validates end-to-end.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str | Path,
        base_tables: dict[str, DataFrame] | None = None,
        table_bindings: dict[str, DataFrame] | None = None,
        prefix: str = "",
    ):
        self.spark = spark
        self.root = Path(root)
        self.datasets = load_project_dir(root)
        self.base_tables = dict(base_tables or {})
        self.table_bindings = dict(table_bindings or {})
        self.prefix = prefix
        # (dataset, name) -> kind, for ref classification
        self._known: dict[tuple[str, str], str] = {}
        for ds in self.datasets.values():
            for n in ds.tables:
                self._known[(ds.name, n)] = "table"
            for n in ds.views:
                self._known[(ds.name, n)] = "view"
            for n in ds.routines:
                self._known[(ds.name, n)] = "routine"
        for key in self.table_bindings:
            if tuple(key.split(".", 1)) not in self._known:
                raise ValueError(f"table binding {key!r} matches no declared table")

    # -- naming ------------------------------------------------------
    def physical_name(self, dataset: str, name: str) -> str:
        return f"{self.prefix}{dataset}__{name}"

    def _resolve(self, ref: str, *, from_dataset: str, where: str) -> tuple[str, str] | str:
        """Resolve a ref string to (dataset, name), or to an external
        base-table key (returned as the bare string)."""
        if "." in ref:
            ds, name = ref.split(".", 1)
            if (ds, name) in self._known:
                return (ds, name)
            raise KeyError(f"{where}: ref {ref!r} matches no project object")
        if (from_dataset, ref) in self._known:
            return (from_dataset, ref)
        matches = [k for k in self._known if k[1] == ref]
        if len(matches) == 1:
            return matches[0]
        if len(matches) > 1:
            raise KeyError(
                f"{where}: ref {ref!r} is ambiguous across datasets "
                f"{sorted(m[0] for m in matches)}; qualify it"
            )
        if ref in self.base_tables:
            return ref
        raise KeyError(f"{where}: ref {ref!r} matches no project object or base table")

    def _render(self, tpl: SqlTemplate) -> tuple[str, set[tuple[str, str]]]:
        deps: set[tuple[str, str]] = set()

        def sub(m: re.Match) -> str:
            if m.group("var"):
                return tpl.name if m.group("var") == "name" else tpl.dataset
            if m.group("selfref"):
                return self.physical_name(tpl.dataset, tpl.name)
            target = self._resolve(
                m.group("ref"),
                from_dataset=tpl.dataset,
                where=f"{tpl.kind} {tpl.dataset}.{tpl.name}",
            )
            if isinstance(target, str):  # external base table
                return f"{self.prefix}{target}"
            if target != (tpl.dataset, tpl.name):
                deps.add(target)
            return self.physical_name(*target)

        return _TOKEN_RE.sub(sub, tpl.sql), deps

    def _scan_refs(self, tpl: SqlTemplate) -> set[tuple[str, str]]:
        deps: set[tuple[str, str]] = set()
        for m in _TOKEN_RE.finditer(tpl.sql):
            if not m.group("ref"):
                continue
            target = self._resolve(
                m.group("ref"),
                from_dataset=tpl.dataset,
                where=f"{tpl.kind} {tpl.dataset}.{tpl.name}",
            )
            if isinstance(target, tuple) and target != (tpl.dataset, tpl.name):
                deps.add(target)
        return deps

    # -- deploy ------------------------------------------------------
    def deploy_order(self) -> list[tuple[str, str]]:
        """Tables first (no refs), then routines/views topologically
        sorted over their ref edges; cycles raise ValueError
        (update_schema.py:218 topological_sort)."""
        graph: dict[tuple[str, str], set[tuple[str, str]]] = {}
        for ds in self.datasets.values():
            for n in ds.tables:
                graph[(ds.name, n)] = set()
            for tpl in list(ds.routines.values()) + list(ds.views.values()):
                graph[(tpl.dataset, tpl.name)] = self._scan_refs(tpl)
        try:
            return list(TopologicalSorter(graph).static_order())
        except CycleError as ex:
            cycle = " -> ".join(f"{d}.{n}" for d, n in ex.args[1])
            raise ValueError(f"dependency cycle in project: {cycle}") from ex

    def deploy(self) -> list[str]:
        """Materialize the whole project; returns physical names in
        deploy order. Base tables register first (scan layer), then
        tables/routines/views in dependency order."""
        for name, df in self.base_tables.items():
            df.createOrReplaceTempView(f"{self.prefix}{name}")
        deployed = []
        for ds_name, name in self.deploy_order():
            ds = self.datasets[ds_name]
            phys = self.physical_name(ds_name, name)
            if name in ds.tables and self._known[(ds_name, name)] == "table":
                tbl = ds.tables[name]
                bound = self.table_bindings.get(f"{ds_name}.{name}")
                if bound is not None:
                    df = conform_binding(
                        bound, tbl.schema, where=f"table {ds_name}.{name}"
                    )
                else:
                    df = self.spark.createDataFrame([], tbl.schema)
                df.createOrReplaceTempView(phys)
            elif (ds_name, name) in {(d, n) for (d, n), k in self._known.items() if k == "routine"}:
                rendered, _ = self._render(ds.routines[name])
                stripped = rendered.lstrip()
                if not stripped.upper().startswith("CREATE"):
                    raise ValueError(
                        f"routine {ds_name}.{name}: template must be a CREATE "
                        f"FUNCTION statement (update_schema.py validate_routine_sql)"
                    )
                if phys not in rendered:
                    raise ValueError(
                        f"routine {ds_name}.{name}: rendered SQL must define "
                        f"{phys!r}; name the function `{{{{ ref(name) }}}}`"
                    )
                self.spark.sql(rendered)
            else:
                rendered, _ = self._render(ds.views[name])
                self.spark.sql(
                    f"CREATE OR REPLACE TEMPORARY VIEW {phys} AS {rendered}"
                )
            deployed.append(phys)
        return deployed

    def table(self, ref: str) -> DataFrame:
        target = self._resolve(ref, from_dataset="", where="table()")
        if isinstance(target, str):
            return self.spark.table(f"{self.prefix}{target}")
        return self.spark.table(self.physical_name(*target))
