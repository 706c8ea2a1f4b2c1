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

import hashlib
import re
import tomllib
from dataclasses import dataclass, field
from datetime import datetime
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
class TableCheck:
    """One declared data-quality check (the dbt schema.yml idiom,
    engine-side: meta.toml ``[[checks]]`` entries mapped onto the
    operators/profiling expectations family)."""

    type: str  # not_null | unique | accepted_values | references
    columns: tuple[str, ...] = ()
    values: tuple[str, ...] = ()
    ref: str = ""  # "dataset.table:column" for references


@dataclass(frozen=True)
class TableTemplate:
    dataset: str
    name: str
    schema: T.StructType
    description: str | None = None
    etl: tuple[str, ...] = ()
    partition: RangePartition | None = None
    checks: tuple[TableCheck, ...] = ()


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


_CHECK_TYPES = ("not_null", "unique", "accepted_values", "references")


def _checks_from_meta(meta: dict, *, where: str) -> tuple[TableCheck, ...]:
    raw = meta.get("checks", [])
    if not isinstance(raw, list):
        raise ValueError(f"{where}: 'checks' must be an array of tables")
    out = []
    for i, c in enumerate(raw):
        if not isinstance(c, dict) or c.get("type") not in _CHECK_TYPES:
            raise ValueError(
                f"{where}: checks[{i}] needs a 'type' in {_CHECK_TYPES}"
            )
        cols = tuple(c.get("columns", ()))
        if not cols:
            raise ValueError(f"{where}: checks[{i}] needs 'columns'")
        if c["type"] == "accepted_values" and not c.get("values"):
            raise ValueError(f"{where}: checks[{i}] needs 'values'")
        if c["type"] == "references" and ":" not in c.get("ref", ""):
            raise ValueError(
                f"{where}: checks[{i}] needs ref = 'dataset.table:column'"
            )
        out.append(
            TableCheck(
                type=c["type"],
                columns=cols,
                values=tuple(c.get("values", ())),
                ref=c.get("ref", ""),
            )
        )
    return tuple(out)


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
                        checks=_checks_from_meta(obj_meta, where=str(obj_meta_path)),
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

# {% for m in metrics %} ... {% endfor %} — the reference's
# metric-view generation loop (webcompat_kb/metrics/metrics.py:196-216
# renders whole views by looping metric_types and splicing each
# metric's agg_function). Supported inside the body:
#   {{ var.attr }} / {{ var.method() }}   attribute / no-arg call
#   {{ ',' if not loop.last }}            the separator idiom
_LOOP_RE = re.compile(
    r"\{%\s*for\s+(?P<var>\w+)\s+in\s+(?P<seq>\w+)\s*%\}"
    r"(?P<body>.*?)\{%\s*endfor\s*%\}",
    re.S,
)


def expand_template_loops(text: str, context: dict, *, where: str) -> str:
    """Expand metric-loop blocks against ``context`` (name → iterable
    of objects). Each iteration substitutes the loop variable's
    attribute/method tokens; ``loop.last`` gates separators. Loops
    cannot nest (the reference's templates don't either)."""

    def expand(m: re.Match) -> str:
        var, seq, body = m.group("var"), m.group("seq"), m.group("body")
        if seq not in context:
            raise KeyError(
                f"{where}: template loops over {seq!r} but the project "
                f"was built without it in template_context"
            )
        items = list(context[seq])
        attr_re = re.compile(
            r"\{\{\s*" + re.escape(var) + r"\.(\w+)(\(\))?\s*\}\}"
        )
        last_re = re.compile(
            r"\{\{\s*'([^']*)'\s+if\s+not\s+loop\.last\s*\}\}"
        )
        out = []
        for i, item in enumerate(items):
            def sub_attr(am: re.Match) -> str:
                v = getattr(item, am.group(1))
                return str(v() if am.group(2) else v)

            piece = attr_re.sub(sub_attr, body)
            piece = last_re.sub(
                lambda lm: lm.group(1) if i < len(items) - 1 else "", piece
            )
            out.append(piece)
        return "".join(out)

    return _LOOP_RE.sub(expand, text)


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


def tree_hash(root: str | Path) -> str:
    """Deterministic content hash of a project directory — the
    reference's git-style ``hash_tree`` (treehash.py:98), used to
    skip no-op schema deployments: same bytes on disk → same hash →
    nothing to do. Hashes sorted relative paths with their content
    digests, so renames, additions, and edits all change it."""
    rootp = Path(root)
    h = hashlib.sha256()
    for p in sorted(rootp.rglob("*")):
        if p.is_file():
            h.update(str(p.relative_to(rootp)).encode())
            h.update(b"\x00")
            h.update(hashlib.sha256(p.read_bytes()).digest())
            h.update(b"\x00")
    return h.hexdigest()


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
        template_context: dict | None = None,
    ):
        self.spark = spark
        self.root = Path(root)
        self.datasets = load_project_dir(root)
        self.base_tables = dict(base_tables or {})
        self.table_bindings = dict(table_bindings or {})
        self.prefix = prefix
        # name -> iterable of objects, for {% for %} template loops
        # (the registry the reference passes to its Jinja environment)
        self.template_context = dict(template_context or {})
        # (dataset, name) -> (kind, deployed schema-or-text): what THIS
        # project instance deployed, diffed by needs_update.
        self._live: dict[tuple[str, str], tuple[str, object]] = {}
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
        where = f"{tpl.kind} {tpl.dataset}.{tpl.name}"
        sql = expand_template_loops(tpl.sql, self.template_context, where=where)

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

        return _TOKEN_RE.sub(sub, sql), deps

    def _scan_refs(self, tpl: SqlTemplate) -> set[tuple[str, str]]:
        deps: set[tuple[str, str]] = set()
        sql = expand_template_loops(
            tpl.sql,
            self.template_context,
            where=f"{tpl.kind} {tpl.dataset}.{tpl.name}",
        )
        for m in _TOKEN_RE.finditer(sql):
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

    def _deploy_one(self, ds_name: str, name: str) -> str:
        """Deploy a single object and record what was deployed (kind +
        schema/rendered text) in the live-state map the incremental
        updater diffs against."""
        ds = self.datasets[ds_name]
        phys = self.physical_name(ds_name, name)
        kind = self._known[(ds_name, name)]
        if kind == "table":
            tbl = ds.tables[name]
            bound = self.table_bindings.get(f"{ds_name}.{name}")
            if bound is not None:
                df = conform_binding(
                    bound, tbl.schema, where=f"table {ds_name}.{name}"
                )
            else:
                df = self.spark.createDataFrame([], tbl.schema)
            df.createOrReplaceTempView(phys)
            self._live[(ds_name, name)] = ("table", tbl.schema)
        elif kind == "routine":
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
            self._live[(ds_name, name)] = ("routine", rendered)
        else:
            rendered, _ = self._render(ds.views[name])
            self.spark.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {phys} AS {rendered}"
            )
            self._live[(ds_name, name)] = ("view", rendered)
        return phys

    def deploy(self) -> list[str]:
        """Materialize the whole project; returns physical names in
        deploy order. Base tables register first (scan layer), then
        tables/routines/views in dependency order."""
        for name, df in self.base_tables.items():
            df.createOrReplaceTempView(f"{self.prefix}{name}")
        return [self._deploy_one(d, n) for d, n in self.deploy_order()]

    # -- incremental schema update (update_schema.py:295-474,551-623) --
    def reload(self) -> None:
        """Re-read templates from disk — the step between editing the
        project directory and asking what changed."""
        self.datasets = load_project_dir(self.root)
        self._known = {}
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

    def needs_update(self, ds_name: str, name: str) -> bool:
        """Live-vs-declared diff for one object, mirroring the
        reference's updaters (update_schema.py:320-419): missing →
        update; table → field additions (``schema_new_fields`` over
        the LIVE catalog schema, recursing into nested structs) or
        field-count change; view/routine → rendered text differs from
        what this project deployed. Text diffing routines is an
        engine-side improvement over the reference (which re-deploys
        routines unconditionally because BigQuery returns a parsed
        form) — possible here because the deployed text is recorded.
        """
        from docker_etl_spark.sources.io import schema_new_fields

        kind = self._known[(ds_name, name)]
        phys = self.physical_name(ds_name, name)
        if kind == "table":
            if not self.spark.catalog.tableExists(phys):
                return True
            declared = self.datasets[ds_name].tables[name].schema
            live = self.spark.table(phys).schema
            return bool(schema_new_fields(declared, live)) or len(
                declared.fields
            ) != len(live.fields)
        tpl = (
            self.datasets[ds_name].routines[name]
            if kind == "routine"
            else self.datasets[ds_name].views[name]
        )
        rendered, _ = self._render(tpl)
        recorded = self._live.get((ds_name, name))
        if recorded is None:
            return True  # never deployed by this project → deploy
        return recorded[1] != rendered

    def _dependents_closure(
        self, changed: set[tuple[str, str]]
    ) -> set[tuple[str, str]]:
        """Transitive consumers of ``changed`` through ref edges.
        Engine-specific necessity: temp views freeze their analyzed
        plan at creation, so replacing an upstream object does NOT
        flow into an existing downstream view — dependents must be
        re-created (BigQuery views re-resolve per query, so the
        reference skips this)."""
        fwd: dict[tuple[str, str], set[tuple[str, str]]] = {}
        for ds in self.datasets.values():
            for tpl in list(ds.routines.values()) + list(ds.views.values()):
                fwd[(tpl.dataset, tpl.name)] = self._scan_refs(tpl)
        out = set(changed)
        grew = True
        while grew:
            grew = False
            for obj, deps in fwd.items():
                if obj not in out and deps & out:
                    out.add(obj)
                    grew = True
        return out - set(changed)

    def deploy_incremental(self) -> list[str]:
        """Deploy only objects whose declaration changed, plus their
        transitive dependents, in dependency order — the engine twin
        of ``update_schemas`` touching only what ``needs_update``
        (update_schema.py:479-531). Returns deployed physical names
        (empty when nothing changed)."""
        order = self.deploy_order()
        changed = {
            (d, n) for d, n in order if self.needs_update(d, n)
        }
        if not changed:
            return []
        targets = changed | self._dependents_closure(changed)
        for name, df in self.base_tables.items():
            df.createOrReplaceTempView(f"{self.prefix}{name}")
        return [
            self._deploy_one(d, n) for d, n in order if (d, n) in targets
        ]

    def get_last_update(self) -> tuple[datetime | None, str | None]:
        """Most recent (run_at, schema_hash) from the deployment log,
        (None, None) when the log doesn't exist yet
        (update_schema.py:551-570 get_last_update)."""
        log = f"{self.prefix}metadata__schema_updates"
        if not self.spark.catalog.tableExists(log):
            return None, None
        rows = (
            self.spark.table(log)
            .orderBy(F.desc("run_at"))
            .limit(1)
            .collect()
        )
        if not rows:
            return None, None
        return rows[0].run_at, rows[0].schema_hash

    def record_update(self, schema_hash: str) -> None:
        """Append a deployment record (update_schema.py:572-583)."""
        log = f"{self.prefix}metadata__schema_updates"
        row = self.spark.createDataFrame(
            [(datetime.now(), schema_hash)],
            "run_at timestamp_ntz, schema_hash string",
        )
        if self.spark.catalog.tableExists(log):
            row = self.spark.table(log).unionByName(row)
        # materialize before re-binding the view name the union reads
        row = row.localCheckpoint(eager=True)
        row.createOrReplaceTempView(log)

    def update_if_needed(self, force: bool = False) -> list[str]:
        """The reference's top-level orchestration
        (update_schema.py:595-623 update_schema_if_needed): hash the
        template tree; if it matches the last recorded deployment and
        that deployment is from today, do NOTHING (idempotent no-op
        runs); otherwise deploy the diff and record the new hash."""
        src_hash = tree_hash(self.root)
        last_time, last_hash = self.get_last_update()
        update_needed = (
            force
            or last_hash != src_hash
            or (last_time is not None and last_time.date() < datetime.now().date())
        )
        if not update_needed:
            return []
        self.reload()
        deployed = self.deploy_incremental()
        self.record_update(src_hash)
        return deployed

    def validate(self, ref: str | None = None) -> DataFrame:
        """Run every declared table check against the DEPLOYED tables
        and return the admission report (check, target, n_violations,
        passed) — the catalog-integrated form of the
        operators/profiling expectations family (dbt's schema.yml
        tests, declared in meta.toml ``[[checks]]``). ``ref`` limits
        to one table. Raises if no checked table matches."""
        from docker_etl_spark.operators.profiling import (
            expect_accepted_values,
            expect_not_null,
            expect_references,
            expect_unique,
            expectation_report,
        )

        frames: list[DataFrame] = []
        for ds in self.datasets.values():
            for tbl in ds.tables.values():
                if ref is not None and ref not in (
                    tbl.name,
                    f"{tbl.dataset}.{tbl.name}",
                ):
                    continue
                if not tbl.checks:
                    continue
                df = self.spark.table(self.physical_name(tbl.dataset, tbl.name))
                for c in tbl.checks:
                    if c.type == "not_null":
                        frames.append(expect_not_null(df, list(c.columns)))
                    elif c.type == "unique":
                        frames.append(expect_unique(df, list(c.columns)))
                    elif c.type == "accepted_values":
                        frames.append(
                            expect_accepted_values(
                                df, c.columns[0], list(c.values)
                            )
                        )
                    else:  # references
                        target, rcol = c.ref.split(":", 1)
                        frames.append(
                            expect_references(
                                df, c.columns[0], self.table(target), rcol
                            )
                        )
        if not frames:
            raise ValueError(
                f"no declared checks match {ref!r}" if ref else "no declared checks"
            )
        return expectation_report(frames)

    def table(self, ref: str) -> DataFrame:
        target = self._resolve(ref, from_dataset="", where="table()")
        if isinstance(target, str):
            return self.spark.table(f"{self.prefix}{target}")
        return self.spark.table(self.physical_name(*target))
