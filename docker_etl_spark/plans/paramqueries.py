"""File-driven parameterized query catalog with TYPED parameters
(SURVEY.md §2.1 S1 at the catalog level; reference
webcompat_kb/redashdata.py:25-345 — dashboard queries live on disk as
``<name>/{meta.toml, parameters.toml, query.sql}`` with typed,
validated parameter declarations: enum membership is checked, dates
parse, defaults fill, unknown parameters are rejected).

Engine mapping: the SQL body uses Spark named parameters
(``:param``); binding goes through ``spark.sql(sql, args=...)`` so
values are typed literals in the plan (no string splicing, no
injection surface) and Catalyst constant-folds them — predicate
pushdown through a parameterized filter is identical to a literal
one. Date-range parameters expand to ``<name>_start`` / ``<name>_end``
(the reference's RedashDateRangeParameter shape).
"""

from __future__ import annotations

import datetime as dt
import tomllib
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

PARAM_TYPES = (
    "text",
    "number",
    "date",
    "datetime",
    "enum",
    "date-range",
)


@dataclass(frozen=True)
class ParamSpec:
    """One declared parameter (redashdata.py:32-334: every Redash
    parameter class carries name/title/type/value + type-specific
    validation)."""

    name: str
    type: str
    default: object = None
    enum_values: tuple[str, ...] = ()

    def coerce(self, value: object) -> object:
        """Validate + coerce one supplied value to the declared type;
        raises ValueError with the parameter name on any mismatch."""
        if self.type == "text":
            if not isinstance(value, str):
                raise ValueError(f"parameter {self.name!r}: expected text")
            return value
        if self.type == "number":
            if isinstance(value, bool) or not isinstance(value, (int, float)):
                raise ValueError(f"parameter {self.name!r}: expected number")
            return value
        if self.type == "enum":
            if value not in self.enum_values:
                raise ValueError(
                    f"parameter {self.name!r}: {value!r} not in enum "
                    f"{list(self.enum_values)} (redashdata enum check)"
                )
            return value
        if self.type == "date":
            if isinstance(value, dt.date) and not isinstance(value, dt.datetime):
                return value
            if isinstance(value, str):
                return dt.date.fromisoformat(value)
            raise ValueError(f"parameter {self.name!r}: expected ISO date")
        if self.type == "datetime":
            if isinstance(value, dt.datetime):
                return value
            if isinstance(value, str):
                return dt.datetime.fromisoformat(value)
            raise ValueError(f"parameter {self.name!r}: expected ISO datetime")
        if self.type == "date-range":
            if (
                isinstance(value, dict)
                and set(value) == {"start", "end"}
            ):
                start = dt.date.fromisoformat(str(value["start"]))
                end = dt.date.fromisoformat(str(value["end"]))
                if start > end:
                    raise ValueError(
                        f"parameter {self.name!r}: start after end"
                    )
                return {"start": start, "end": end}
            raise ValueError(
                f"parameter {self.name!r}: expected {{start, end}} mapping"
            )
        raise ValueError(f"parameter {self.name!r}: unknown type {self.type!r}")


@dataclass
class QueryTemplate:
    """One on-disk query: SQL body + parameter schema
    (redashdata.py:345-428 RedashQueryTemplate)."""

    name: str
    sql: str
    description: str | None = None
    params: dict[str, ParamSpec] = field(default_factory=dict)

    def bind(self, supplied: dict | None = None) -> dict:
        """Merge supplied values over defaults, validate every one,
        and expand range parameters — the args mapping for
        ``spark.sql``. Unknown names and missing no-default
        parameters raise (the reference rejects both)."""
        supplied = dict(supplied or {})
        unknown = set(supplied) - set(self.params)
        if unknown:
            raise ValueError(
                f"query {self.name!r}: unknown parameters {sorted(unknown)}"
            )
        args: dict = {}
        for pname, spec in self.params.items():
            if pname in supplied:
                value = spec.coerce(supplied[pname])
            elif spec.default is not None:
                value = spec.coerce(spec.default)
            else:
                raise ValueError(
                    f"query {self.name!r}: parameter {pname!r} has no value "
                    "and no default"
                )
            if spec.type == "date-range":
                args[f"{pname}_start"] = value["start"]
                args[f"{pname}_end"] = value["end"]
            else:
                args[pname] = value
        return args

    def run(
        self, spark: SparkSession, supplied: dict | None = None
    ) -> DataFrame:
        return spark.sql(self.sql, args=self.bind(supplied))


def _param_from_toml(name: str, dfn: dict, *, where: str) -> ParamSpec:
    ptype = dfn.get("type")
    if ptype not in PARAM_TYPES:
        raise ValueError(
            f"{where}: parameter {name!r} has invalid type {ptype!r} "
            f"(one of {PARAM_TYPES})"
        )
    enum_values = tuple(dfn.get("values", ()))
    if ptype == "enum" and not enum_values:
        raise ValueError(f"{where}: enum parameter {name!r} needs 'values'")
    return ParamSpec(
        name=name,
        type=ptype,
        default=dfn.get("default"),
        enum_values=enum_values,
    )


def load_query_dir(path: str | Path) -> QueryTemplate:
    """Load one ``<name>/{meta.toml, parameters.toml, query.sql}``
    directory (parameters.toml optional — parameterless queries are
    plain files)."""
    p = Path(path)
    meta = tomllib.loads((p / "meta.toml").read_text())
    name = meta.get("name")
    if not isinstance(name, str) or not name:
        raise ValueError(f"{p}/meta.toml: 'name' is required")
    sql = (p / "query.sql").read_text()
    params: dict[str, ParamSpec] = {}
    pfile = p / "parameters.toml"
    if pfile.exists():
        for pname, dfn in tomllib.loads(pfile.read_text()).items():
            if not isinstance(dfn, dict):
                raise ValueError(f"{pfile}: parameter {pname!r} must be a table")
            params[pname] = _param_from_toml(pname, dfn, where=str(pfile))
    return QueryTemplate(
        name=name,
        sql=sql,
        description=meta.get("description"),
        params=params,
    )


def load_query_catalog(root: str | Path) -> dict[str, QueryTemplate]:
    """Walk ``<root>/queries/<name>/`` into a catalog
    (redashdata.py:486-517 RedashData.load)."""
    qroot = Path(root) / "queries"
    if not qroot.is_dir():
        raise ValueError(f"expected a catalog directory with queries/, got {root}")
    out: dict[str, QueryTemplate] = {}
    for d in sorted(x for x in qroot.iterdir() if x.is_dir()):
        if not (d / "meta.toml").exists():
            continue
        tpl = load_query_dir(d)
        out[tpl.name] = tpl
    return out
