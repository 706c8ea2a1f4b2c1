"""Declarative view catalog with ``ref()`` dependency resolution
(SURVEY.md §3.1).

The reference's webcompat-kb job is a warehouse mini-framework: SQL
view templates with ``{{ ref('name') }}`` cross-references, loaded
into a dependency-aware project and deployed in topological order
(webcompat_kb/projectdata.py:295-420 — SchemaIdMapper resolves refs;
deploy order derives from the ref edges).

Engine version: a ``Project`` of named SQL templates; ``ref('x')``
resolves to the materialized temp-view name of ``x``; ``deploy()``
topo-sorts and issues ``CREATE OR REPLACE TEMPORARY VIEW`` through
``spark.sql`` — so the whole view DAG becomes one Catalyst catalog,
and queries across views optimize globally (view inlining, pushdown
through views).

Template syntax is plain ``{{ ref('name') }}`` handled by a small
resolver (no Jinja dependency; the reference's other Jinja use —
metric-macro loops — maps to Python-side SQL generation, which the
metric registry in operators/aggregates.conditional_counts covers).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession

_REF_RE = re.compile(r"\{\{\s*ref\(\s*['\"](\w+)['\"]\s*\)\s*\}\}")


@dataclass
class ViewDef:
    """One templated view: name + SQL with {{ ref('…') }} holes."""

    name: str
    sql: str

    @property
    def refs(self) -> set[str]:
        return set(_REF_RE.findall(self.sql))

    def render(self, mapper: dict[str, str]) -> str:
        def sub(m: re.Match) -> str:
            target = m.group(1)
            if target not in mapper:
                raise KeyError(f"view {self.name!r} refs unknown object {target!r}")
            return mapper[target]

        return _REF_RE.sub(sub, self.sql)


@dataclass
class Project:
    """A deployable set of views over a set of base tables.

    ``base_tables`` maps names to already-registered temp views /
    DataFrames (the scan layer); ``views`` reference bases and each
    other via ref().
    """

    spark: SparkSession
    base_tables: dict[str, DataFrame] = field(default_factory=dict)
    views: dict[str, ViewDef] = field(default_factory=dict)
    prefix: str = ""

    def add_view(self, name: str, sql: str) -> "Project":
        self.views[name] = ViewDef(name, sql)
        return self

    def _physical_name(self, name: str) -> str:
        return f"{self.prefix}{name}"

    def deploy_order(self) -> list[str]:
        """Topological order over ref() edges (views only)."""
        graph = {
            name: {r for r in v.refs if r in self.views}
            for name, v in self.views.items()
        }
        return list(TopologicalSorter(graph).static_order())

    def deploy(self) -> list[str]:
        """Materialize base tables + views as temp views, dependency
        order; returns the deployed view names."""
        mapper: dict[str, str] = {}
        for name, df in self.base_tables.items():
            phys = self._physical_name(name)
            df.createOrReplaceTempView(phys)
            mapper[name] = phys
        deployed = []
        for name in self.deploy_order():
            phys = self._physical_name(name)
            rendered = self.views[name].render(mapper)
            self.spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {phys} AS {rendered}")
            mapper[name] = phys
            deployed.append(name)
        return deployed

    def table(self, name: str) -> DataFrame:
        return self.spark.table(self._physical_name(name))
