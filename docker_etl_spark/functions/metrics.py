"""Declarative metric registry → generated aggregate expressions
(SURVEY.md §2.4 A3).

The reference's webcompat metric framework defines metrics as config
objects whose ``agg_function`` property emits the SQL aggregate text
(webcompat_kb/metrics/metrics.py:151-177: ``CountMetricType`` →
``COUNTIF(cond)``, ``SumMetricType`` → ``SUM(IF(cond, expr, 0))``),
which a view template then splices per metric
(metrics/metrics.py:196-216).

Engine-side twin: each metric emits BOTH a Spark ``Column`` (the
plan the engine runs) and an ANSI-SQL string (what a differential
oracle or a SQL-surface deployment runs) from one definition — the
config-as-data pattern of §1.1, with codegen targeting two dialects.

Sum metrics aggregate in DecimalType per the engine's cross-engine
exactness rule (queries.py module docstring).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CountMetric:
    """COUNTIF(condition) — condition is an ANSI boolean SQL snippet
    valid in both Spark SQL and the oracle dialect."""

    name: str
    condition: str

    def column(self) -> Column:
        return F.sum(
            F.when(F.expr(self.condition), F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias(self.name)

    def sql(self) -> str:
        return (
            f"CAST(SUM(CASE WHEN {self.condition} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS {self.name}"
        )


@dataclass(frozen=True)
class SumMetric:
    """SUM(IF(condition, expr, 0)) in exact decimal, double at the
    output edge."""

    name: str
    expr: str
    condition: str = "TRUE"
    scale: str = "DECIMAL(12,2)"

    def column(self) -> Column:
        val = F.expr(self.expr).cast(self.scale.lower())
        zero = F.lit(0).cast(self.scale.lower())
        return (
            F.sum(F.when(F.expr(self.condition), val).otherwise(zero))
            .cast("double")
            .alias(self.name)
        )

    def sql(self) -> str:
        return (
            f"CAST(SUM(CASE WHEN {self.condition} THEN CAST({self.expr} AS "
            f"{self.scale}) ELSE CAST(0 AS {self.scale}) END) AS DOUBLE)"
            f" AS {self.name}"
        )


Metric = CountMetric | SumMetric


def metric_columns(metrics: list[Metric]) -> list[Column]:
    """The generated aggregate list for ``df.groupBy(...).agg(*...)``."""
    return [m.column() for m in metrics]


def metric_select_sql(metrics: list[Metric]) -> str:
    """The generated aggregate clause for a SQL surface."""
    return ",\n           ".join(m.sql() for m in metrics)
