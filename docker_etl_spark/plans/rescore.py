"""Metric rescore lifecycle (SURVEY.md §3.1; reference
webcompat_kb/metrics/rescores.py:21-116 + metric_rescore.py:178-257).

When a scoring routine changes, the reference does NOT just redeploy:
it stages the new routine under a ``rescore_<name>`` prefix, archives
the previous definition under ``<obj>_before_rescore_<name>`` in an
``<dataset>_archive`` dataset (so historical scores stay queryable
and auditable), computes a per-bug delta table, records the rescore
in a log table, and only then cleans up staging objects. Exactly one
undeployed rescore may be applied at a time, and staged-only rescores
(``stage = true``) are never auto-deployed.

Engine mapping: schema objects are the FileProject's (dataset, name)
pairs; the staging/archive/delta naming transforms are pure and
identical to the reference's (routines upper-case the affix — BigQuery
routine names are case-sensitive identifiers in the reference's
convention); archiving a deployed view snapshots its CURRENT plan
under the archive physical name (temp views freeze their plan at
creation, which is precisely the semantics an archive wants).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass
from pathlib import Path

from docker_etl_spark.plans.projectdata import FileProject

KINDS = ("table", "view", "routine")


@dataclass(frozen=True)
class SchemaRef:
    """A ``dataset.name`` object reference (bqhelpers SchemaId, minus
    the project component the engine doesn't have)."""

    dataset: str
    name: str

    @classmethod
    def from_str(cls, ref: str, default_dataset: str) -> SchemaRef:
        parts = ref.split(".")
        if len(parts) == 1:
            return cls(default_dataset, parts[0])
        if len(parts) == 2:
            return cls(parts[0], parts[1])
        raise ValueError(f"invalid schema ref {ref!r}")

    def __str__(self) -> str:
        return f"{self.dataset}.{self.name}"


@dataclass(frozen=True)
class Rescore:
    """One named rescore: why it exists, which routines it replaces,
    and whether it is staging-only (never auto-deployed)."""

    name: str
    reason: str
    routine_updates: tuple[SchemaRef, ...] = ()
    stage: bool = False

    # -- naming transforms (rescores.py:31-59) -----------------------
    def staging_ref(self, kind: str, ref: SchemaRef) -> SchemaRef:
        """Staging twin: ``rescore_<name>_<obj>`` in the same dataset
        (upper-cased prefix for routines)."""
        _check_kind(kind)
        prefix = f"rescore_{self.name}"
        if kind == "routine":
            prefix = prefix.upper()
        return SchemaRef(ref.dataset, f"{prefix}_{ref.name}")

    def archive_ref(self, kind: str, ref: SchemaRef) -> SchemaRef:
        """Archive home for the pre-rescore definition:
        ``<obj>_before_rescore_<name>`` in ``<dataset>_archive``."""
        _check_kind(kind)
        suffix = f"before_rescore_{self.name}"
        if kind == "routine":
            suffix = suffix.upper()
        return SchemaRef(f"{ref.dataset}_archive", f"{ref.name}_{suffix}")

    def delta_ref(self, dataset: str) -> SchemaRef:
        """The old-vs-new per-entity score delta table."""
        return SchemaRef(dataset, f"rescore_{self.name}_delta")

    def staging_routine_refs(self) -> dict[SchemaRef, SchemaRef]:
        return {
            r: self.staging_ref("routine", r) for r in self.routine_updates
        }

    def archive_routine_refs(self) -> dict[SchemaRef, SchemaRef]:
        return {
            r: self.archive_ref("routine", r) for r in self.routine_updates
        }


def _check_kind(kind: str) -> None:
    if kind not in KINDS:
        raise ValueError(f"kind must be one of {KINDS}, got {kind!r}")


def _rescores_path(root: str | Path) -> Path:
    return (Path(root) / "metrics" / "rescores.toml").absolute()


def load(root: str | Path, default_dataset: str) -> dict[str, Rescore]:
    """Parse ``<root>/metrics/rescores.toml`` (rescores.py:84-100):
    ``{name: {reason, routine_updates, stage?}}``."""
    path = _rescores_path(root)
    with open(path, "rb") as f:
        data = tomllib.load(f)
    out: dict[str, Rescore] = {}
    for name, dfn in data.items():
        if not isinstance(dfn, dict) or "reason" not in dfn:
            raise ValueError(f"{path}: rescore {name!r} needs a 'reason'")
        updates = dfn.get("routine_updates", [])
        if not isinstance(updates, list) or not all(
            isinstance(u, str) for u in updates
        ):
            raise ValueError(
                f"{path}: rescore {name!r} routine_updates must be strings"
            )
        out[name] = Rescore(
            name=name,
            reason=str(dfn["reason"]),
            routine_updates=tuple(
                SchemaRef.from_str(u, default_dataset) for u in updates
            ),
            stage=bool(dfn.get("stage", False)),
        )
    return out


def _toml_str(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def dump(rescores: dict[str, Rescore]) -> str:
    """Serialize back to TOML text (reference uses tomli_w; the
    container has only the stdlib reader, so a minimal emitter —
    round-trips through ``load`` for the fields the schema allows)."""
    lines: list[str] = []
    for name, r in rescores.items():
        lines.append(f"[{name}]")
        lines.append(f"reason = {_toml_str(r.reason)}")
        lines.append(
            "routine_updates = ["
            + ", ".join(_toml_str(str(u)) for u in r.routine_updates)
            + "]"
        )
        if r.stage:  # exclude_defaults, like the reference's dump
            lines.append("stage = true")
        lines.append("")
    return "\n".join(lines)


def update(root: str | Path, rescore: Rescore, write: bool = True) -> str:
    """Add/replace one rescore entry in rescores.toml
    (rescores.py:103-116). Returns the serialized text; writes it
    only when ``write`` (the reference's dry-run contract)."""
    path = _rescores_path(root)
    current = load(root, default_dataset="")
    current[rescore.name] = rescore
    text = dump(current)
    if write:
        path.write_text(text)
    return text


def get_undeployed_rescores(
    rescore_dfns: dict[str, Rescore], deployed_names: set[str]
) -> dict[str, Rescore]:
    """Rescores declared on disk but absent from the deployment log,
    excluding staging-only ones (metric_rescore.py:205-220)."""
    missing = {
        name: r
        for name, r in rescore_dfns.items()
        if name not in deployed_names and not r.stage
    }
    return missing


def pick_rescore_to_deploy(
    rescore_dfns: dict[str, Rescore], deployed_names: set[str]
) -> Rescore | None:
    """The reference's one-at-a-time rule (metric_rescore.py:221-236):
    zero undeployed → None; exactly one → it; more → error."""
    undeployed = get_undeployed_rescores(rescore_dfns, deployed_names)
    if not undeployed:
        return None
    if len(undeployed) > 1:
        raise ValueError(
            "Can only deploy one rescore at a time, found "
            + ", ".join(sorted(undeployed))
        )
    return next(iter(undeployed.values()))


def archive_objects(
    project: FileProject, rescore: Rescore, refs: list[tuple[str, SchemaRef]]
) -> list[str]:
    """Snapshot currently-deployed views/tables under their archive
    names BEFORE a rescore redeploys scoring logic — the engine twin
    of the reference keeping ``*_before_rescore_*`` copies queryable.

    Each (kind, ref) re-registers the object's CURRENT plan as a temp
    view named with the archive physical name. Routines cannot be
    plan-snapshotted (SQL functions have no handle to copy); archive
    their *rendered text* at deploy time instead — callers pass
    tables/views here.
    """
    out = []
    for kind, ref in refs:
        if kind == "routine":
            raise ValueError(
                "routines are archived as rendered SQL text, not plans"
            )
        arch = rescore.archive_ref(kind, ref)
        phys = project.physical_name(ref.dataset, ref.name)
        arch_phys = project.physical_name(arch.dataset, arch.name)
        project.spark.table(phys).createOrReplaceTempView(arch_phys)
        out.append(arch_phys)
    return out
