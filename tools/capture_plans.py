"""Dump query plans for registry queries to plans/r14/.

Usage: python tools/capture_plans.py <suffix> <query> [<query> ...]
suffix is "before" or "after".

Two artifacts per query:

- ``{name}_{suffix}.txt`` — ``.explain("formatted")`` of the RETURNED
  frame (the probe plan).
- ``{name}_{suffix}_executed.txt`` — the physical plan description of
  EVERY SQL execution the query ran end-to-end (store writes, sidecar
  fallbacks, bounded collects, the final noop sink), pulled from the
  SQL status store after executing the query the way the bench does.
  This is the write-side evidence the returned-frame explain cannot
  show (r13 verdict item #8): the store-write exchanges, their
  REPARTITION_BY_NUM distribution, and the executed AQE plans.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from docker_etl_spark.queries import QUERIES  # noqa: E402
from docker_etl_spark.session import get_spark  # noqa: E402

OUTDIR = Path(_REPO) / "plans" / "r14"


def _executions(spark):
    """(executionId, description, physicalPlanDescription) of every
    SQL execution recorded in the session's status store."""
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    out = []
    for i in range(lst.size()):
        e = lst.apply(i)
        out.append(
            (
                int(e.executionId()),
                str(e.description()),
                str(e.physicalPlanDescription()),
            )
        )
    return out


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    OUTDIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        app_name="capture-plans",
        extra_conf={"spark.sql.ui.retainedExecutions": "4000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        seen = {e[0] for e in _executions(spark)}
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (OUTDIR / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        # execute the way the bench does so the write-side executions
        # (store mutations, sidecar fallbacks, final sink) all land in
        # the status store
        df.write.format("noop").mode("overwrite").save()
        parts = []
        for eid, desc, plan in _executions(spark):
            if eid in seen:
                continue
            parts.append(
                f"{'=' * 72}\nexecution {eid}: {desc}\n{'=' * 72}\n{plan}\n"
            )
        (OUTDIR / f"{name}_{suffix}_executed.txt").write_text(
            "".join(parts)
        )
        print(f"wrote {name}_{suffix}.txt (+_executed.txt, "
              f"{len(parts)} executions)")
    spark.stop()


if __name__ == "__main__":
    main()
