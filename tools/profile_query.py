"""Per-job profile of one registry query via the Spark event log.

Usage: python tools/profile_query.py <query_name> [<query_name> ...]

Runs each query once to warm the JVM/store caches, then re-runs it
timed with event logging on, and prints a per-job breakdown (job
duration + callsite) plus the gaps between jobs (driver-side time).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from docker_etl_spark.queries import QUERIES  # noqa: E402
from docker_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        app_name="profile-query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    # Warm: JVM, parquet footers, python workers
    QUERIES["j01_star_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    par = spark.sparkContext.defaultParallelism
    (
        spark.range(par * 4, numPartitions=par)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    spans: dict[str, tuple[float, float]] = {}
    for name in names:
        # one warm pass (uncounted), one profiled pass — mirrors the
        # bench's best-of-2 discipline
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        spans[name] = (t0 * 1000, t1 * 1000)
        print(f"== {name}: {t1 - t0:.2f}s wall")
    spark.stop()

    # parse the event log (plain file, or eventlog_v2_<appid>/ dir)
    import glob

    cands = glob.glob(os.path.join(evdir, f"*{app_id}*"))
    lines: list[str] = []
    for c in cands:
        if os.path.isdir(c):
            for f in sorted(glob.glob(os.path.join(c, "events*"))):
                lines.extend(open(f).read().splitlines())
        else:
            lines.extend(open(c).read().splitlines())
    jobs = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties", {}) or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "callsite": props.get("callSite.short", ""),
                    "desc": props.get("spark.job.description", ""),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]

    for name, (s, e) in spans.items():
        print(f"\n==== {name} ====")
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("start", 0) >= s - 50 and j.get("end", 0) <= e + 50
        ]
        prev_end = s
        tot_job = 0.0
        tot_gap = 0.0
        for jid, j in sel:
            gap = (j["start"] - prev_end) / 1000
            dur = (j.get("end", j["start"]) - j["start"]) / 1000
            tot_job += dur
            tot_gap += max(gap, 0)
            label = j["desc"] or j["callsite"]
            print(f"  gap {gap:6.3f}s | job {jid:4d} {dur:7.3f}s  {label[:90]}")
            prev_end = j.get("end", j["start"])
        tail = (e - prev_end) / 1000
        print(
            f"  tail gap {tail:.3f}s | jobs total {tot_job:.2f}s, "
            f"gaps total {tot_gap + max(tail, 0):.2f}s"
        )


if __name__ == "__main__":
    main()
