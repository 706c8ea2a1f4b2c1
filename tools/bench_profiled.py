"""bench.py twin with event logging + per-query span capture.

Writes /tmp/bench_profile.json: for each query and pass, the wall
time; plus the parsed event-log jobs so each query's wall can be
split into job time vs driver gaps. Measurement-only tool; the real
bench.py is unchanged.
"""

from __future__ import annotations

import glob
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        app_name="bench-profiled",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    names = sorted(QUERIES)
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

    spans = []  # (name, pass, t0_ms, t1_ms)
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    for p in range(max(1, passes)):
        for name in names:
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t1 = time.time()
            spans.append((name, p, t0 * 1000, t1 * 1000))
    spark.stop()
    with open('/tmp/bench_spans.json', 'w') as fh:
        json.dump({'spans': spans, 'app_id': app_id}, fh)

    jobs = []
    cands = glob.glob(os.path.join(evdir, f"*{app_id}*"))
    lines: list[str] = []
    for c in cands:
        if os.path.isdir(c):
            for f in sorted(glob.glob(os.path.join(c, "events*"))):
                lines.extend(open(f).read().splitlines())
        else:
            lines.extend(open(c).read().splitlines())
    jmap = {}
    for line in lines:
        try:
            ev = json.loads(line)
        except Exception:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            props = ev.get("Properties", {}) or {}
            jmap[ev["Job ID"]] = {
                "start": ev["Submission Time"],
                "callsite": props.get("callSite.short", ""),
            }
        elif ev.get("Event") == "SparkListenerJobEnd":
            j = jmap.get(ev["Job ID"])
            if j:
                j["end"] = ev["Completion Time"]
                jobs.append(j)

    out = {"spans": spans, "jobs": jobs}
    with open("/tmp/bench_profile.json", "w") as fh:
        json.dump(out, fh)
    timings: dict[str, float] = {}
    for name, p, t0, t1 in spans:
        el = (t1 - t0) / 1000
        if name not in timings or el < timings[name]:
            timings[name] = round(el, 4)
    total = round(sum(timings.values()), 4)
    print(json.dumps({"value": total, "n": len(timings)}))


if __name__ == "__main__":
    main()
