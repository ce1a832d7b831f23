"""Job-ladder decomposition for one registry query via the Spark event log.

Usage: python tools/joblog_probe.py <query_name> [sf_dir]

Runs the query once cold (codegen/JIT warm) and once timed, with
spark.eventLog enabled, then parses the event log into the per-job ladder:
job wall time, stage task counts, task-time sums, and the DRIVER GAPS
between jobs (submission latency + pure driver work — planning, collects,
file moves). The gap column is the number the per-batch protocols care
about: at 100 TB the same ladder amortizes over data; locally it IS the
cost. Writes nothing to the repo; prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    logdir = tempfile.mkdtemp(prefix="sparklog_")

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from connemara_spark.session import get_spark  # noqa: F401  (conf parity)

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.appName("joblog-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", logdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from connemara_spark.queries import REGISTRY

    q = REGISTRY[name]
    # warm pass (codegen/JIT; smallest SF)
    q.fn(spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()

    t0 = time.monotonic()
    n = len(q.fn(spark, sf_dir).collect())
    wall = time.monotonic() - t0
    spark.catalog.clearCache()
    # flush the event log
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()

    logs = []
    for root, _dirs, files in os.walk(logdir):
        for f in files:
            if not f.startswith(".") and not f.endswith(".inprogress"):
                logs.append(os.path.join(root, f))
    if not logs:  # the log may still be .inprogress until session stop
        spark.stop()
        for root, _dirs, files in os.walk(logdir):
            logs += [os.path.join(root, f) for f in files if not f.startswith(".")]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(logs[0]) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "ntasks": si["Number of Tasks"],
                    "name": si["Stage Name"][:40],
                }
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                stages.setdefault(sid, {}).setdefault("task_ms", 0)
                info = ev.get("Task Info", {})
                stages[sid]["task_ms"] = stages[sid].get("task_ms", 0) + (
                    info.get("Finish Time", 0) - info.get("Launch Time", 0)
                )

    order = sorted(jobs)
    # jobs from the warm pass are included; keep only the timed window: the
    # last contiguous run whose total spans ~wall. Simpler: report all and
    # mark; the reader slices by the big time gap of clearCache between runs.
    print(f"query={name} rows={n} wall={wall:.2f}s  jobs_total={len(order)}")
    prev_end = None
    for j in order:
        job = jobs[j]
        if "t1" not in job:
            continue
        dur = (job["t1"] - job["t0"]) / 1000.0
        gap = ((job["t0"] - prev_end) / 1000.0) if prev_end else 0.0
        prev_end = job["t1"]
        st = [
            f"{sid}:{stages.get(sid, {}).get('ntasks', '?')}t/"
            f"{stages.get(sid, {}).get('task_ms', 0)}ms:"
            f"{stages.get(sid, {}).get('name', '')[:24]}"
            for sid in job["stages"]
            if sid in stages
        ]
        print(
            f"  job {j:3d}  dur {dur:6.3f}s  gap_before {gap:6.3f}s  "
            f"stages [{', '.join(st)}]  {job['desc']}"
        )
    # roll up by description (phase labels), duration + gap-before charged
    # to the phase whose job follows the gap
    agg: dict[str, list[float]] = {}
    prev_end = None
    for j in order:
        job = jobs[j]
        if "t1" not in job:
            continue
        dur = (job["t1"] - job["t0"]) / 1000.0
        gap = ((job["t0"] - prev_end) / 1000.0) if prev_end else 0.0
        prev_end = job["t1"]
        # strip the batch index so phases aggregate across batches
        import re as _re

        key = _re.sub(r" b\d+:", ":", job["desc"]) or "(unlabelled)"
        a = agg.setdefault(key, [0.0, 0.0, 0])
        a[0] += dur
        a[1] += max(gap, 0.0)
        a[2] += 1
    print("phase rollup (dur / gap / jobs):")
    for k, (d, g, c) in sorted(agg.items(), key=lambda kv: -(kv[1][0] + kv[1][1])):
        print(f"  {d:7.2f}s {g:7.2f}s {c:3d}  {k}")


if __name__ == "__main__":
    main()
