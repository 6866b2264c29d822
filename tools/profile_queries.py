"""Deterministic per-query profile: jobs, stages, tasks, input/shuffle
bytes and Python-boundary time per bench query, from the Spark event log.

The r16 optimization round runs on a host with heavy hypervisor CPU
steal (measured: steal time ~2x the CPU actually granted during a probe
run), so raw wall-clock is unreliable evidence. Jobs/stages/tasks and
shuffle/input BYTES are properties of the plan, not the host — they are
the primary before/after metric; wall medians are secondary.

Method: one session with spark.eventLog.enabled, each query executed
``reps`` times under a distinct job description ``name#rep`` (set BEFORE
query construction, so eager constructor jobs — localCheckpoints, stats
collects — are charged to the query, exactly as bench.py pays them).
After the run, the event log maps job -> description and stage -> job,
and sums task metrics per (query, rep).

Usage: python tools/profile_queries.py [sf_dir] [out.json] [query ...]
(defaults: /root/testdata/sf0.1, /tmp/profile_queries.json, bench list)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from datamunging_spark import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def run(sf_dir: str, names: list[str], reps: int) -> tuple[str, dict]:
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        "profile",
        **{
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{EVDIR}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    entrymod.q_r13_count(spark, sf_dir).count()  # warm
    walls: dict[str, list[float]] = {}
    for name in names:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        walls[name] = []
        for r in range(reps):
            sc.setJobDescription(f"{name}#{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls[name].append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()
    return app_id, walls


def parse(app_id: str) -> dict:
    """Aggregate event-log task metrics per job-description."""
    # Spark 4 local mode writes a v2 event-log DIRECTORY
    # (eventlog_v2_<app>/events_1_<app>...); fall back to the flat file.
    path = os.path.join(EVDIR, app_id)
    cands = [
        os.path.join(EVDIR, d)
        for d in os.listdir(EVDIR)
        if app_id in d
    ]
    if cands and os.path.isdir(cands[0]):
        parts = sorted(
            f for f in os.listdir(cands[0]) if f.startswith("events")
        )
        paths = [os.path.join(cands[0], p) for p in parts]
    else:
        paths = [path]
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    agg: dict[str, dict] = {}

    def bucket(desc: str) -> dict:
        return agg.setdefault(
            desc,
            {
                "jobs": 0,
                "stages": 0,
                "tasks": 0,
                "input_mb": 0.0,
                "shuffle_read_mb": 0.0,
                "shuffle_write_mb": 0.0,
                "task_time_s": 0.0,
                "gc_s": 0.0,
                "python_s": 0.0,
            },
        )

    def lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    if True:
        for line in lines():
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description"
                ) or "_untagged"
                jid = ev["Job ID"]
                job_desc[jid] = desc
                bucket(desc)["jobs"] += 1
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif t == "SparkListenerStageCompleted":
                sid = ev["Stage Info"]["Stage ID"]
                desc = job_desc.get(stage_job.get(sid, -1), "_untagged")
                bucket(desc)["stages"] += 1
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                desc = job_desc.get(stage_job.get(sid, -1), "_untagged")
                b = bucket(desc)
                m = ev.get("Task Metrics") or {}
                b["tasks"] += 1
                b["task_time_s"] += m.get("Executor Run Time", 0) / 1e3
                b["gc_s"] += m.get("JVM GC Time", 0) / 1e3
                b["input_mb"] += (
                    m.get("Input Metrics", {}).get("Bytes Read", 0) / 1e6
                )
                b["shuffle_read_mb"] += (
                    m.get("Shuffle Read Metrics", {}).get(
                        "Remote Bytes Read", 0
                    )
                    + m.get("Shuffle Read Metrics", {}).get(
                        "Local Bytes Read", 0
                    )
                ) / 1e6
                b["shuffle_write_mb"] += (
                    m.get("Shuffle Write Metrics", {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    / 1e6
                )
                # python boundary time surfaces as an accumulator on
                # ArrowEvalPython/BatchEvalPython stage; approximate from
                # the named update if present
                for acc in ev.get("Task Info", {}).get("Accumulables", []):
                    if acc.get("Name") == "time to run Python workers" and \
                            isinstance(acc.get("Update"), (int, float)):
                        b["python_s"] += acc["Update"] / 1e3
    return agg


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_queries.json"
    names = sys.argv[3:] or BENCH_QUERIES
    reps = max(1, int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2")))
    app_id, walls = run(sf_dir, names, reps)
    agg = parse(app_id)
    # fold reps: rep 0 = cold (constructor caches empty), last rep = warm
    merged: dict[str, dict] = {}
    for name in names:
        per_rep = [agg.get(f"{name}#{r}", {}) for r in range(reps)]
        warm = per_rep[-1] or {}
        merged[name] = {
            "wall": walls[name],
            "warm": {k: round(v, 2) for k, v in warm.items()},
            "cold_jobs": per_rep[0].get("jobs", 0),
        }
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    hdr = (
        f"{'query':24s} {'wall(reps)':>22s} {'jobs':>5s} {'stg':>4s} "
        f"{'tasks':>6s} {'in_mb':>8s} {'shR_mb':>8s} {'shW_mb':>8s} "
        f"{'cpu_s':>7s} {'py_s':>6s}"
    )
    print(hdr)
    for name in names:
        m = merged[name]
        w = m["warm"]
        print(
            f"{name:24s} {str(m['wall']):>22s} {w.get('jobs',0):>5.0f} "
            f"{w.get('stages',0):>4.0f} {w.get('tasks',0):>6.0f} "
            f"{w.get('input_mb',0):>8.1f} {w.get('shuffle_read_mb',0):>8.1f} "
            f"{w.get('shuffle_write_mb',0):>8.1f} "
            f"{w.get('task_time_s',0):>7.1f} {w.get('python_s',0):>6.1f}"
        )


if __name__ == "__main__":
    main()
