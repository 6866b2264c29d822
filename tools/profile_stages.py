"""Per-STAGE drill-down of a profile_queries.py event log: for one query
description, list its stages with task counts, CPU, bytes and the stage
name (the operator scope), hottest first. Finds WHICH stage of a
composite burns the CPU/tasks that profile_queries.py reported.

Usage: python tools/profile_stages.py <query>#<rep> [top_n]
(reads the latest event log under /tmp/spark-events-profile)
"""

from __future__ import annotations

import json
import os
import sys

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    want = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    dirs = sorted(
        (os.path.join(EVDIR, d) for d in os.listdir(EVDIR)),
        key=os.path.getmtime,
    )
    paths = []
    for d in dirs[-1:]:
        if os.path.isdir(d):
            paths = [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.startswith("events")
            ]
        else:
            paths = [d]
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    stages: dict[int, dict] = {}

    for p in paths:
        with open(p) as fh:
            for line in fh:
                ev = json.loads(line)
                t = ev.get("Event")
                if t == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description"
                    ) or "_untagged"
                    job_desc[ev["Job ID"]] = desc
                    for sid in ev.get("Stage IDs", []):
                        stage_job[sid] = ev["Job ID"]
                elif t == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    if job_desc.get(stage_job.get(sid, -1)) != want:
                        continue
                    scopes = []
                    for ri in si.get("RDD Info", [])[:40]:
                        sc = ri.get("Scope")
                        if sc:
                            try:
                                scopes.append(json.loads(sc).get("name", ""))
                            except Exception:
                                pass
                    stages[sid] = {
                        "name": si.get("Stage Name", ""),
                        "scopes": " <- ".join(dict.fromkeys(scopes)),
                        "details": (si.get("Details") or "").split("\n")[0],
                        "tasks": 0,
                        "cpu_s": 0.0,
                        "input_mb": 0.0,
                        "sh_r_mb": 0.0,
                        "sh_w_mb": 0.0,
                        "rows_out": 0,
                    }
                elif t == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    if sid not in stages:
                        continue
                    b = stages[sid]
                    m = ev.get("Task Metrics") or {}
                    b["tasks"] += 1
                    b["cpu_s"] += m.get("Executor Run Time", 0) / 1e3
                    b["input_mb"] += (
                        m.get("Input Metrics", {}).get("Bytes Read", 0) / 1e6
                    )
                    sr = m.get("Shuffle Read Metrics", {})
                    b["sh_r_mb"] += (
                        sr.get("Remote Bytes Read", 0)
                        + sr.get("Local Bytes Read", 0)
                    ) / 1e6
                    b["sh_w_mb"] += (
                        m.get("Shuffle Write Metrics", {}).get(
                            "Shuffle Bytes Written", 0
                        )
                        / 1e6
                    )

    rows = sorted(
        stages.items(), key=lambda kv: -kv[1]["cpu_s"]
    )[:top_n]
    for sid, b in rows:
        print(
            f"stage {sid:5d} tasks={b['tasks']:4d} cpu={b['cpu_s']:7.1f}s "
            f"in={b['input_mb']:7.1f}MB shR={b['sh_r_mb']:6.1f} "
            f"shW={b['sh_w_mb']:6.1f}  {b['scopes'][:140]}"
        )


if __name__ == "__main__":
    main()
