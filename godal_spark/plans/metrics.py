"""Shuffle/skew metrics from the Spark event log.

BASELINE.md's protocol wants shuffle read/write bytes and max/median
task time (the skew indicator) per benchmark run. With the UI disabled,
the event log is the clean source: enable it at session build
(`get_spark(extra=event_log_conf(dir))`), run the job, then
`task_metrics(dir)` aggregates SparkListenerTaskEnd events.
"""

from __future__ import annotations

import json
import os
from statistics import median


def event_log_conf(log_dir: str) -> dict[str, str]:
    os.makedirs(log_dir, exist_ok=True)
    return {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{log_dir}",
        "spark.eventLog.compress": "false",  # plain JSONL (no zstd lib here)
    }


def task_metrics(log_dir: str) -> dict:
    """Aggregate all task-end events across the app logs in log_dir."""
    durations: list[float] = []
    shuffle_read = shuffle_write = spill = 0
    paths = []
    for root, _, files in os.walk(log_dir):  # v2 logs are directories
        paths.extend(os.path.join(root, f) for f in files
                     if not f.startswith("appstatus"))
    for path in paths:
        with open(path, errors="ignore") as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                info = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                if info.get("Finish Time") and info.get("Launch Time"):
                    durations.append((info["Finish Time"] - info["Launch Time"]) / 1000.0)
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                shuffle_read += srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
                shuffle_write += swm.get("Shuffle Bytes Written", 0)
                spill += tm.get("Disk Bytes Spilled", 0)
    if not durations:
        return {"n_tasks": 0}
    return {
        "n_tasks": len(durations),
        "task_time_max_s": round(max(durations), 3),
        "task_time_median_s": round(median(durations), 3),
        "skew_ratio_max_over_median": round(max(durations) / max(median(durations), 1e-9), 2),
        "shuffle_read_bytes": shuffle_read,
        "shuffle_write_bytes": shuffle_write,
        "disk_spill_bytes": spill,
    }
