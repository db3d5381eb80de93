#!/usr/bin/env python3
"""Dev-only: summarize a Spark event log (jobs, stages, task time split).

Usage: python3 tools/stageprof.py <event-log-file> [minMs]
Prints per-job wall, per-stage task-time totals and the executor-side
breakdown (executorRunTime vs shuffle fetch wait vs GC) so a slow query's
seconds can be attributed to stages instead of guessed (guide §1/§7).
"""
import json, sys, collections

def main(path, min_ms=50):
    jobs = {}          # jobId -> [t0, t1, desc]
    stage_info = {}    # stageId -> dict
    stage_tasks = collections.defaultdict(lambda: collections.Counter())
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jobs[e["Job ID"]] = [e["Submission Time"], None,
                                 e.get("Properties", {}).get("spark.job.description", "")]
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]][1] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stage_info[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:80],
                "tasks": si["Number of Tasks"],
                "wall": (si.get("Completion Time", 0) - si.get("Submission Time", 0)),
            }
        elif ev == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            sid = e["Stage ID"]
            c = stage_tasks[sid]
            c["run"] += m.get("Executor Run Time", 0)
            c["cpu"] += m.get("Executor CPU Time", 0) // 1000000
            c["gc"] += m.get("JVM GC Time", 0)
            c["deser"] += m.get("Executor Deserialize Time", 0)
            c["rser"] += m.get("Result Serialization Time", 0)
            srm = m.get("Shuffle Read Metrics") or {}
            c["fetchwait"] += srm.get("Fetch Wait Time", 0)
            c["shread"] += srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
            swm = m.get("Shuffle Write Metrics") or {}
            c["shwrite"] += swm.get("Shuffle Bytes Written", 0)
            c["shwtime"] += swm.get("Shuffle Write Time", 0) // 1000000
            im = m.get("Input Metrics") or {}
            c["input"] += im.get("Bytes Read", 0)
            c["spill"] += m.get("Disk Bytes Spilled", 0)
            c["n"] += 1
    print("== jobs ==")
    for jid, (t0, t1, desc) in sorted(jobs.items()):
        if t1 and t1 - t0 >= min_ms:
            print(f"job {jid:4d}  {t1 - t0:7d} ms  {desc[:70]}")
    print("== stages (task-time totals, ms) ==")
    rows = []
    for sid, c in stage_tasks.items():
        info = stage_info.get(sid, {})
        rows.append((c["run"], sid, c, info))
    rows.sort(reverse=True)
    for run, sid, c, info in rows:
        if run < min_ms:
            continue
        print(f"stage {sid:4d} wall={info.get('wall', 0):6d} tasks={c['n']:4d} "
              f"run={c['run']:7d} cpu={c['cpu']:7d} gc={c['gc']:5d} "
              f"fetchw={c['fetchwait']:5d} shread={c['shread']//1024:7d}K "
              f"shwrite={c['shwrite']//1024:7d}K input={c['input']//1024:7d}K "
              f"spill={c['spill']//1024}K  {info.get('name', '')}")

if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 50)
