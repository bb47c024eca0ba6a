"""Event-log decomposition of the schedule job's timed region.

Runs ONE timed rep of the north-rule schedule pipeline (same shape as
bench.run_schedule_job) with event logging on, tagging the timed region
with a job group, then decomposes its wall time into:

  ideal   — sum(task time)/cores: the perfectly-parallel part
  tail    — per-stage (stage wall − ideal): scheduling waves, stragglers,
            and skew inside stages
  gaps    — wall not covered by ANY running timed stage: driver planning,
            broadcast builds, catalog ops, file renames, AQE re-plans

Non-scaling time = tail + gaps. Run at two levels and diff:

    taskset -c 0-3  python scripts/exp_eventlog_sched.py --cpus 4
    taskset -c 0-15 python scripts/exp_eventlog_sched.py --cpus 16
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F

LOG_DIR = "/tmp/sparklogs"


def run(cpus: int, n: int, n_hosts: int = 10_000) -> str:
    os.makedirs(LOG_DIR, exist_ok=True)
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
        f"spark.eventLog.enabled=true;spark.eventLog.dir={LOG_DIR};"
        "spark.eventLog.compress=false"
    )
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    import bench
    from crawler_service_spark.functions.urls import canonicalize_frame, host_native
    from crawler_service_spark.operators.dedup import (
        anti_join_seen, first_occurrence, with_key_hash)
    from crawler_service_spark.operators.politeness import presalt, schedule_round

    spark = bench.build_spark(cpus, "exp-eventlog-sched")
    spark.sparkContext.setLogLevel("ERROR")
    parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
    rank_parts = int(os.environ.get("SPARK_GRAFT_RANK_PARTS", "64"))

    # resolved ONCE from the MEASURED n, mirroring bench.run_schedule_job
    # (warmup exercises the same early/late branch — ADVICE r04)
    host_stage = bench.resolve_host_stage(n, cpus)

    def run_pipeline(src, seen_df, n_rows):
        # mirror bench.run_schedule_job exactly (HOST_STAGE + counts_src)
        b = canonicalize_frame(src, "url")
        if host_stage == "early":
            b = b.withColumn("host", host_native(F.col("url")))
        b = first_occurrence(b, ["canon_url"], ["discovery_seq"],
                             keep_hash=True, strategy=bench.DEDUP_STRATEGY)
        b = anti_join_seen(b, seen_df, ["canon_url"],
                           shuffle_hash=True, hash_key=True)
        if host_stage == "late":
            b = b.withColumn("host", host_native(F.col("url")))
        # track the bench lever (SPARK_GRAFT_SALT_DENOM), not a hardcoded
        # 64 — the mirror must profile the same plan bench.py times
        salt_width = max(1 << 14, n_rows // bench.SALT_DENOM)
        b = bench.snapshot_bucket_sorted(
            spark, presalt(b, salt_width), "sched_round",
            rank_parts, ["host", "_salt"],
            ["host", "depth", "_salt", "discovery_seq"])
        admitted, _ = schedule_round(
            b, None, default_limit=10, default_window_s=60,
            round_epoch=0.0, priority_col="depth",
            rank_strategy="presalted")
        bench.force(admitted)
        return b

    frontier = bench.synth_frontier(spark, n, n_hosts).persist()
    frontier.count()
    seen = (canonicalize_frame(
        bench.synth_frontier(spark, n, n_hosts)
        .filter(F.col("discovery_seq") % 3 == 0), "url")
        .select("canon_url"))
    seen = with_key_hash(seen.select("canon_url"), ["canon_url"])
    seen = seen.repartition(parts, "_kh", "canon_url").persist()
    seen.count()

    wf = bench.synth_frontier(spark, max(100_000, n // 40), n_hosts)
    run_pipeline(wf, seen, max(100_000, n // 40))
    bench.settle(spark)

    sc = spark.sparkContext
    sc.setJobGroup("timed", "timed schedule rep")
    t0 = time.monotonic()
    run_pipeline(frontier, seen, n)
    wall = time.monotonic() - t0
    sc.setJobGroup("untimed", "")
    app_id = sc.applicationId
    print(f"WALL {wall:.3f}s cpus={cpus} n={n}", file=sys.stderr)
    spark.stop()
    import shutil
    shutil.rmtree(bench.SNAP_DIR, ignore_errors=True)
    return app_id, wall


def analyze(app_id: str, wall: float, cpus: int) -> dict:
    path = os.path.join(LOG_DIR, app_id)
    if os.path.exists(path):
        paths = [path]
    else:
        # Spark 4 rolling event-log layout
        d = os.path.join(LOG_DIR, f"eventlog_v2_{app_id}")
        paths = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.startswith("events_")]
    timed_jobs: set[int] = set()
    job_stages: dict[int, list[int]] = {}
    stage_info: dict[int, dict] = {}
    stage_task_ms: dict[int, float] = {}
    stage_detail: dict[int, dict] = {}
    job_span: dict[int, list[float]] = {}
    import itertools
    for line in itertools.chain.from_iterable(open(p) for p in paths):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jid = ev["Job ID"]
            if props.get("spark.jobGroup.id") == "timed":
                timed_jobs.add(jid)
                job_stages[jid] = [s["Stage ID"] for s in ev["Stage Infos"]]
                job_span[jid] = [ev["Submission Time"], None]
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in timed_jobs:
                job_span[jid][1] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stage_info[si["Stage ID"]] = si
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = (ev.get("Task Metrics") or {})
            rt = tm.get("Executor Run Time", 0) or 0
            # include deserialize + result serialize: occupies the core
            rt += (tm.get("Executor Deserialize Time", 0) or 0)
            rt += (tm.get("Result Serialization Time", 0) or 0)
            stage_task_ms[sid] = stage_task_ms.get(sid, 0.0) + rt
            d = stage_detail.setdefault(sid, {
                "gc": 0.0, "fetch_wait": 0.0, "write_time": 0.0,
                "spill_bytes": 0, "read_mb": 0.0, "write_mb": 0.0,
                "cpu": 0.0})
            d["gc"] += (tm.get("JVM GC Time", 0) or 0) / 1000
            d["cpu"] += (tm.get("Executor CPU Time", 0) or 0) / 1e9
            srm = tm.get("Shuffle Read Metrics") or {}
            d["fetch_wait"] += (srm.get("Fetch Wait Time", 0) or 0) / 1000
            d["read_mb"] += ((srm.get("Local Bytes Read", 0) or 0)
                             + (srm.get("Remote Bytes Read", 0) or 0)) / 1e6
            swm = tm.get("Shuffle Write Metrics") or {}
            d["write_time"] += (swm.get("Shuffle Write Time", 0) or 0) / 1e9
            d["write_mb"] += (swm.get("Shuffle Bytes Written", 0) or 0) / 1e6
            d["spill_bytes"] += (tm.get("Disk Bytes Spilled", 0) or 0)
            ti = ev.get("Task Info") or {}
            lt, ft = ti.get("Launch Time"), ti.get("Finish Time")
            if lt and ft:
                d["first_launch"] = min(d.get("first_launch", lt), lt)
                d["last_finish"] = max(d.get("last_finish", 0), ft)

    timed_stage_ids = sorted(
        sid for jid in timed_jobs for sid in job_stages[jid]
        if sid in stage_info and stage_info[sid].get("Submission Time"))
    # wall covered by >=1 running timed stage (interval union)
    ivals = sorted(
        (stage_info[s]["Submission Time"], stage_info[s]["Completion Time"])
        for s in timed_stage_ids)
    covered = 0.0
    cur_s = cur_e = None
    for s, e in ivals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    jspans = [sp for sp in job_span.values() if sp[1]]
    region = (max(e for _, e in jspans) - min(s for s, _ in jspans)) / 1000
    stages = []
    for sid in timed_stage_ids:
        si = stage_info[sid]
        sw = (si["Completion Time"] - si["Submission Time"]) / 1000
        ideal = stage_task_ms.get(sid, 0.0) / 1000 / cpus
        stages.append({
            "id": sid, "name": si["Stage Name"].split("\n")[0][:70],
            "tasks": si["Number of Tasks"], "wall_s": round(sw, 2),
            "ideal_s": round(ideal, 2), "tail_s": round(sw - ideal, 2)})
    total_ideal = sum(s["ideal_s"] for s in stages)
    total_stage_wall = sum(s["wall_s"] for s in stages)
    gaps = region - covered / 1000
    out = {
        "cpus": cpus, "wall_s": round(wall, 2), "region_s": round(region, 2),
        "ideal_s": round(total_ideal, 2),
        "tail_s": round(total_stage_wall - total_ideal, 2),
        "stage_wall_s": round(total_stage_wall, 2),
        "covered_s": round(covered / 1000, 2),
        "gaps_s": round(gaps, 2),
        "n_jobs": len(timed_jobs), "n_stages": len(stages),
    }
    print(json.dumps(out))
    for s in sorted(stages, key=lambda x: -x["wall_s"]):
        d = stage_detail.get(s["id"], {})
        if "first_launch" in d:
            si = stage_info[s["id"]]
            s["pre_s"] = round((d["first_launch"] - si["Submission Time"]) / 1000, 2)
            s["task_span_s"] = round((d["last_finish"] - d["first_launch"]) / 1000, 2)
        print(f"  stage {s['id']:>4} wall {s['wall_s']:>7.2f} ideal "
              f"{s['ideal_s']:>7.2f} tail {s['tail_s']:>6.2f} "
              f"tasks {s['tasks']:>4} | cpu {d.get('cpu', 0):>7.1f} gc "
              f"{d.get('gc', 0):>6.1f} fwait {d.get('fetch_wait', 0):>5.1f} "
              f"swrite {d.get('write_time', 0):>5.1f} rd "
              f"{d.get('read_mb', 0):>7.0f}MB wr {d.get('write_mb', 0):>7.0f}MB "
              f"spill {d.get('spill_bytes', 0) >> 20}MB pre "
              f"{s.get('pre_s', 0):>5.2f} span {s.get('task_span_s', 0):>6.2f}"
              f"  {s['name'][:36]}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=32_000_000)
    ap.add_argument("--analyze-only", default=None,
                    help="app id to re-analyze (skip the run)")
    ap.add_argument("--wall", type=float, default=0.0)
    args = ap.parse_args()
    if args.analyze_only:
        analyze(args.analyze_only, args.wall, args.cpus)
        return
    app_id, wall = run(args.cpus, args.n)
    analyze(app_id, wall, args.cpus)


if __name__ == "__main__":
    main()
