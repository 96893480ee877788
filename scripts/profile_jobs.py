"""Job/stage-level profiler: runs queries with the Spark event log on
and summarizes where the wall-clock went (jobs, stages, task time,
scheduling gaps). This is the local stand-in for the Spark UI
(disabled in this environment) that guide §1/§7 profiling needs.

Usage: python scripts/profile_jobs.py <query> [...] [--runs N]
       [--conf k=v ...] [--sf DIR] [--cpus N]
       python scripts/profile_jobs.py --parse-only   # re-parse last log

Prints, per query run: wall seconds, number of jobs, stages, tasks,
sum of task time, stage-interval coverage, and the "driver gap" (wall
minus stage coverage = planning/broadcast-build/scheduling latency no
stage accounts for), plus the top stages by duration.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def _analyze(app_id: str, marks: list) -> None:
    cands = [os.path.join(EVDIR, f) for f in os.listdir(EVDIR)
             if app_id and app_id in f]
    if not cands:
        cands = [os.path.join(EVDIR, f) for f in os.listdir(EVDIR)]
    path = max(cands, key=os.path.getmtime)
    files = [path]
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("events")
        )

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    def _open(f):
        if f.endswith(".zstd"):
            import subprocess

            p = subprocess.Popen(
                ["zstd", "-dc", f], stdout=subprocess.PIPE, text=True
            )
            return p.stdout
        return open(f)

    for f in files:
        with _open(f) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "t0": ev["Submission Time"] / 1000.0,
                        "desc": props.get("spark.job.description", ""),
                        "stages": [s["Stage ID"]
                                   for s in ev.get("Stage Infos", [])],
                    }
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = ev["Completion Time"] / 1000.0
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    st = stages.setdefault(sid, {})
                    st.update({
                        "name": si.get("Stage Name", ""),
                        "tasks": si.get("Number of Tasks", 0),
                        "t0": si.get("Submission Time", 0) / 1000.0,
                        "t1": si.get("Completion Time", 0) / 1000.0,
                    })
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info", {})
                    tm = ev.get("Task Metrics") or {}
                    st = stages.setdefault(sid, {})
                    st["task_ms"] = st.get("task_ms", 0) + (
                        ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    )
                    st["gc_ms"] = st.get("gc_ms", 0) + tm.get(
                        "JVM GC Time", 0)
                    st["run_ms"] = st.get("run_ms", 0) + tm.get(
                        "Executor Run Time", 0)
                    st["deser_ms"] = st.get("deser_ms", 0) + tm.get(
                        "Executor Deserialize Time", 0)
                    srm = tm.get("Shuffle Read Metrics") or {}
                    st["fetch_ms"] = st.get("fetch_ms", 0) + srm.get(
                        "Fetch Wait Time", 0)
                    st["spill_b"] = st.get("spill_b", 0) + tm.get(
                        "Disk Bytes Spilled", 0)

    if not marks:  # --parse-only: derive run windows from descriptions
        bydesc: dict[str, list] = {}
        for j in jobs.values():
            if "t1" in j and " run" in j.get("desc", ""):
                bydesc.setdefault(j["desc"], []).append(j)
        marks = [
            (d, min(j["t0"] for j in js), max(j["t1"] for j in js))
            for d, js in sorted(
                bydesc.items(), key=lambda kv: kv[1][0]["t0"])
        ]

    for label, t0, t1 in marks:
        jin = {
            jid: j for jid, j in jobs.items()
            if "t1" in j and j["t0"] >= t0 - 0.05 and j["t1"] <= t1 + 0.05
        }
        sids = sorted({s for j in jin.values() for s in j["stages"]
                       if s in stages and stages[s].get("t1")})
        sin = {s: stages[s] for s in sids}
        ivs = sorted((s["t0"], s["t1"]) for s in sin.values())
        cov = 0.0
        cur0 = cur1 = None
        for a, b in ivs:
            if cur1 is None or a > cur1:
                if cur1 is not None:
                    cov += cur1 - cur0
                cur0, cur1 = a, b
            else:
                cur1 = max(cur1, b)
        if cur1 is not None:
            cov += cur1 - cur0
        wall = t1 - t0
        tt = sum(s.get("task_ms", 0) for s in sin.values()) / 1000.0
        ntasks = sum(s.get("tasks", 0) for s in sin.values())
        gc = sum(s.get("gc_ms", 0) for s in sin.values()) / 1000.0
        rt = sum(s.get("run_ms", 0) for s in sin.values()) / 1000.0
        ds = sum(s.get("deser_ms", 0) for s in sin.values()) / 1000.0
        fw = sum(s.get("fetch_ms", 0) for s in sin.values()) / 1000.0
        sp = sum(s.get("spill_b", 0) for s in sin.values())
        print(f"\n== {label}: wall={wall:.2f}s jobs={len(jin)} "
              f"stages={len(sin)} tasks={ntasks} "
              f"taskTime={tt:.2f}s (run={rt:.1f} gc={gc:.1f} "
              f"deser={ds:.1f} fetchWait={fw:.1f} spill={sp}b) "
              f"stageCover={cov:.2f}s driverGap={wall - cov:.2f}s")
        top = sorted(sin.items(), key=lambda kv: kv[1]["t1"] - kv[1]["t0"],
                     reverse=True)[:12]
        for sid, s in top:
            print(f"   stage {sid}: {s['t1'] - s['t0']:.2f}s "
                  f"tasks={s.get('tasks', 0)} "
                  f"taskTime={s.get('task_ms', 0) / 1000.0:.2f}s "
                  f"{s.get('name', '')[:70]}")


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    conf: dict[str, str] = {}
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--conf":
            k, v = args[i + 1].split("=", 1); conf[k] = v; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--cpus":
            os.environ["SPARK_GRAFT_CPUS"] = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    if names == ["--parse-only"] or (names and names[0] == "--parse-only"):
        _analyze("", [])
        return

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    conf.setdefault("spark.eventLog.enabled", "true")
    conf.setdefault("spark.eventLog.dir", EVDIR)
    conf.setdefault("spark.eventLog.compress", "false")

    from node_etl_spark.plans import QUERIES  # noqa: E402
    from node_etl_spark.session import get_spark  # noqa: E402

    spark = get_spark("profile-jobs", extra_conf=conf)
    spark.range(1).count()

    def _warm_gen(batches):
        yield from batches

    spark.range(100000).repartition(64).mapInPandas(_warm_gen, "id long").count()
    from node_etl_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).count()

    def clear_blocks() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    full = {n.split("_", 1)[0]: n for n in QUERIES}
    marks: list[tuple[str, float, float]] = []
    for want in names:
        name = want if want in QUERIES else full.get(want, want)
        q = QUERIES.get(name)
        if q is None:
            print(f"unknown query {want}")
            continue
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t1 = time.time()
            times.append(t1 - t0)
            marks.append((f"{name} run{r}", t0, t1))
            clear_blocks()
        print(f"{name}: best={min(times):.2f}s runs=" +
              ",".join(f"{t:.2f}" for t in times), flush=True)

    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)
    _analyze(app_id, marks)


if __name__ == "__main__":
    main()
