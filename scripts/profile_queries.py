"""Per-query profiling harness for the optimization rounds.

Runs named registry queries through the noop sink on a UI-enabled local
session and, for each, reports where the wall-clock went using the Spark
UI REST API: per-job durations (grouped by job description), stage task
time, shuffle read/write bytes, and the gap between wall time and job
time (driver-side planning/collect overhead).

Usage: python scripts/profile_queries.py <query> [query ...]
       python scripts/profile_queries.py --sf /root/testdata/sf0.1 <query>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402


def build_spark(cpus: int) -> SparkSession:
    from dataingestionplayground_spark.session import ensure_package_on_workers

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_package_on_workers(spark)
    return spark


def _rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def profile(spark, name, fn, sf_dir, n_runs=3):
    import gc

    from dataingestionplayground_spark.operators.prefix import release_prefix_caches

    def run():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    release_prefix_caches()
    gc.collect()
    spark.catalog.clearCache()
    run()  # warm-up
    best = None
    for i in range(n_runs):
        spark.catalog.clearCache()
        desc = f"{name}#timed{i}"
        spark.sparkContext.setJobDescription(desc)
        t0 = time.perf_counter()
        run()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        if best is None or wall < best[0]:
            best = (wall, desc)
    wall, desc = best
    jobs = [j for j in _rest(spark, "jobs") if j.get("description") == desc]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    stages = {s["stageId"]: s for s in _rest(spark, "stages")
              if s["stageId"] in set(stage_ids) and s["status"] != "SKIPPED"}
    job_time = 0.0
    for j in jobs:
        try:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        except (KeyError, ValueError):
            continue
        job_time += max(0.0, time.mktime(t1) - time.mktime(t0))
    out = {
        "query": name,
        "wall_sec": round(wall, 3),
        "n_jobs": len(jobs),
        "n_stages": len(stages),
        "job_wall_sec_approx": round(job_time, 1),
        "stages": [],
    }
    for sid in sorted(stages):
        s = stages[sid]
        out["stages"].append({
            "stage": sid,
            "name": s["name"].split("\n")[0][:80],
            "tasks": s["numCompleteTasks"],
            "task_time_sec": round(s.get("executorRunTime", 0) / 1000, 2),
            "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 2),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
        })
    return out


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    os.environ.setdefault("SPARK_GRAFT_TWONN_PROBES", "64")
    from dataingestionplayground_spark.queries import all_queries

    reg = all_queries()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    # session warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in args:
        prof = profile(spark, name, reg[name].fn, sf_dir)
        print(json.dumps(prof, indent=1))


if __name__ == "__main__":
    main()
