"""Stage-level profile of registry queries via the Spark UI REST API.

Usage: python tools/profile_query.py <query> [query ...]

Runs each query (same `.count()` methodology as bench.py) on a UI-enabled
session, then prints per-job and per-stage wall / task time / shuffle
bytes so the expensive stage is visible without a browser (guide §7.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from sorting_compressed_time_series_spark.queries import SPARK_QUERIES
    from sorting_compressed_time_series_spark.session import get_spark

    spark = get_spark(app="profile", cores=cpus, shuffle_partitions=max(cpus, 8),
                      extra={"spark.ui.enabled": "true"})
    # warmup: fork workers + warehouse plans (mirror bench.py's sweep)
    from sorting_compressed_time_series_spark.operators.ingest import flush
    from sorting_compressed_time_series_spark.sources.synth import generate_tokens_df

    n = spark.sparkContext.defaultParallelism * 20
    flush(generate_tokens_df(spark, n)).write.mode("overwrite").format("noop").save()
    try:
        SPARK_QUERIES["tokens_pipeline_tiers"](spark, "/root/testdata/sf0.001").count()
    except Exception:  # noqa: BLE001
        pass

    base = spark.sparkContext.uiWebUrl + "/api/v1/applications/" + spark.sparkContext.applicationId
    for name in names:
        fn = SPARK_QUERIES[name]
        jobs_before = {j["jobId"] for j in _get(base + "/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)
        jobs = [j for j in _get(base + "/jobs") if j["jobId"] not in jobs_before]
        stages = {s["stageId"]: s for s in _get(base + "/stages")}
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        for j in sorted(jobs, key=lambda x: x["jobId"]):
            sub = json.loads(json.dumps(j.get("submissionTime", "")))
            comp = j.get("completionTime", "")
            print(f"  job {j['jobId']}: {j['numTasks']} tasks  "
                  f"[{sub[11:23]} -> {str(comp)[11:23]}]")
            for sid in sorted(j.get("stageIds", [])):
                s = stages.get(sid)
                if not s or s.get("status") == "SKIPPED":
                    continue
                dur = ""
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    dur = f"wall={s['completionTime'][11:23]}"
                print(
                    f"    stage {sid:4d} {s['status']:9s} tasks={s['numCompleteTasks']:4d} "
                    f"exec={s.get('executorRunTime', 0)/1000:8.2f}s "
                    f"cpu={s.get('executorCpuTime', 0)/1e9:8.2f}s "
                    f"in={s.get('inputBytes', 0)>>10:8d}K "
                    f"sh_r={s.get('shuffleReadBytes', 0)>>10:7d}K "
                    f"sh_w={s.get('shuffleWriteBytes', 0)>>10:7d}K  "
                    f"{s.get('name', '')[:60]} {dur}"
                )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
