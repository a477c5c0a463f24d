"""Run one declared query with the UI enabled and dump per-job/stage
wall time from the status API.

Usage: python plans/r13/profile_query.py <query> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from emiproc_spark.driver_queries import QUERIES  # noqa: E402
from emiproc_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile_query", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1).collect()

    def _warm(it):
        yield from it

    spark.range(32).repartition(32).mapInPandas(_warm, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    from emiproc_spark.parity import TABLES

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(job_floor: int):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            js = json.load(r)
        return [j for j in js if j["jobId"] >= job_floor]

    for rep in range(reps):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            floor = max((j["jobId"] for j in json.load(r)), default=-1) + 1
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        spark.catalog.clearCache()
        js = jobs_after(floor)
        print(f"\n=== rep {rep}: build={t_build:.3f}s total={t_total:.3f}s "
              f"jobs={len(js)} ===")
        from datetime import datetime

        def ts(s):
            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        tot = 0.0
        for j in sorted(js, key=lambda j: j["jobId"]):
            dur = (ts(j["completionTime"]) - ts(j["submissionTime"])
                   if "completionTime" in j else float("nan"))
            tot += dur or 0
            print(f"  job {j['jobId']:4d} {dur:7.3f}s stages={len(j['stageIds'])} "
                  f"tasks={j['numTasks']:4d} {j.get('description', '')[:60]}")
        print(f"  sum(job durations)={tot:.3f}s (gaps = driver/planning time)")
    spark.stop()


if __name__ == "__main__":
    main()
