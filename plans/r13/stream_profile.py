"""Profile the streaming fixed overhead: run a declared stream query
while hooking every StreamingQuery progress event, and print each
micro-batch's durationMs breakdown (addBatch, walCommit, queryPlanning,
getBatch, latestOffset, commitOffsets, triggerExecution) plus the state
operators' commit times.

Usage: python plans/r13/stream_profile.py <query> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from emiproc_spark.driver_queries import QUERIES  # noqa: E402
from emiproc_spark.session import get_spark  # noqa: E402


class Listener:
    """Collect query progress via the py4j StreamingQueryListener."""

    def __init__(self):
        self.progress = []


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stream_profile")
    spark.range(1).collect()

    def _warm(it):
        yield from it

    spark.range(32).repartition(32).mapInPandas(_warm, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    from pyspark.sql.streaming import StreamingQueryListener

    rows: list[dict] = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            rows.append({"event": "started", "t": time.time(), "id": str(event.id)})

        def onQueryProgress(self, event):
            p = json.loads(event.progress.json)
            rows.append(
                {
                    "event": "progress",
                    "t": time.time(),
                    "batchId": p.get("batchId"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "commitTimeMs",
                                "numRowsTotal",
                                "numRowsUpdated",
                                "numShufflePartitions",
                                "numStateStoreInstances",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                    "numInputRows": p.get("numInputRows"),
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            rows.append({"event": "terminated", "t": time.time()})

    spark.streams.addListener(L())

    for rep in range(reps):
        rows.clear()
        t0 = time.perf_counter()
        t0_wall = time.time()
        df = QUERIES[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        # listener events are async; give the bus a moment to drain
        time.sleep(1.0)
        print(f"== rep {rep}: total {dt:.3f}s (query fn returned at {t_build:.3f}s) ==")
        t_prev = None
        for r in rows:
            if r["event"] == "started":
                print(f"  started at +{r['t'] - t0_wall:.3f}s")
                t_prev = r["t"]
            elif r["event"] == "progress":
                gap = (r["t"] - t_prev) if t_prev else 0.0
                t_prev = r["t"]
                print(
                    f"  batch {r['batchId']}: +{gap:.3f}s rows={r['numInputRows']} "
                    f"dur={r['durationMs']} state={r['stateOperators']}"
                )
            else:
                gap = (r["t"] - t_prev) if t_prev else 0.0
                print(f"  terminated +{gap:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
