"""Time a subset of declared queries with the noop sink (bench.py
methodology: full build+execute per rep, min over reps).

Usage: python plans/r13/time_queries.py <reps> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from emiproc_spark.driver_queries import QUERIES  # noqa: E402
from emiproc_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_queries")
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

    for name in names:
        best = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{name:32s} min={min(best):.3f} all={[round(b, 3) for b in best]}")
    spark.stop()


if __name__ == "__main__":
    main()
