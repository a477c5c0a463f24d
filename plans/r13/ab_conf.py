"""Interleaved A/B of runtime-settable confs over a query list.

Usage: python plans/r13/ab_conf.py <reps> "<k=v,k=v>" <query> [query...]
Variant A = session defaults, variant B = the given conf overrides.
Runs A,B,A,B,... per query in ONE session so host drift cancels.
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
    overrides = dict(kv.split("=", 1) for kv in sys.argv[2].split(",") if kv)
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_conf")
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

    base = {k: spark.conf.get(k, None) for k in overrides}

    def set_variant(b: bool) -> None:
        for k, v in (overrides if b else base).items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    for name in names:
        ta, tb = [], []
        for _ in range(reps):
            for variant, sink in ((False, ta), (True, tb)):
                set_variant(variant)
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                sink.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        set_variant(False)
        print(
            f"{name:28s} A(min)={min(ta):.3f} B(min)={min(tb):.3f} "
            f"ratio={min(tb) / min(ta):.2f} A={[round(x, 2) for x in ta]} "
            f"B={[round(x, 2) for x in tb]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
