"""Capture .explain("formatted") for declared queries into plans/r13/.

Usage: python plans/r13/capture_plans.py <suffix> [query ...]
Writes plans/r13/<query>_<suffix>.txt for each query (default: all).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from emiproc_spark.driver_queries import QUERIES  # noqa: E402
from emiproc_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"PLAN CAPTURE FAILED: {exc}\n"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(name, "ok" if "FAILED" not in text[:30] else "FAILED")
    spark.stop()


if __name__ == "__main__":
    main()
