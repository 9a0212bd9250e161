"""Isolation-run registered queries: fresh engine session, calibration
probe, N reps each, noop-sink timing — the standing r5 protocol.

Usage:
    python tools/isolate_query.py [-n REPS] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import (  # noqa: E402
    all_queries,
)
from cqu_bigdata_recommender_system_for_movies_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolate")
    queries = all_queries()

    warm = queries["global_stats"](spark, sf_dir)
    warm.write.format("noop").mode("overwrite").save()

    calib = []
    for _ in range(3):
        s = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
        calib.append(round(time.perf_counter() - s, 3))
    print(f"calibration_reps={calib}", flush=True)

    for name in args:
        fn = queries[name]
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
