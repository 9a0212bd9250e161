"""Targeted scale probe — engine-side-only timing of output-growing shapes.

VERDICT r7 #5: the full parity sweep is harness-bounded past ~10× (the
DuckDB-vs-Spark compare collects both complete result sets, and row-heavy
outputs OOM the 8g driver), but the three shapes whose OUTPUT grows with
data — near-dup pair generation, candidate sampling, record linkage —
deserve probing one more decade to confirm the cascade-blocking and
twin-pair growth analyses hold at 100× (sf10-equivalent). This probe runs
only the ENGINE side: each query executes to completion through the noop
sink plus a count() for the output-row figure, nothing is collected, so
the bound is executor work, exactly what a 1000-executor cluster would
see more of.

Usage:
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf10x 100
    python tools/scale_probe.py /tmp/sf10x [query ...]

With no query names, probes the default output-growth set. Prints one
JSON line per query and a final summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import all_queries
from cqu_bigdata_recommender_system_for_movies_spark.session import get_spark

# The shapes whose output (not just input) grows with scale — the families
# the 10×/30× sweeps flagged as superlinear-looking and root-caused as
# output growth, plus the one true scale-killer that was re-planned
# (record linkage, cascade blocking).
DEFAULT_PROBE = [
    "record_linkage_blocked",
    "embedding_near_dup_pairs",
    "minhash_lsh_dedup",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "prefix_filter_jaccard_join",
    "eval_candidate_sampling",
    "bpr_negative_sampling",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_PROBE
    spark = get_spark("scale-probe")
    queries = all_queries()
    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 2)
        # separate count pass: the row figure is the growth evidence
        rows = df.count()
        results[name] = {"sec": sec, "rows": rows}
        print(json.dumps({"query": name, "sec": sec, "rows": rows}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
