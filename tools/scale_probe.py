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


def _run_one(spark, sf_dir: str, name: str) -> dict:
    fn = all_queries()[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    sec = round(time.perf_counter() - t0, 2)
    # separate count pass: the row figure is the growth evidence
    rows = df.count()
    return {"sec": sec, "rows": rows}


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--one-session"]
    one_session = "--one-session" in sys.argv[1:]
    sf_dir = args[0]
    names = args[1:] or DEFAULT_PROBE

    if one_session:
        spark = get_spark("scale-probe")
        results: dict[str, dict] = {}
        for name in names:
            results[name] = _run_one(spark, sf_dir, name)
            print(json.dumps({"query": name, **results[name]}), flush=True)
        print(json.dumps({"sf_dir": sf_dir, "results": results}))
        return

    # Default (round 10): one SUBPROCESS per query. Probing two
    # corpus-scale pair joins back-to-back in one 8g/32-thread local JVM
    # at 100x OOMs an executor thread (the r9 ngram admits real postings,
    # so its join leaves a fragmented old gen + retained signature
    # checkpoint for whoever runs next) even though every query passes
    # solo — a harness heap ceiling, not an engine plan defect: on a
    # cluster each executor JVM is its own heap and sequential queries
    # don't stack working sets. Fresh process per query keeps the
    # documented DEFAULT_PROBE recipe runnable at any replica factor;
    # --one-session restores the shared-session behavior (faster, and it
    # exercises the in-session signature-table reuse).
    import subprocess

    results = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one-session", sf_dir, name],
            capture_output=True,
            text=True,
        )
        line = next(
            (
                ln
                for ln in reversed(proc.stdout.splitlines())
                if ln.startswith('{"query"')
            ),
            None,
        )
        if proc.returncode != 0 or line is None:
            err = proc.stderr or "no output"
            # the Python traceback (with the Py4J error MESSAGE at its
            # head) beats the tail of a Java stack for diagnosis
            tb = err.rfind("Traceback")
            results[name] = {"error": err[tb : tb + 800] if tb >= 0 else err[-800:]}
            print(json.dumps({"query": name, "error": True}), flush=True)
            continue
        rec = json.loads(line)
        rec.pop("query", None)
        results[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
