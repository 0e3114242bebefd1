"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full materialization of
every output row/column, no driver collect, no sink I/O cost). Per-query
time is the MIN of two runs: the first run includes Janino codegen
compilation of the plan (a fixed per-plan cost, irrelevant at scale where
it is amortized over hours of execution); the min reflects steady-state
execution. ``spark.catalog.clearCache()`` runs before every run, so
queries that persist an internal index (MinHash, SimHash, IVF) rebuild it
from scratch each run — nothing carries over between runs except the JVM's
compiled classes and OS page cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Bench set = the ENTIRE registry minus two reasoned exclusion classes, so
# the bench tracks the registry as queries are added (VERDICT r1 item 5).
EXCLUDED = {
    # Quadratic ground-truth baselines: they exist to validate the bucketed
    # scale paths (minhash/simhash_banded/ANN), not to survive scale-up.
    "dedup_ngram_jaccard": "quadratic ground-truth baseline",
    "dedup_simhash": "quadratic pair-join baseline; dedup_simhash_banded is the scale path",
    "dedup_embedding_cosine": "quadratic baseline; sim_ann_* are the scale path",
}
STREAM_EXCLUSION_REASON = (
    "memory-sink drain (driver-resident test harness, not a production sink)"
)


def bench_names(registry) -> tuple[list[str], dict[str, str]]:
    excluded = dict(EXCLUDED)
    names = []
    for n in registry:
        if n.startswith("stream_"):
            excluded[n] = STREAM_EXCLUSION_REASON
        elif n in EXCLUDED:
            pass
        else:
            names.append(n)
    return names, excluded


def main() -> None:
    from kafka_streams_playground_spark.plans import REGISTRY
    from kafka_streams_playground_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names, excluded = bench_names(REGISTRY)

    # Warm the JVM + parquet footers once so timings measure the plans.
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            # Drop persisted indexes from prior runs/queries: every timed run
            # must execute the full plan, including index builds.
            spark.catalog.clearCache()
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "runs": 2,
                "excluded": excluded,
            }
        )
    )


if __name__ == "__main__":
    main()
