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
    # Composite meta-audit: re-executes three dedup pipelines end-to-end
    # (exact prefix-filter, MinHash-LSH, SimHash-banded) that are each
    # individually benched — timing it double-counts ~10 s of already-
    # measured work without exercising any new plan.
    "dedup_method_agreement": "composite of three individually-benched dedup pipelines",
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

    # Provenance rule (VERDICT r11 item 5): the DRIVER-run map stays
    # min-of-2 for time; the COMMITTED quiet-machine BENCH_LOCAL.json is
    # produced with SPARK_GRAFT_BENCH_RUNS=3 (min-of-3) to contain the
    # documented ±15% same-binary variance span. The run count is recorded
    # in the JSON so every map states its own provenance.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

    # Warm the JVM + parquet footers once so timings measure the plans.
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(n_runs):
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

    # The driver tail-captures the last ~2000 chars of output and parses the
    # final JSON line; round 2's line (full per-query map + verbose excluded
    # reasons) outgrew that window and the round lost its bench signal. Keep
    # the printed line compact and bounded: compact separators, excluded as a
    # count, and — if the registry grows the line past the budget — drop the
    # FASTEST per-query entries (deterministic, least informative) until it
    # fits. The complete map is always written to BENCH_LOCAL.json.
    full = {
        "metric": "total_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs": n_runs,
        "excluded_n": len(excluded),
        "queries_omitted": 0,
        # The registry outgrew the driver's tail-capture window long ago;
        # the COMPLETE per-query map for THIS run is always committed as
        # BENCH_LOCAL.json (VERDICT r7 item 3: the official artifact must
        # be traceable to a self-contained committed companion).
        "full_map": "BENCH_LOCAL.json",
        "n_queries": 0,
    }
    full["n_queries"] = len(timings)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as f:
        json.dump({**full, "excluded": excluded}, f, indent=1)

    line_budget = 1700
    shown = dict(timings)
    line = json.dumps(full, separators=(",", ":"))
    for name in sorted(timings, key=timings.get):
        if len(line) <= line_budget:
            break
        shown.pop(name)
        full["queries"] = shown
        full["queries_omitted"] = len(timings) - len(shown)
        line = json.dumps(full, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
