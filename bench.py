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

# Headline set: the five reference topologies + representative extension and
# north-star operators. Quadratic baselines (dedup_ngram_jaccard,
# dedup_simhash pair join, dedup_embedding_cosine) are deliberately excluded:
# they exist as ground-truth checks, not as operators that survive scale-up.
BENCH_QUERIES = [
    "q1_expensive_orders",
    "q2_order_projection",
    "q3_products_by_first_letter",
    "q4_products_per_user_10s",
    "q5_paid_orders",
    "agg_pricing_summary",
    "agg_revenue_by_nation",
    "agg_rollup_nation_segment",
    "agg_cube_status_priority",
    "agg_price_percentiles",
    "s2_latest_event_per_user",
    "wf_top3_orders_per_customer",
    "wf_running_customer_spend",
    "join_range_price_band",
    "topk_customers_by_revenue",
    "json_props_extract",
    "join_left_order_lineitem_counts",
    "asof_purchase_last_click",
    "session_windows_per_user",
    "sliding_window_event_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_banded",
    "dedup_keep_best_by_quality",
    "orders_products_array",
    "sim_topk_bruteforce",
    "sim_lsh_bucket_stats",
    "sim_ivf_topk",
    "sim_ann_multiprobe_topk",
    "text_token_stats",
    "text_vocabulary",
    "text_quality_score",
    "mm_decoded_feature_checksum",
]


def main() -> None:
    from kafka_streams_playground_spark.plans import REGISTRY
    from kafka_streams_playground_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if n in REGISTRY]

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
            }
        )
    )


if __name__ == "__main__":
    main()
