"""Per-query profiler for optimization rounds (guide §1: measure first).

For each named query (or a --top N slice of the committed bench map) it
reports, on the bench session (local[$SPARK_GRAFT_CPUS], same confs):

* build_s  — wall time of ``fn(spark, sf_dir)`` (driver-side plan
  construction; includes any eager persist/localCheckpoint the query does);
* run1_s / run2_s — two timed noop-sink executions with
  ``spark.catalog.clearCache()`` before each (the bench methodology);
* n_jobs  — Spark jobs launched by the second (steady-state) run;
* exchanges / joins / python_evals — counts grepped from the FINAL executed
  plan (AQE), plus the full ``explain('formatted')`` written to
  ``plans/<tag>/<query>_<suffix>.txt`` when --dump is given.

Usage:
  python tools/profile_query.py [--dump plans/r14 --suffix before]
                                [--runs 2] query [query ...]
  python tools/profile_query.py --top 30   # slowest 30 from BENCH_LOCAL.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    dump_dir = None
    suffix = "before"
    runs = 2
    names: list[str] = []
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--dump":
            dump_dir = args[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            if runs < 1:
                raise SystemExit("--runs must be >= 1")
            i += 2
        elif a == "--top":
            n = int(args[i + 1])
            i += 2
            with open(
                os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "BENCH_LOCAL.json")
            ) as f:
                bm = json.load(f)["queries"]
            names += sorted(bm, key=bm.get, reverse=True)[:n]
        else:
            names.append(a)
            i += 1

    from kafka_streams_playground_spark.plans import REGISTRY
    from kafka_streams_playground_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if dump_dir:
        os.makedirs(dump_dir, exist_ok=True)

    print(f"{'query':42s} {'build_s':>7s} {'run1_s':>7s} {'run2_s':>7s} "
          f"{'jobs':>4s} {'exch':>4s} {'join':>4s} {'py':>3s}")
    for name in names:
        spec = REGISTRY[name]
        spark.catalog.clearCache()
        sc.setJobDescription(f"profile:{name}:build")
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        build_s = time.time() - t0

        # Bench methodology: fn() + noop both inside the timed window, so
        # eager queries (localCheckpoint inside fn) are charged correctly.
        # `jobs` reports the LAST (steady-state) run's job count.
        times = []
        jobs = 0
        for r in range(runs):
            spark.catalog.clearCache()
            sc.setJobGroup(f"pf-{name}-{r}", name)
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            jobs = len(sc.statusTracker().getJobIdsForGroup(f"pf-{name}-{r}") or [])
        sc.setJobDescription(None)

        # Executed plan (AQE final) from the last run's DF.
        try:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        exch = len(re.findall(r"\bExchange\b", plan))
        joins = len(re.findall(r"Join", plan))
        pyev = len(re.findall(r"EvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan))
        if dump_dir:
            with open(os.path.join(dump_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
        rest = " ".join(f"{t:7.2f}" for t in times)
        print(f"{name:42s} {build_s:7.2f} {rest} {jobs:4d} {exch:4d} {joins:4d} {pyev:3d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
