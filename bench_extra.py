"""Per-query isolation harness for optimization A/B runs (guide §1.4).

NOT part of the driver contract (bench.py is frozen); this file exists
so that individual queries can be timed with the noop sink and their
``explain("formatted")`` captured without paying for the whole sweep.

Usage:
    python bench_extra.py q1 q2 ...           # time named queries
    python bench_extra.py --repeat 3 q1       # min-of-3
    python bench_extra.py --explain plans/r06 --suffix before q1 q2
    python bench_extra.py --top 20            # 20 slowest from BENCH_r05

Prints one JSON line: {"queries": {name: [runs...]}, "sf": .., "cpus": ..}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None,
                    help="directory to write <name>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--top", type=int, default=0,
                    help="take the N slowest from BENCH_r05.json")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--jobs", action="store_true",
                    help="report per-query job counts/durations from the "
                         "Spark UI REST API")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_r05.json")) as f:
            prev = json.load(f)["parsed"]["queries"]
        prev.pop("sjoin_tile_headline", None)
        names += sorted(prev, key=prev.get, reverse=True)[:args.top]

    import __spark_entry__ as E
    from cdap_geo_spark.core.lifetime import checkpoint_scope
    from cdap_geo_spark.session import get_spark

    qs = E.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app="bench_extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if not args.no_warm:
        # absorb JVM/codegen/python-fork warmup on an untimed query
        from pyspark.sql import functions as F
        with checkpoint_scope():
            qs["token_count"](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
        spark.range(1_000_000).groupBy((F.col("id") % 97).alias("k")) \
            .count().write.format("noop").mode("overwrite").save()

    def rest(path):
        import urllib.request
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}",
                                    timeout=10) as r:
            return json.loads(r.read())

    out: dict[str, list[float]] = {}
    jobinfo: dict[str, dict] = {}
    for name in names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            with checkpoint_scope():
                df = qs[name](spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for _ in range(args.repeat):
            before = max((j["jobId"] for j in rest("/jobs")), default=-1) \
                if args.jobs else -1
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            with checkpoint_scope():
                qs[name](spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if args.jobs:
                js = [j for j in rest("/jobs") if j["jobId"] > before]
                jobinfo[name] = {
                    "n_jobs": len(js),
                    "n_stages": sum(len(j["stageIds"]) for j in js),
                    "n_tasks": sum(j["numTasks"] for j in js),
                    "jobs": [
                        {"id": j["jobId"], "tasks": j["numTasks"],
                         "desc": (j.get("description") or j["name"])[:90]}
                        for j in sorted(js, key=lambda j: j["jobId"])],
                }
        out[name] = runs

    res = {"queries": out, "sf": SF_DIR, "cpus": CPUS}
    if args.jobs:
        res["jobinfo"] = jobinfo
    print(json.dumps(res, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
