"""Isolate the ngram verify stage: materialize the candidate set once,
then time ONLY the verify joins + array_intersect + threshold filter,
and print the executed plan of that sub-query.
"""
from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdap_geo_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pct = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    from cdap_geo_spark.operators.dedup import (gram_hashes,
                                                ngram_jaccard_pairs)
    from cdap_geo_spark.functions.relational import ensure_min_parallelism

    ngram_jaccard_pairs(docs.limit(300), k=k, threshold_pct=pct).count()

    t0 = time.time()
    cand = ngram_jaccard_pairs(docs, k=k, threshold_pct=pct,
                               _return_candidates=True).localCheckpoint()
    n_cand = cand.count()
    print(f"candidates: {n_cand}  ({time.time()-t0:.2f}s)")

    arr = ensure_min_parallelism(
        docs.select(F.col("doc_id").alias("_id"),
                    F.col("text").alias("_t"))) \
        .select("_id", gram_hashes(F.col("_t"), k).alias("_arr")) \
        .localCheckpoint()
    arr.count()

    sa = arr.select(F.col("_id").alias("ida"), F.col("_arr").alias("arr_a"),
                    F.size("_arr").alias("sza"))
    sb = arr.select(F.col("_id").alias("idb"), F.col("_arr").alias("arr_b"),
                    F.size("_arr").alias("szb"))
    out = (cand.join(sa, "ida").join(sb, "idb")
           .select("ida", "idb",
                   F.size(F.array_intersect("arr_a", "arr_b"))
                   .cast("long").alias("inter"),
                   (F.col("sza") + F.col("szb")).alias("tot"))
           .withColumn("uni", F.col("tot") - F.col("inter"))
           .filter(F.lit(100) * F.col("inter")
                   >= F.lit(pct) * F.col("uni")))

    t0 = time.time()
    n = out.count()
    t_v = time.time() - t0
    print(f"verify-only: {n} true pairs  ({t_v:.2f}s, "
          f"{n_cand/t_v/1e6:.2f}M pairs/s)")

    # repeat with explicit broadcast of both sides
    outb = (cand.join(F.broadcast(sa), "ida").join(F.broadcast(sb), "idb")
            .select("ida", "idb",
                    F.size(F.array_intersect("arr_a", "arr_b"))
                    .cast("long").alias("inter"),
                    (F.col("sza") + F.col("szb")).alias("tot"))
            .withColumn("uni", F.col("tot") - F.col("inter"))
            .filter(F.lit(100) * F.col("inter")
                    >= F.lit(pct) * F.col("uni")))
    t0 = time.time()
    nb = outb.count()
    t_b = time.time() - t0
    print(f"verify-only (forced broadcast): {nb}  ({t_b:.2f}s, "
          f"{n_cand/t_b/1e6:.2f}M pairs/s)")

    plan = out._jdf.queryExecution().executedPlan().toString()
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)[^\n]*", plan)
    print("auto-plan joins:")
    for j in joins:
        print("   ", j[:140])
    spark.stop()


if __name__ == "__main__":
    main()
