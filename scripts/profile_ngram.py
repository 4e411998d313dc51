"""Stage-level profile of ngram_jaccard_pairs at the bench config.

Times each plan stage of the k=3/t=40 stress config (the bench's
``ngram_jaccard`` query) in ONE session so the numbers are a fair
within-session comparison:

  1. gram+checkpoint (arr materialization)
  2. prefix relation (dfreq + rank window + checkpoint)
  3. match rows (prefix self-join, pre-groupBy)   [diagnostic count]
  4. candidates (groupBy + aggregated PPJoin bound)
  5. full operator e2e (verify included)

Usage: python scripts/profile_ngram.py [sf_dir] [k] [pct]
"""
from __future__ import annotations

import os
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

    # warm the JVM/Python workers on a small slice first
    ngram_jaccard_pairs(docs.limit(300), k=k, threshold_pct=pct).count()

    t0 = time.time()
    src = ensure_min_parallelism(
        docs.select(F.col("doc_id").alias("_id"),
                    F.col("text").alias("_t")))
    arr = src.select("_id", gram_hashes(F.col("_t"), k).alias("_arr")) \
             .localCheckpoint()
    n_docs = arr.count()
    t_arr = time.time() - t0
    stats = arr.agg(F.sum(F.size("_arr")).alias("tot"),
                    F.avg(F.size("_arr")).alias("avg")).collect()[0]
    print(f"[1] gram arrays: {n_docs} docs, total grams {stats['tot']}, "
          f"avg {stats['avg']:.1f}  ({t_arr:.2f}s)")

    # --- prefix relation (mirrors the operator's plan) ---
    t0 = time.time()
    sh = arr.select("_id", F.explode("_arr").alias("sh"))
    sizes = arr.select("_id", F.size("_arr").alias("sz"))
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("_df"))
    from pyspark.sql import Window
    w = Window.partitionBy("_id").orderBy("_df", "sh")
    plen = (F.col("sz") - F.floor((F.col("sz") * pct + 99) / 100) + 1)
    pos = sh.join(dfreq, "sh") \
            .withColumn("_pos", F.row_number().over(w)) \
            .join(sizes, "_id")
    pref = pos.filter(F.col("_pos") <= plen) \
              .select("_id", "sh", "_pos", "sz").localCheckpoint()
    n_pref = pref.count()
    t_pref = time.time() - t0
    print(f"[2] prefix rows: {n_pref}  ({t_pref:.2f}s)")

    # --- match rows (diagnostic: size of the self-join output) ---
    t0 = time.time()
    a = pref.toDF("ida", "sh", "pa", "sza")
    b = pref.toDF("idb", "sh", "pb", "szb")
    P = F.lit(pct)
    ub = F.least(F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")) + 1
    cond = ((F.col("ida") < F.col("idb"))
            & (F.lit(100) * F.col("sza") >= P * F.col("szb"))
            & (F.lit(100) * F.col("szb") >= P * F.col("sza"))
            & ((F.lit(100) + P) * ub >= P * (F.col("sza") + F.col("szb"))))
    n_matches = a.join(b, "sh").filter(cond).count()
    t_match = time.time() - t0
    print(f"[3] match rows (pre-groupBy): {n_matches}  ({t_match:.2f}s)")

    # --- candidates (operator's own hook) ---
    t0 = time.time()
    cand = ngram_jaccard_pairs(docs, k=k, threshold_pct=pct,
                               _return_candidates=True)
    n_cand = cand.count()
    t_cand = time.time() - t0
    print(f"[4] candidates reaching verify: {n_cand}  ({t_cand:.2f}s e2e)")

    # --- full operator ---
    t0 = time.time()
    out = ngram_jaccard_pairs(docs, k=k, threshold_pct=pct)
    n_out = out.count()
    t_full = time.time() - t0
    print(f"[5] true pairs: {n_out}  ({t_full:.2f}s e2e)"
          f"  -> verify increment ~{t_full - t_cand:.2f}s")

    # --- join strategies in the final plan ---
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
                       r"[^\n]*", plan)
    print("[6] join strategies in executed plan:")
    for j in joins:
        print("   ", j[:120])
    spark.stop()


if __name__ == "__main__":
    main()
