"""HyperLogLog sketch relation: merge property, accuracy, edge cases.

Reference analogue: none (beyond-parity pipeline operator); the public
formulas are Flajolet et al. 2007.
"""

import math

import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.operators.sketch import (
    bloom_contains, bloom_relation, cms_estimate, cms_relation,
    hist_quantiles, hist_relation, hll_estimate, hll_finalize,
    hll_merge, hll_relation, hll_oracle_sql)


def _mk(spark, values, lang="en"):
    return spark.createDataFrame(
        [(lang, v) for v in values], "lang string, text string")


def test_hll_estimate_within_standard_error(spark):
    # 5,000 distinct values at p=9 (m=512): sigma ~ 1.04/sqrt(512) = 4.6%
    n = 5000
    df = _mk(spark, [f"doc-{i}" for i in range(n)] * 2)  # dup every row
    got = hll_estimate(df, value_col="text", group_cols=["lang"],
                       p=9).collect()[0]
    assert abs(got["est_distinct"] - n) / n < 4 * 1.04 / math.sqrt(512)
    assert 0 < got["n_filled"] <= 512


def test_hll_small_range_linear_counting_is_near_exact(spark):
    # 40 distinct << m=512 -> linear-counting branch, near-exact
    df = _mk(spark, [f"v{i}" for i in range(40)])
    got = hll_estimate(df, value_col="text", p=9).collect()[0]
    assert abs(got["est_distinct"] - 40) <= 2


def test_hll_merge_equals_sketch_of_union(spark):
    a = _mk(spark, [f"a{i}" for i in range(300)])
    b = _mk(spark, [f"a{i}" for i in range(150, 450)])  # overlap
    ra = hll_relation(a, value_col="text", group_cols=["lang"], p=7)
    rb = hll_relation(b, value_col="text", group_cols=["lang"], p=7)
    merged = (ra.unionByName(rb)
                .groupBy("lang", "bucket")
                .agg(F.max("max_rank").alias("max_rank")))
    whole = hll_relation(a.unionByName(b), value_col="text",
                         group_cols=["lang"], p=7)
    m = {(r["lang"], r["bucket"]): r["max_rank"] for r in merged.collect()}
    w = {(r["lang"], r["bucket"]): r["max_rank"] for r in whole.collect()}
    assert m == w


def test_hll_nulls_dropped_and_groups_independent(spark):
    df = spark.createDataFrame(
        [("en", "x"), ("en", None), ("fr", "x"), ("fr", "y")],
        "lang string, text string")
    rows = {r["lang"]: r for r in
            hll_estimate(df, value_col="text",
                         group_cols=["lang"], p=9).collect()}
    assert rows["en"]["n_filled"] == 1
    assert rows["fr"]["n_filled"] == 2
    assert round(rows["en"]["est_distinct"]) == 1
    assert round(rows["fr"]["est_distinct"]) == 2


def test_hll_duckdb_oracle_bit_match(spark):
    duckdb = pytest.importorskip("duckdb")
    vals = [f"doc {i % 700}" for i in range(2100)]
    df = _mk(spark, vals)
    got = hll_estimate(df, value_col="text", group_cols=["lang"],
                       p=9).collect()[0]
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    sql = hll_oracle_sql(table_expr="documents", value_expr="text",
                         group_exprs=[("lang", "lang")], p=9)
    want = con.execute(sql).fetchone()
    assert (got["lang"], got["est_distinct"], got["n_filled"]) == want


def test_hll_p_validation(spark):
    df = _mk(spark, ["a"])
    with pytest.raises(ValueError):
        hll_relation(df, value_col="text", p=3)


def test_hll_merge_to_coarser_group_equals_direct_sketch(spark):
    # fold per-lang sketches into one global sketch: the finalized
    # estimate must be IDENTICAL to sketching the raw union directly
    # (max per bucket is exact, not approximate-on-approximate)
    a = _mk(spark, [f"a{i}" for i in range(250)], lang="en")
    b = _mk(spark, [f"a{i}" for i in range(100, 400)], lang="fr")
    df = a.unionByName(b)
    rel = hll_relation(df, value_col="text", group_cols=["lang"], p=7)
    merged = hll_merge(rel, group_cols_out=[])
    got = hll_finalize(merged, p=7).collect()[0]
    want = hll_estimate(df, value_col="text", p=7).collect()[0]
    assert (got["est_distinct"], got["n_filled"]) == \
           (want["est_distinct"], want["n_filled"])


# ---------------------------------------------------------------- CMS

def test_cms_estimate_never_undercounts_and_is_tight_when_sparse(spark):
    import collections
    vals = [f"tok{i % 37}" for i in range(500)] + ["rare"] * 3
    true = collections.Counter(vals)
    df = _mk(spark, vals)
    rel = cms_relation(df, value_col="text", depth=4, width=1024)
    est = {r["text"]: r["est_count"] for r in
           cms_estimate(rel, df, value_col="text",
                        depth=4, width=1024).collect()}
    assert set(est) == set(true)
    for tok, c in true.items():
        assert est[tok] >= c          # CMS never undercounts
    # 38 distinct values in 4x1024 buckets: collisions essentially
    # impossible per row; the min over 4 rows is exact
    assert est == dict(true)


def test_cms_unseen_probe_reads_zero_or_collision(spark):
    df = _mk(spark, [f"v{i}" for i in range(10)])
    rel = cms_relation(df, value_col="text", depth=4, width=2048)
    probes = _mk(spark, ["never-seen-token"])
    got = cms_estimate(rel, probes, value_col="text",
                       depth=4, width=2048).collect()
    assert len(got) == 1 and got[0]["est_count"] == 0


def test_cms_merge_equals_sketch_of_union(spark):
    a = _mk(spark, [f"x{i % 9}" for i in range(100)])
    b = _mk(spark, [f"x{i % 13}" for i in range(80)])
    ra = cms_relation(a, value_col="text", depth=3, width=64)
    rb = cms_relation(b, value_col="text", depth=3, width=64)
    merged = (ra.unionByName(rb).groupBy("hrow", "bucket")
                .agg(F.sum("cnt").alias("cnt")))
    whole = cms_relation(a.unionByName(b), value_col="text",
                         depth=3, width=64)
    m = {(r["hrow"], r["bucket"]): r["cnt"] for r in merged.collect()}
    w = {(r["hrow"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_cms_validation(spark):
    df = _mk(spark, ["a"])
    with pytest.raises(ValueError):
        cms_relation(df, value_col="text", depth=0)


# -------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_rare_false_positives(spark):
    members = [f"member-{i}" for i in range(200)]
    df = _mk(spark, members)
    rel = bloom_relation(df, value_col="text", m_bits=8192, k=4)
    # every member answers true
    got = {r["text"]: r["contains"] for r in
           bloom_contains(rel, df, value_col="text",
                          m_bits=8192, k=4).collect()}
    assert all(got[m] for m in members)
    # 200 members in 8192 bits, k=4: fp rate ~ (1-e^-0.1)^4 ~ 8e-5
    absent = _mk(spark, [f"absent-{i}" for i in range(200)])
    fp = [r for r in bloom_contains(rel, absent, value_col="text",
                                    m_bits=8192, k=4).collect()
          if r["contains"]]
    assert len(fp) <= 2


def test_bloom_merge_equals_sketch_of_union(spark):
    a = _mk(spark, [f"a{i}" for i in range(50)])
    b = _mk(spark, [f"b{i}" for i in range(50)])
    ra = bloom_relation(a, value_col="text", m_bits=512, k=3)
    rb = bloom_relation(b, value_col="text", m_bits=512, k=3)
    merged = ra.unionByName(rb).dropDuplicates(["bit"])
    whole = bloom_relation(a.unionByName(b), value_col="text",
                           m_bits=512, k=3)
    assert sorted(r["bit"] for r in merged.collect()) \
        == sorted(r["bit"] for r in whole.collect())


def test_bloom_validation(spark):
    df = _mk(spark, ["a"])
    with pytest.raises(ValueError):
        bloom_relation(df, value_col="text", k=0)


# ---------------------------------------------------- histogram sketch

def test_hist_quantiles_within_one_bin_of_exact(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    xs = rng.uniform(0.0, 1000.0, 5000).tolist()
    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    nbins, lo, hi = 200, 0.0, 1000.0
    step = (hi - lo) / nbins
    row = hist_quantiles(df, value_col="v", lo=lo, hi=hi,
                         nbins=nbins, qs=(0.5, 0.9, 0.99)).collect()[0]
    assert row["n"] == 5000
    srt = sorted(xs)
    for q, name in [(0.5, "q50"), (0.9, "q90"), (0.99, "q99")]:
        exact = srt[math.ceil(q * 5000) - 1]
        # lower-edge rule: estimate is the floor of exact's bin
        assert abs(row[name] - exact) <= step


def test_hist_out_of_range_clamps_to_edge_bins(spark):
    df = spark.createDataFrame(
        [(-100.0,), (0.5,), (9.5,), (1e9,)], "v double")
    rel = {r["bin"]: r["cnt"] for r in
           hist_relation(df, value_col="v", lo=0.0, hi=10.0,
                         nbins=10).collect()}
    assert rel == {0: 2, 9: 2}


def test_hist_merge_and_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 9.0)], "g string, v double")
    a, b = df.where("g = 'a'"), df.where("g = 'b'")
    kw = dict(value_col="v", group_cols=["g"], lo=0.0, hi=10.0, nbins=5)
    merged = (hist_relation(a, **kw).unionByName(hist_relation(b, **kw))
              .groupBy("g", "bin").agg(F.sum("cnt").alias("cnt")))
    whole = hist_relation(df, **kw)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, whole.collect()))
    rows = {r["g"]: r for r in
            hist_quantiles(df, value_col="v", group_cols=["g"],
                           lo=0.0, hi=10.0, nbins=5,
                           qs=(0.5,)).collect()}
    assert rows["a"]["n"] == 2 and rows["b"]["n"] == 1
    assert rows["b"]["q50"] == 8.0  # bin 4 lower edge


def test_hist_validation(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        hist_relation(df, value_col="v", lo=5.0, hi=5.0, nbins=4)


# ---------------------------------------------------------------- KMV

def _kmv_mk(spark, pairs):
    return spark.createDataFrame(pairs, "g string, v string")


def test_kmv_small_range_branch_is_exact(spark):
    from cdap_geo_spark.operators.sketch import kmv_pairwise, kmv_relation
    # both sets smaller than k: sketch IS the set -> exact answers
    rows = [("a", f"x{i}") for i in range(10)] \
        + [("b", f"x{i}") for i in range(5, 20)]
    rel = kmv_relation(_kmv_mk(spark, rows), value_col="v",
                       group_col="g", k=64)
    got = kmv_pairwise(rel, k=64).collect()[0]
    # |A|=10, |B|=15, inter=5, union=20
    assert got.est_union == 20
    assert got.est_inter == 5
    assert got.jaccard_micro == round(1_000_000.0 * 5 / 20)


def test_kmv_estimates_near_truth(spark):
    from cdap_geo_spark.operators.sketch import kmv_pairwise, kmv_relation
    # |A|=|B|=3000, inter=1000 -> union=5000, J=0.2; k=256 gives
    # ~1/sqrt(k) ~ 6% standard error
    rows = [("a", f"v{i}") for i in range(3000)] \
        + [("b", f"v{i}") for i in range(2000, 5000)]
    rel = kmv_relation(_kmv_mk(spark, rows), value_col="v",
                       group_col="g", k=256)
    got = kmv_pairwise(rel, k=256).collect()[0]
    assert abs(got.est_union - 5000) / 5000 < 0.25
    assert abs(got.jaccard_micro - 200_000) / 200_000 < 0.4
    assert abs(got.est_inter - 1000) / 1000 < 0.5


def test_kmv_merge_equals_sketch_of_union(spark):
    from pyspark.sql import Window
    from cdap_geo_spark.operators.sketch import kmv_relation
    a = _kmv_mk(spark, [("g", f"p{i}") for i in range(200)])
    b = _kmv_mk(spark, [("g", f"p{i}") for i in range(100, 300)])
    ra = kmv_relation(a, value_col="v", group_col="g", k=32)
    rb = kmv_relation(b, value_col="v", group_col="g", k=32)
    merged = (ra.unionByName(rb).distinct()
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy("g").orderBy("h")))
              .where(F.col("_rn") <= 32).select("g", "h"))
    whole = kmv_relation(a.unionByName(b), value_col="v",
                         group_col="g", k=32)
    assert sorted(r.h for r in merged.collect()) == \
           sorted(r.h for r in whole.collect())


def test_kmv_oracle_twin_and_validation(spark):
    import duckdb
    import pytest as _pt
    from cdap_geo_spark.operators.sketch import (
        kmv_oracle_sql, kmv_pairwise, kmv_relation)
    rows = [(f"s{j}", f"t{i * (j + 2)}") for j in range(3)
            for i in range(40)]
    df = _kmv_mk(spark, rows)
    rel = kmv_relation(df, value_col="v", group_col="g", k=8)
    got = sorted(tuple(r) for r in kmv_pairwise(rel, k=8).collect())
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = sorted(tuple(r) for r in con.execute(
        kmv_oracle_sql(table_expr="t", value_expr="v",
                       group_expr="g", k=8)).fetchall())
    assert got == [(a, b, int(j), int(u), int(i))
                   for a, b, j, u, i in want]
    with _pt.raises(ValueError):
        kmv_relation(df, value_col="v", group_col="g", k=1)
    with _pt.raises(ValueError):
        kmv_pairwise(rel, k=1)
