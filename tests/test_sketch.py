"""HyperLogLog sketch relation: merge property, accuracy, edge cases.

Reference analogue: none (beyond-parity pipeline operator); the public
formulas are Flajolet et al. 2007.
"""

import math

import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.operators.sketch import (
    hll_estimate, hll_relation, hll_oracle_sql)


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
