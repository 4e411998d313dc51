"""Properties for operators/skyline.skyline: brute-force dominance
checks on random frames (duplicates, all four direction combinations),
NULL exclusion, and the plan pin (no quadratic nested-loop join)."""

import random

import pandas as pd
from pyspark.sql import functions as F

from cdap_geo_spark.operators.skyline import skyline


def _brute(rows, mx, my):
    sx, sy = (1 if mx else -1), (1 if my else -1)

    def dominates(b, a):
        bx, by = sx * b[1], sy * b[2]
        ax, ay = sx * a[1], sy * a[2]
        return bx >= ax and by >= ay and (bx > ax or by > ay)

    return sorted(r[0] for r in rows
                  if not any(dominates(b, r) for b in rows))


def test_skyline_matches_bruteforce_all_directions(spark):
    rng = random.Random(31)
    rows = [(i, rng.randrange(40), rng.randrange(40)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    for mx in (True, False):
        for my in (True, False):
            got = sorted(r.id for r in
                         skyline(df, x="x", y="y", maximize_x=mx,
                                 maximize_y=my).collect())
            assert got == _brute(rows, mx, my), (mx, my)


def test_skyline_keeps_exact_duplicates_and_drops_nulls(spark):
    pdf = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                        "x": [10, 10, 1, None, 99],
                        "y": [10, 10, 1, 99, None]})
    df = spark.createDataFrame(pdf)
    got = sorted(r.id for r in skyline(df, x="x", y="y").collect())
    # both copies of the (10,10) frontier point; NULL rows excluded
    assert got == [1, 2]


def test_skyline_anticorrelated_worst_case(spark):
    # every point on the frontier — correctness must survive the
    # degenerate input even though phase 3 sees all of them
    rows = [(i, i, 100 - i) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    assert skyline(df, x="x", y="y").count() == 100


def test_skyline_plan_no_nested_loop(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, x long, y long")
    plan = (skyline(df, x="x", y="y")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoop" not in plan


def test_skyline_global_pass_survives_arrow_batch_splits(spark):
    # (i, i) diagonal + one global dominator: the true frontier is the
    # single dominator. With tiny Arrow batches a per-batch global
    # prune would wrongly keep each batch's local best — pin that the
    # global pass concatenates before pruning.
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        rows = [(i, i, i) for i in range(100)] + [(1000, 1000, 1000)]
        df = spark.createDataFrame(rows, "id long, x long, y long") \
                  .repartition(8)
        got = [r.id for r in skyline(df, x="x", y="y").collect()]
        assert got == [1000]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
