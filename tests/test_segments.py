"""Exact segment-intersection join (operators/segments.py)."""

import numpy as np
import pytest

from pyspark.sql import functions as F


def _brute_intersect(a, b, c, d):
    """Pure-python reference: closed segments AB, CD intersect?"""
    def cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    def on_seg(p, q, r):
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

    d1 = cross(c, d, a)
    d2 = cross(c, d, b)
    d3 = cross(a, b, c)
    d4 = cross(a, b, d)
    if ((d1 > 0 > d2) or (d1 < 0 < d2)) and ((d3 > 0 > d4) or (d3 < 0 < d4)):
        return True
    if d1 == 0 and on_seg(c, d, a):
        return True
    if d2 == 0 and on_seg(c, d, b):
        return True
    if d3 == 0 and on_seg(a, b, c):
        return True
    if d4 == 0 and on_seg(a, b, d):
        return True
    return False


CASES = [
    # proper crossing
    ((0, 0), (10, 10), (0, 10), (10, 0), True),
    # T-touch: endpoint of CD on interior of AB
    ((0, 0), (10, 0), (5, 0), (5, 8), True),
    # shared endpoint
    ((0, 0), (10, 0), (10, 0), (15, 9), True),
    # collinear overlap
    ((0, 0), (10, 0), (5, 0), (20, 0), True),
    # collinear, disjoint
    ((0, 0), (10, 0), (11, 0), (20, 0), False),
    # parallel, offset
    ((0, 0), (10, 0), (0, 1), (10, 1), False),
    # bboxes overlap but segments miss
    ((0, 0), (10, 10), (6, 0), (10, 3), False),
]


def test_predicate_unit_cases(spark):
    from cdap_geo_spark.operators.segments import segments_intersect
    rows = [(i, *a, *b, *c, *d) for i, (a, b, c, d, _) in enumerate(CASES)]
    df = spark.createDataFrame(
        rows, "i int, ax long, ay long, bx long, by long,"
              " cx long, cy long, dx long, dy long")
    got = {
        r["i"]: r["hit"]
        for r in df.select("i", segments_intersect(
            F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
            F.col("cx"), F.col("cy"), F.col("dx"), F.col("dy"))
            .alias("hit")).collect()
    }
    for i, (a, b, c, d, want) in enumerate(CASES):
        assert got[i] == want, (i, a, b, c, d)
        assert _brute_intersect(a, b, c, d) == want  # reference agrees


def test_segment_join_matches_bruteforce(spark):
    from cdap_geo_spark.operators.segments import segment_join
    rng = np.random.default_rng(42)
    n_l, n_r, ext = 120, 150, 5000

    def mk(n):
        p = rng.integers(0, ext, size=(n, 2))
        q = p + rng.integers(-900, 901, size=(n, 2))
        q = np.clip(q, 0, None)
        return p, q

    lp, lq = mk(n_l)
    rp, rq = mk(n_r)
    left = spark.createDataFrame(
        [(i, int(lp[i, 0]), int(lp[i, 1]), int(lq[i, 0]), int(lq[i, 1]))
         for i in range(n_l)],
        "road_id long, ax long, ay long, bx long, by long")
    right = spark.createDataFrame(
        [(j, int(rp[j, 0]), int(rp[j, 1]), int(rq[j, 0]), int(rq[j, 1]))
         for j in range(n_r)],
        "trip_id long, cx long, cy long, dx long, dy long")

    got = {(r["road_id"], r["trip_id"])
           for r in segment_join(left, right, cell=800).collect()}
    want = {
        (i, j)
        for i in range(n_l) for j in range(n_r)
        if _brute_intersect(tuple(lp[i]), tuple(lq[i]),
                            tuple(rp[j]), tuple(rq[j]))
    }
    assert want, "fixture produced no intersections — weak test"
    assert got == want


def test_segment_join_count_and_validation(spark):
    from cdap_geo_spark.operators.segments import (
        segment_join, segment_join_count)
    left = spark.createDataFrame(
        [(1, 0, 0, 10, 10), (2, 100, 100, 101, 101)],
        "road_id long, ax long, ay long, bx long, by long")
    right = spark.createDataFrame(
        [(7, 0, 10, 10, 0), (8, 0, 5, 10, 5), (9, 50, 50, 60, 60)],
        "trip_id long, cx long, cy long, dx long, dy long")
    out = segment_join_count(left, right, cell=16)
    assert {(r["road_id"], r["n_crossings"]) for r in out.collect()} \
        == {(1, 2)}
    with pytest.raises(ValueError):
        segment_join(left, right, cell=0)
