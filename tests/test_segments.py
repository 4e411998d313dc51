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


# ---------------------------------------------------------------------------
# snap_to_segments (map-matching-lite)
# ---------------------------------------------------------------------------


def _brute_snap(points, segments, radius):
    """Quadratic python reference with the operator's exact branch
    rule: per point the (d2, seg_id)-smallest segment with d2 <= r²."""
    out = {}
    for pid, px, py in points:
        best = None
        for sid, ax, ay, bx, by in segments:
            apx, apy = px - ax, py - ay
            abx, aby = bx - ax, by - ay
            dot = apx * abx + apy * aby
            len2 = abx * abx + aby * aby
            if len2 == 0 or dot <= 0:
                d2, t = float(apx * apx + apy * apy), 0.0
            elif dot >= len2:
                d2 = float((px - bx) ** 2 + (py - by) ** 2)
                t = 1.0
            else:
                cr = apx * aby - apy * abx
                d2 = (float(cr) * float(cr)) / float(len2)
                t = float(dot) / float(len2)
            if d2 <= float(radius) * float(radius):
                key = (d2, sid)
                if best is None or key < best[0]:
                    best = (key, sid, d2, t)
        if best is not None:
            import decimal
            rnd = lambda v: int(  # noqa: E731  half-up like Spark/DuckDB
                decimal.Decimal(v * 1_000_000).quantize(
                    0, rounding=decimal.ROUND_HALF_UP))
            out[pid] = (best[1], rnd(best[2]), rnd(best[3]))
    return out


def test_snap_brute_force(spark):
    from cdap_geo_spark.operators.segments import snap_to_segments
    rng = np.random.default_rng(7)
    pts = [(i, int(rng.integers(0, 1000)), int(rng.integers(0, 1000)))
           for i in range(150)]
    segs = []
    for j in range(60):
        ax, ay = int(rng.integers(0, 1000)), int(rng.integers(0, 1000))
        segs.append((j, ax, ay, ax + int(rng.integers(-120, 121)),
                     ay + int(rng.integers(-120, 121))))
    want = _brute_snap(pts, segs, radius=90)
    p = spark.createDataFrame(pts, "event_id long, x long, y long")
    s = spark.createDataFrame(
        segs, "road_id long, ax long, ay long, bx long, by long")
    got = {
        r["event_id"]: (r["road_id"], r["d2_u"], r["frac_u"])
        for r in snap_to_segments(p, s, radius=90, cell=64).collect()
    }
    assert got == want
    assert len(got) > 20  # the fixture must exercise real matches


def test_snap_radius_and_degenerate(spark):
    """A point outside the radius is dropped; a zero-length segment
    snaps at its point with frac 0; nearer segment wins a tie on id."""
    from cdap_geo_spark.operators.segments import snap_to_segments
    p = spark.createDataFrame(
        [(1, 100, 100), (2, 900, 900), (3, 0, 50)],
        "event_id long, x long, y long")
    s = spark.createDataFrame(
        [(10, 100, 103, 100, 103),   # zero-length, 3 above point 1
         (11, 0, 107, 200, 107),     # horizontal, 7 above point 1
         (12, 0, 40, 0, 60)],        # passes through point 3
        "road_id long, ax long, ay long, bx long, by long")
    got = {r["event_id"]: (r["road_id"], r["d2_u"], r["frac_u"])
           for r in snap_to_segments(p, s, radius=20, cell=50).collect()}
    assert got[1] == (10, 9_000_000, 0)
    assert got[3] == (12, 0, 500_000)
    assert 2 not in got
    with pytest.raises(ValueError):
        snap_to_segments(p, s, radius=0, cell=50)


def test_snap_candidates_from_single_join(spark):
    """Plan property: one equi-join, no dedup pass needed (each point
    lives in exactly one cell) and no nested-loop join anywhere."""
    from cdap_geo_spark.operators.segments import snap_to_segments
    p = spark.createDataFrame(
        [(1, 100, 100)], "event_id long, x long, y long")
    s = spark.createDataFrame(
        [(10, 0, 0, 500, 500)],
        "road_id long, ax long, ay long, bx long, by long")
    plan = snap_to_segments(
        p, s, radius=50, cell=64)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _clip_brute(segs, boxes):
    """Python Liang–Barsky mirror (same branch rules, same IEEE ops)."""
    out = {}
    for sid, ax, ay, bx, by in segs:
        dx, dy = bx - ax, by - ay
        for bid, minx, miny, maxx, maxy in boxes:
            if not (min(ax, bx) <= maxx and minx <= max(ax, bx)
                    and min(ay, by) <= maxy and miny <= max(ay, by)):
                continue
            pq = [(-dx, ax - minx), (dx, maxx - ax),
                  (-dy, ay - miny), (dy, maxy - ay)]
            if any(p == 0 and q < 0 for p, q in pq):
                continue
            t0 = max([0.0] + [q / p for p, q in pq if p < 0])
            t1 = min([1.0] + [q / p for p, q in pq if p > 0])
            if t1 >= t0:
                lu = round(1e6 * (dx * dx + dy * dy) ** 0.5 * (t1 - t0))
                n, s = out.get(bid, (0, 0))
                out[bid] = (n + 1, s + lu)
    return out


def test_clip_length_brute_force(spark):
    import random
    from cdap_geo_spark.operators.segments import clip_length_join
    random.seed(41)
    segs = [(i, random.randrange(500), random.randrange(500),
             random.randrange(500), random.randrange(500))
            for i in range(80)]
    boxes = []
    for j in range(40):
        x0, y0 = random.randrange(450), random.randrange(450)
        boxes.append((j, x0, y0, x0 + random.randrange(1, 120),
                      y0 + random.randrange(1, 120)))
    sdf = spark.createDataFrame(
        segs, "seg_id long, ax long, ay long, bx long, by long")
    bdf = spark.createDataFrame(
        boxes, "box_id long, minx long, miny long, maxx long, maxy long")
    got = {r.box_id: (r.n_segs, r.len_sum_u)
           for r in clip_length_join(sdf, bdf, cell=100).collect()}
    assert got == _clip_brute(segs, boxes)


def test_clip_length_known_geometry(spark):
    from cdap_geo_spark.operators.segments import clip_length_join
    segs = [(1, 10, 50, 90, 50),    # fully inside box 1 -> length 80
            (2, -50, 50, 150, 50),  # crosses box 1 -> clipped to 100
            (3, 10, 500, 90, 500),  # far away -> absent
            (4, 20, 20, 20, 20)]    # zero-length inside -> counted, len 0
    boxes = [(1, 0, 0, 100, 100)]
    sdf = spark.createDataFrame(
        segs, "seg_id long, ax long, ay long, bx long, by long")
    bdf = spark.createDataFrame(
        boxes, "box_id long, minx long, miny long, maxx long, maxy long")
    (r,) = clip_length_join(sdf, bdf, cell=64).collect()
    assert r.n_segs == 3
    assert r.len_sum_u == 80_000_000 + 100_000_000 + 0
    import pytest as _pt
    with _pt.raises(ValueError):
        clip_length_join(sdf, bdf, cell=0)


def test_raster_line_brute_force(spark):
    import random
    from cdap_geo_spark.operators.segments import raster_line
    random.seed(17)
    cell = 10
    segs = [(i, random.randrange(200), random.randrange(200),
             random.randrange(200), random.randrange(200))
            for i in range(60)]
    sdf = spark.createDataFrame(
        segs, "seg_id long, ax long, ay long, bx long, by long")
    got = {(r.cx, r.cy): r.n_segs
           for r in raster_line(sdf, cell=cell).collect()}
    want = {}
    for _, ax, ay, bx, by in segs:
        dx, dy = bx - ax, by - ay
        for cx in range(min(ax, bx) // cell, max(ax, bx) // cell + 1):
            for cy in range(min(ay, by) // cell,
                            max(ay, by) // cell + 1):
                cr = [dx * ((cy + iy) * cell - ay)
                      - dy * ((cx + ix) * cell - ax)
                      for ix, iy in ((0, 0), (1, 0), (0, 1), (1, 1))]
                if not (all(c > 0 for c in cr)
                        or all(c < 0 for c in cr)):
                    want[(cx, cy)] = want.get((cx, cy), 0) + 1
    assert got == want


def test_raster_line_known_shapes(spark):
    from cdap_geo_spark.operators.segments import raster_line
    segs = [(1, 5, 5, 95, 5),     # horizontal: row of 10 cells at cy=0
            (2, 5, 5, 95, 95),    # diagonal through cell corners
            (3, 50, 50, 50, 50)]  # degenerate point -> its own cell
    sdf = spark.createDataFrame(
        segs, "seg_id long, ax long, ay long, bx long, by long")
    cells = {(r.cx, r.cy): r.n_segs
             for r in raster_line(sdf, cell=10).collect()}
    assert all(cells.get((cx, 0)) for cx in range(10))  # horizontal row
    # the exact diagonal y=x touches both (k,k) cells and, at each
    # corner, the neighbours it passes through the corner of
    assert all((k, k) in cells for k in range(10))
    assert cells[(5, 5)] >= 2  # diagonal + the degenerate point
    # supercover contains both endpoint cells of every segment
    assert (0, 0) in cells and (9, 9) in cells and (9, 0) in cells
