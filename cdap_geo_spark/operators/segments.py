"""Exact line-segment intersection join + segment-attached analytics.

The reference's join surface stops at bbox / point-in-polygon /
intersects over areal geometries (``cdap_geo/index_bbox.py:32-76``,
``cdap_geo/udf.py``); linear networks (roads, rivers, trajectories)
need the segment x segment predicate, and that predicate is special:
*segment intersection is decidable in pure integer arithmetic*. The
classic orientation test — sign of the cross product ``(B-A) x (P-A)``
— involves only multiplication and subtraction, so on integer-valued
coordinates the WHOLE join (candidate generation, refinement, output)
runs without a single float, making it bit-exact across engines and
immune to the near-collinear robustness failures that plague
double-based predicates (Shewchuk's adaptive-precision motivation,
here resolved by staying integral end-to-end).

Plan shape (same skeleton as ``operators/sjoin.sjoin_pairs``):

1. each segment fans out map-side to the grid cells covered by its
   bbox (``F.sequence`` two-stage explode, bounded by segment length /
   cell — a contract the caller owns by picking ``cell``);
2. ONE shuffle: the (cx, cy) equi-join of the two narrow
   ``(id, ax, ay, bx, by, cx, cy)`` relations;
3. the exact integer predicate refines candidates IN the join
   projection (whole-stage codegen, zero Python);
4. duplicate pairs from multi-cell overlap collapse with
   ``dropDuplicates`` AFTER refinement (refine-before-dedup keeps the
   dedup relation minimal — same argument as sjoin.py:321).

At 100 TB: the candidate relation is 5 longs + 2 cell keys wide, AQE
handles skewed cells (dense urban grids), and the predicate never
leaves the JVM. Cross products are bounded by (extent)^2 — 64-bit safe
up to ~3e9-unit extents, far beyond any planar CRS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cross(ox: Column, oy: Column, ax: Column, ay: Column,
           bx: Column, by: Column) -> Column:
    """Sign-carrying double area of triangle (O, A, B) — exact BIGINT."""
    return ((ax - ox) * (by - oy) - (ay - oy) * (bx - ox)).cast("long")


def _on_seg(px, py, qx, qy, rx, ry) -> Column:
    """Given R collinear with segment PQ: is R within PQ's bbox?"""
    return (
        (F.least(px, qx) <= rx) & (rx <= F.greatest(px, qx))
        & (F.least(py, qy) <= ry) & (ry <= F.greatest(py, qy)))


def segments_intersect(ax, ay, bx, by, cx, cy, dx, dy) -> Column:
    """True iff closed segments AB and CD share at least one point.

    The complete CLRS-style test: proper crossing via opposite
    orientation signs, plus the four collinear-touch cases. All-integer
    on integer inputs — no epsilon, no robustness caveat.
    """
    d1 = _cross(cx, cy, dx, dy, ax, ay)
    d2 = _cross(cx, cy, dx, dy, bx, by)
    d3 = _cross(ax, ay, bx, by, cx, cy)
    d4 = _cross(ax, ay, bx, by, dx, dy)
    proper = ((((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
              & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))))
    touch = (((d1 == 0) & _on_seg(cx, cy, dx, dy, ax, ay))
             | ((d2 == 0) & _on_seg(cx, cy, dx, dy, bx, by))
             | ((d3 == 0) & _on_seg(ax, ay, bx, by, cx, cy))
             | ((d4 == 0) & _on_seg(ax, ay, bx, by, dx, dy)))
    return proper | touch


def _cells(df: DataFrame, cell: int, cols: list) -> DataFrame:
    """Fan each segment out to the grid cells covered by its bbox."""
    x0 = F.least(F.col(cols[0]), F.col(cols[2]))
    x1 = F.greatest(F.col(cols[0]), F.col(cols[2]))
    y0 = F.least(F.col(cols[1]), F.col(cols[3]))
    y1 = F.greatest(F.col(cols[1]), F.col(cols[3]))
    e = df.withColumn("_cx", F.explode(F.sequence(
        (x0 / cell).cast("long"), (x1 / cell).cast("long"))))
    return e.withColumn("_cy", F.explode(F.sequence(
        (y0 / cell).cast("long"), (y1 / cell).cast("long"))))


def segment_join(left: DataFrame, right: DataFrame, *, cell: int,
                 left_id: str = "road_id", right_id: str = "trip_id",
                 left_coords=("ax", "ay", "bx", "by"),
                 right_coords=("cx", "cy", "dx", "dy")) -> DataFrame:
    """All (left_id, right_id) pairs whose segments intersect.

    Inputs: one row per segment with non-negative integer endpoint
    coordinates (the non-negativity contract matches
    ``zonal.cell_coverage`` — integer ``div`` truncates toward zero).
    ``cell`` bounds the map-side fan-out: a segment spans at most
    ``(len/cell + 2)**2`` cells, so pick cell on the order of the
    median segment length.
    """
    if cell < 1:
        raise ValueError("segment_join: cell must be >= 1")
    la, lb = list(left_coords), list(right_coords)
    l = left.select(F.col(left_id),
                    *[F.col(c).cast("long").alias(c) for c in la])
    r = right.select(F.col(right_id),
                     *[F.col(c).cast("long").alias(c) for c in lb])
    lc = _cells(l, cell, la)
    rc = _cells(r, cell, lb)
    cand = lc.join(rc, ["_cx", "_cy"])
    hit = cand.where(segments_intersect(
        *[F.col(c) for c in la], *[F.col(c) for c in lb]))
    return hit.select(left_id, right_id).dropDuplicates(
        [left_id, right_id])


def segment_join_count(left: DataFrame, right: DataFrame, *,
                       cell: int, **kw) -> DataFrame:
    """Per-left-segment intersection count (kept pairs relation narrow
    through the shuffle; the count is one extra keyed agg)."""
    left_id = kw.get("left_id", "road_id")
    pairs = segment_join(left, right, cell=cell, **kw)
    return pairs.groupBy(left_id).agg(
        F.count(F.lit(1)).cast("long").alias("n_crossings"))
