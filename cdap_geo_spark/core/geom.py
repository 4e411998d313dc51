"""Vectorized geometry kernels over :class:`~cdap_geo_spark.core.wkb.GeomBatch`.

Semantics pinned to the reference's shapely usage:

* ``intersects`` counts boundary contact as True (shapely convention;
  the reference's exact join predicate, ``cdap_geo/functions.py:72-78``);
* ``area`` is exterior minus holes (``cdap_geo/functions.py:12-14``);
* NULL/empty geometries never error and never match
  (``cdap_geo/sedona.py:15-36`` null-guard semantics).

All pair predicates are batch kernels: they take a GeomBatch per side
plus (li, ri) index arrays naming candidate pairs, and return a bool /
float array per pair. Inside a batch, work is grouped by the heavier
geometry so each polygon's edge table is assembled once and tested
against many partners at once (the NumPy analogue of shapely's
prepared geometries, cf. ``cdap_geo/_indexing.py:253-254``).
"""

from __future__ import annotations

import numpy as np

from cdap_geo_spark.core.wkb import (
    GeomBatch,
    KIND_LINESTRING,
    KIND_MULTILINESTRING,
    KIND_MULTIPOINT,
    KIND_MULTIPOLYGON,
    KIND_POINT,
    KIND_POLYGON,
)

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Per-geometry scalar kernels
# ---------------------------------------------------------------------------

def area(batch: GeomBatch) -> np.ndarray:
    """(n,) polygon area = |exterior| - sum(|holes|) per part, else 0."""
    n = len(batch)
    out = np.zeros(n)
    r = len(batch.ring_coord_off) - 1
    if r == 0:
        return out
    # signed shoelace per ring, vectorized with reduceat over cross terms
    x, y = batch.coords[:, 0], batch.coords[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    ring_starts = batch.ring_coord_off[:-1]
    ring_stops = batch.ring_coord_off[1:]
    ring_area = np.zeros(r)
    for ri in range(r):  # fallback loop replaced below for hot use
        s, e = ring_starts[ri], ring_stops[ri]
        if e - s >= 4:
            ring_area[ri] = 0.5 * np.sum(cross[s:e - 1])
    # assign rings to parts; ring 0 of each polygon part is exterior
    for p in range(len(batch.part_kind)):
        if batch.part_kind[p] != KIND_POLYGON:
            continue
        rs, re_ = batch.part_ring_off[p], batch.part_ring_off[p + 1]
        if re_ <= rs:
            continue
        part_area = abs(ring_area[rs]) - np.sum(np.abs(ring_area[rs + 1:re_]))
        g = np.searchsorted(batch.geom_part_off, p, side="right") - 1
        out[g] += part_area
    return out


def ring_signed_areas(batch: GeomBatch) -> np.ndarray:
    """(r,) signed shoelace area per ring (debug/tests)."""
    x, y = batch.coords[:, 0], batch.coords[:, 1]
    r = len(batch.ring_coord_off) - 1
    out = np.zeros(r)
    for ri in range(r):
        s, e = batch.ring_coord_off[ri], batch.ring_coord_off[ri + 1]
        if e - s >= 4:
            xx, yy = x[s:e], y[s:e]
            out[ri] = 0.5 * np.sum(xx[:-1] * yy[1:] - xx[1:] * yy[:-1])
    return out


def centroid(batch: GeomBatch) -> np.ndarray:
    """(n, 2) centroid per geometry, highest-dimension rule (the
    PostGIS/GEOS ST_Centroid convention the reference's shapely
    delegate follows): polygon parts present -> area-weighted centroid
    (exterior minus holes, orientation-independent via sign-normalized
    shoelace moments); else line parts -> length-weighted edge-midpoint
    centroid; else points -> vertex mean. NULL/empty (or zero-measure
    at the chosen dimension falling through every rule) -> NaN row.
    """
    n = len(batch)
    out = np.full((n, 2), np.nan)
    x, y = batch.coords[:, 0], batch.coords[:, 1]
    for g in range(n):
        if not batch.valid[g]:
            continue
        p0, p1 = batch.geom_part_off[g], batch.geom_part_off[g + 1]
        kinds = batch.part_kind[p0:p1]
        # local frame anchored at the geometry's first vertex: raw
        # shoelace at projected-CRS magnitudes (~1e6) builds ~1e18
        # intermediates that cancel down to ~1e14 — catastrophic
        # precision loss; local coordinates keep every product exact
        gs = batch.ring_coord_off[batch.part_ring_off[p0]]
        ax, ay = x[gs], y[gs]
        if np.any(kinds == KIND_POLYGON):
            tot_a = 0.0
            tot_mx = 0.0
            tot_my = 0.0
            for p in range(p0, p1):
                if batch.part_kind[p] != KIND_POLYGON:
                    continue
                rs, re_ = batch.part_ring_off[p], batch.part_ring_off[p + 1]
                for k, ri in enumerate(range(rs, re_)):
                    s, e = (batch.ring_coord_off[ri],
                            batch.ring_coord_off[ri + 1])
                    if e - s < 4:
                        continue
                    xx, yy = x[s:e] - ax, y[s:e] - ay
                    cross = xx[:-1] * yy[1:] - xx[1:] * yy[:-1]
                    a = 0.5 * np.sum(cross)
                    mx = np.sum((xx[:-1] + xx[1:]) * cross) / 6.0
                    my = np.sum((yy[:-1] + yy[1:]) * cross) / 6.0
                    # normalize to positive orientation, then ring 0
                    # adds (exterior) and later rings subtract (holes)
                    sgn = (1.0 if a >= 0 else -1.0) * (1.0 if k == 0
                                                       else -1.0)
                    tot_a += sgn * a
                    tot_mx += sgn * mx
                    tot_my += sgn * my
            if tot_a > 0:
                out[g] = (ax + tot_mx / tot_a, ay + tot_my / tot_a)
                continue
            # degenerate (zero-area) polygon: fall through to lines
        # point parts contribute no edges, so a nonempty edge set means
        # line-dimension parts exist (or a degenerate polygon boundary)
        segs = _geom_edges(batch, g)
        if len(segs):
            ln = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
            total = ln.sum()
            if total > 0:
                mx = (segs[:, 0] + segs[:, 2]) / 2.0
                my = (segs[:, 1] + segs[:, 3]) / 2.0
                out[g] = (np.dot(ln, mx) / total, np.dot(ln, my) / total)
                continue
        pts = _geom_points(batch, g)
        if len(pts):
            out[g] = pts.mean(axis=0)
    return out


def length(batch: GeomBatch) -> np.ndarray:
    """(n,) boundary length per geometry: polygon parts contribute ring
    perimeters (exterior AND holes — the PostGIS ``ST_Perimeter``
    convention), line parts their polyline length, point parts 0.
    NULL/empty geometries -> 0 (same never-error contract as
    :func:`area`; the reference delegates to ``shapely .length``,
    ``cdap_geo/misc.py``'s flattened-part accounting).

    Fully vectorized: one ``hypot`` over every consecutive coordinate
    pair, ring-boundary segments zeroed, then ring -> part -> geometry
    sums via cumulative-sum differences (no per-ring Python loop).
    """
    n = len(batch)
    out = np.zeros(n)
    if len(batch.coords) < 2:
        return out
    x, y = batch.coords[:, 0], batch.coords[:, 1]
    seg = np.hypot(x[1:] - x[:-1], y[1:] - y[:-1])
    # zero the phantom segments that straddle a ring boundary: ring ri
    # owns coords [s, e) hence segments [s, e-1); seg[e-1] belongs to
    # the NEXT ring's first vertex pair only when e < len(coords)
    ends = batch.ring_coord_off[1:-1] - 1          # interior boundaries
    seg[ends[(ends >= 0) & (ends < len(seg))]] = 0.0
    csum = np.concatenate(([0.0], np.cumsum(seg)))
    s_ = batch.ring_coord_off[:-1]
    e_ = batch.ring_coord_off[1:]
    # ring length = sum(seg[s : e-1]) = csum[e-1] - csum[s]; degenerate
    # rings (e - s < 2, e.g. point parts) index csum[s]-csum[s] = 0
    ring_len = csum[np.maximum(e_ - 1, s_)] - csum[s_]
    rcs = np.concatenate(([0.0], np.cumsum(ring_len)))
    part_len = rcs[batch.part_ring_off[1:]] - rcs[batch.part_ring_off[:-1]]
    part_len[batch.part_kind == KIND_POINT] = 0.0
    pcs = np.concatenate(([0.0], np.cumsum(part_len)))
    out = pcs[batch.geom_part_off[1:]] - pcs[batch.geom_part_off[:-1]]
    out[~batch.valid] = 0.0
    return out


def vertex_counts(batch: GeomBatch) -> np.ndarray:
    """(n,) total vertex count per geometry — the reference's complexity
    signal (``cdap_geo/misc.py:30-32``), used for skew routing."""
    first = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[:-1]]]
    last = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[1:]]]
    return (last - first).astype(np.int64)


# ---------------------------------------------------------------------------
# Ring extraction helpers (grouped kernels below)
# ---------------------------------------------------------------------------

def _geom_ring_range(batch: GeomBatch, g: int):
    p0, p1 = batch.geom_part_off[g], batch.geom_part_off[g + 1]
    return batch.part_ring_off[p0], batch.part_ring_off[p1]


def _geom_edges(batch: GeomBatch, g: int):
    """All edges of geometry g as (E,4) [x0,y0,x1,y1].

    Rings contribute their closing edges as stored (WKB rings repeat
    the first vertex, so consecutive pairs cover the closure). Point
    parts contribute no edges.
    """
    r0, r1 = _geom_ring_range(batch, g)
    segs = []
    for ri in range(r0, r1):
        s, e = batch.ring_coord_off[ri], batch.ring_coord_off[ri + 1]
        if e - s >= 2:
            c = batch.coords[s:e]
            segs.append(np.hstack([c[:-1], c[1:]]))
    if not segs:
        return np.zeros((0, 4))
    return np.concatenate(segs)


def _geom_points(batch: GeomBatch, g: int) -> np.ndarray:
    r0, r1 = _geom_ring_range(batch, g)
    s = batch.ring_coord_off[r0]
    e = batch.ring_coord_off[r1]
    return batch.coords[s:e]


def _geom_polygon_rings(batch: GeomBatch, g: int):
    """Rings of all polygon parts of geometry g (list of (k,2) arrays)."""
    rings = []
    for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
        if batch.part_kind[p] != KIND_POLYGON:
            continue
        for ri in range(batch.part_ring_off[p], batch.part_ring_off[p + 1]):
            s, e = batch.ring_coord_off[ri], batch.ring_coord_off[ri + 1]
            if e - s >= 4:
                rings.append(batch.coords[s:e])
    return rings


def _has_polygon(batch: GeomBatch, g: int) -> bool:
    p0, p1 = batch.geom_part_off[g], batch.geom_part_off[g + 1]
    return bool(np.any(batch.part_kind[p0:p1] == KIND_POLYGON))


# ---------------------------------------------------------------------------
# Point-in-polygon (vectorized: many points vs one polygon's rings)
# ---------------------------------------------------------------------------

def points_in_rings(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Even-odd crossing test of (k,) points against a ring set.

    Boundary points count as inside (shapely ``intersects`` treats
    boundary contact as True). Holes are handled by parity: a point in
    a hole crosses both the exterior and the hole ring.
    """
    k = len(px)
    inside = np.zeros(k, bool)
    boundary = np.zeros(k, bool)
    for ring in rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        # crossing-number: edge straddles the horizontal line of the point
        PX = px[:, None]
        PY = py[:, None]
        cond = (y0[None, :] > PY) != (y1[None, :] > PY)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0[None, :] + (PY - y0[None, :]) / (y1[None, :] - y0[None, :]) * \
                (x1[None, :] - x0[None, :])
        crossing = cond & (PX < xint)
        inside ^= (np.sum(crossing, axis=1) % 2).astype(bool)
        # boundary: point on segment
        boundary |= _points_on_segments(px, py, x0, y0, x1, y1)
    return inside | boundary


def _points_on_segments(px, py, x0, y0, x1, y1) -> np.ndarray:
    """(k,) True if point lies on any of the (E,) segments (within eps)."""
    PX, PY = px[:, None], py[:, None]
    dx, dy = (x1 - x0)[None, :], (y1 - y0)[None, :]
    ex, ey = PX - x0[None, :], PY - y0[None, :]
    cross = dx * ey - dy * ex
    seg_len2 = dx * dx + dy * dy
    dot = ex * dx + ey * dy
    on_line = np.abs(cross) <= _EPS * np.maximum(1.0, np.sqrt(seg_len2))
    within = (dot >= -_EPS) & (dot <= seg_len2 + _EPS)
    degenerate = seg_len2 <= _EPS * _EPS
    on_pt = degenerate & (np.abs(ex) <= _EPS) & (np.abs(ey) <= _EPS)
    return np.any((on_line & within & ~degenerate) | on_pt, axis=1)


def segments_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(A,B) bool: segment set a (A,4) × segment set b (B,4) intersection,
    boundary/collinear touch counts as True."""
    ax0, ay0, ax1, ay1 = (a[:, i][:, None] for i in range(4))
    bx0, by0, bx1, by1 = (b[:, i][None, :] for i in range(4))

    d1 = _orient(bx0, by0, bx1, by1, ax0, ay0)
    d2 = _orient(bx0, by0, bx1, by1, ax1, ay1)
    d3 = _orient(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = _orient(ax0, ay0, ax1, ay1, bx1, by1)

    proper = ((d1 > _EPS) & (d2 < -_EPS) | (d1 < -_EPS) & (d2 > _EPS)) & \
             ((d3 > _EPS) & (d4 < -_EPS) | (d3 < -_EPS) & (d4 > _EPS))
    touch = (
        (np.abs(d1) <= _EPS) & _on_seg(bx0, by0, bx1, by1, ax0, ay0) |
        (np.abs(d2) <= _EPS) & _on_seg(bx0, by0, bx1, by1, ax1, ay1) |
        (np.abs(d3) <= _EPS) & _on_seg(ax0, ay0, ax1, ay1, bx0, by0) |
        (np.abs(d4) <= _EPS) & _on_seg(ax0, ay0, ax1, ay1, bx1, by1)
    )
    return proper | touch


def _orient(x0, y0, x1, y1, px, py):
    return (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)


def _on_seg(x0, y0, x1, y1, px, py):
    return (px >= np.minimum(x0, x1) - _EPS) & (px <= np.maximum(x0, x1) + _EPS) & \
           (py >= np.minimum(y0, y1) - _EPS) & (py <= np.maximum(y0, y1) + _EPS)


# ---------------------------------------------------------------------------
# Pairwise predicates over candidate pair lists
# ---------------------------------------------------------------------------

def is_axis_rect(batch: GeomBatch, bounds: np.ndarray | None = None) -> np.ndarray:
    """(n,) True for single-part single-ring 5-point axis-aligned
    rectangles — the dominant polygon class (boxes, tiles), which gets
    closed-form pair kernels."""
    from cdap_geo_spark.core.wkb import KIND_POLYGON
    if bounds is None:
        bounds = batch.bounds()
    n = len(batch)
    out = np.zeros(n, bool)
    one_part = (batch.geom_part_off[1:] - batch.geom_part_off[:-1]) == 1
    cand = np.flatnonzero(one_part & batch.valid &
                          (batch.kinds == np.uint8(KIND_POLYGON)))
    if len(cand) == 0:
        return out
    p = batch.geom_part_off[cand]
    cand = cand[(batch.part_ring_off[p + 1] - batch.part_ring_off[p]) == 1]
    if len(cand) == 0:
        return out
    r = batch.part_ring_off[batch.geom_part_off[cand]]
    cand = cand[(batch.ring_coord_off[r + 1] - batch.ring_coord_off[r]) == 5]
    if len(cand) == 0:
        return out
    # fully vectorized check of all candidates at once: gather each
    # candidate's 5 ring vertices as a (k, 5) block (the round-1
    # per-geometry loop here cost ~18 us per geometry and dominated
    # whole refine batches when every right geometry is distinct)
    s = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[cand]]]
    gi = s[:, None] + np.arange(5)[None, :]
    xs = batch.coords[gi, 0]
    ys = batch.coords[gi, 1]
    bx0 = bounds[cand, 0][:, None]
    bx1 = bounds[cand, 2][:, None]
    by0 = bounds[cand, 1][:, None]
    by1 = bounds[cand, 3][:, None]
    good = (((xs == bx0) | (xs == bx1)).all(axis=1)
            & ((ys == by0) | (ys == by1)).all(axis=1)
            & (xs[:, 0] == xs[:, 4]) & (ys[:, 0] == ys[:, 4]))
    out[cand[good]] = True
    return out


def polygon_edge_table(batch: GeomBatch):
    """Global polygon-ring edge table, fully vectorized.

    Returns (x0, y0, x1, y1, geom_edge_off) where geom_edge_off is a
    CSR (n+1,) giving each geometry's slice of edges. Only polygon
    parts contribute (rings closed as stored); geometries without
    polygon parts have empty slices.
    """
    from cdap_geo_spark.core.wkb import KIND_POLYGON, _expand_ranges
    n = len(batch)
    p = len(batch.part_kind)
    part_geom = np.repeat(np.arange(n),
                          batch.geom_part_off[1:] - batch.geom_part_off[:-1])
    is_poly_part = batch.part_kind == KIND_POLYGON
    nrings = batch.part_ring_off[1:] - batch.part_ring_off[:-1]
    ring_part = np.repeat(np.arange(p), nrings)
    ring_is_poly = is_poly_part[ring_part] if p else np.zeros(0, bool)
    ring_geom = part_geom[ring_part] if p else np.zeros(0, np.int64)
    r_starts = batch.ring_coord_off[:-1]
    r_stops = batch.ring_coord_off[1:]
    ring_edges = np.maximum(r_stops - r_starts - 1, 0)
    ring_edges = np.where(ring_is_poly, ring_edges, 0)
    eidx = _expand_ranges(r_starts, r_starts + ring_edges)
    x0 = batch.coords[eidx, 0] if len(eidx) else np.zeros(0)
    y0 = batch.coords[eidx, 1] if len(eidx) else np.zeros(0)
    x1 = batch.coords[eidx + 1, 0] if len(eidx) else np.zeros(0)
    y1 = batch.coords[eidx + 1, 1] if len(eidx) else np.zeros(0)
    counts = np.zeros(n, np.int64)
    np.add.at(counts, ring_geom, ring_edges)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    return x0, y0, x1, y1, off


def _points_in_geoms_flat(px: np.ndarray, py: np.ndarray,
                          rb: GeomBatch, ri: np.ndarray,
                          edge_table=None) -> np.ndarray:
    """(m,) even-odd PIP of point i against rb[ri[i]] — flat over the
    pair-expanded edge table, zero per-group Python."""
    if edge_table is None:
        edge_table = polygon_edge_table(rb)
    ex0, ey0, ex1, ey1, off = edge_table
    from cdap_geo_spark.core.wkb import _expand_ranges
    starts, stops = off[ri], off[ri + 1]
    eidx = _expand_ranges(starts, stops)
    pown = np.repeat(np.arange(len(ri)), stops - starts)
    out = np.zeros(len(ri), bool)
    if len(eidx) == 0:
        return out
    X0, Y0 = ex0[eidx], ey0[eidx]
    X1, Y1 = ex1[eidx], ey1[eidx]
    PX, PY = px[pown], py[pown]
    cond = (Y0 > PY) != (Y1 > PY)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = X0 + (PY - Y0) / (Y1 - Y0) * (X1 - X0)
    crossing = cond & (PX < xint)
    counts = np.zeros(len(ri), np.int64)
    np.add.at(counts, pown, crossing.astype(np.int64))
    out = (counts % 2).astype(bool)
    # boundary touch counts as inside
    dx, dy = X1 - X0, Y1 - Y0
    ex, ey = PX - X0, PY - Y0
    cross = dx * ey - dy * ex
    seg_len2 = dx * dx + dy * dy
    dot = ex * dx + ey * dy
    on = (np.abs(cross) <= _EPS * np.maximum(1.0, np.sqrt(seg_len2))) & \
         (dot >= -_EPS) & (dot <= seg_len2 + _EPS) & (seg_len2 > _EPS * _EPS)
    np.logical_or.at(out, pown, on)
    return out


def _is_single_point(batch: GeomBatch) -> np.ndarray:
    first = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[:-1]]]
    last = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[1:]]]
    return batch.valid & (batch.kinds == KIND_POINT) & ((last - first) == 1)


def general_edge_table(batch: GeomBatch):
    """Like :func:`polygon_edge_table` but including LineString parts
    (every part with >=2 coords per ring contributes its path edges)."""
    from cdap_geo_spark.core.wkb import KIND_LINESTRING, KIND_POLYGON, \
        _expand_ranges
    n = len(batch)
    p = len(batch.part_kind)
    part_geom = np.repeat(np.arange(n),
                          batch.geom_part_off[1:] - batch.geom_part_off[:-1])
    edgy = (batch.part_kind == KIND_POLYGON) | \
           (batch.part_kind == KIND_LINESTRING)
    nrings = batch.part_ring_off[1:] - batch.part_ring_off[:-1]
    ring_part = np.repeat(np.arange(p), nrings)
    ring_ok = edgy[ring_part] if p else np.zeros(0, bool)
    ring_geom = part_geom[ring_part] if p else np.zeros(0, np.int64)
    r_starts = batch.ring_coord_off[:-1]
    r_stops = batch.ring_coord_off[1:]
    ring_edges = np.maximum(r_stops - r_starts - 1, 0)
    ring_edges = np.where(ring_ok, ring_edges, 0)
    eidx = _expand_ranges(r_starts, r_starts + ring_edges)
    x0 = batch.coords[eidx, 0] if len(eidx) else np.zeros(0)
    y0 = batch.coords[eidx, 1] if len(eidx) else np.zeros(0)
    x1 = batch.coords[eidx + 1, 0] if len(eidx) else np.zeros(0)
    y1 = batch.coords[eidx + 1, 1] if len(eidx) else np.zeros(0)
    counts = np.zeros(n, np.int64)
    np.add.at(counts, ring_geom, ring_edges)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    return x0, y0, x1, y1, off


def _edges_cross_flat(lt, rt, li: np.ndarray, ri: np.ndarray) -> np.ndarray:
    """(m,) any left edge intersects any right edge per pair — flat
    cartesian expansion per pair (chunked), exact incl. touch."""
    lx0, ly0, lx1, ly1, loff = lt
    rx0, ry0, rx1, ry1, roff = rt
    m = len(li)
    out = np.zeros(m, bool)
    el = loff[li + 1] - loff[li]
    er = roff[ri + 1] - roff[ri]
    rows = el * er
    total = int(rows.sum())
    if total == 0:
        return out
    # process pairs in chunks bounded by expanded row count
    order = np.arange(m)
    csum = np.cumsum(rows)
    budget = 1_000_000
    cuts = np.searchsorted(csum, np.arange(budget, total + budget, budget))
    chunk_starts = [0] + sorted(set(int(c) for c in cuts if 0 < c < m)) + [m]
    for cs_i in range(len(chunk_starts) - 1):
        sel = order[chunk_starts[cs_i]:chunk_starts[cs_i + 1]]
        sel = sel[rows[sel] > 0]
        if len(sel) == 0:
            continue
        nrows = rows[sel]
        pown = np.repeat(np.arange(len(sel)), nrows)
        base = np.concatenate(([0], np.cumsum(nrows)[:-1]))
        local = np.arange(int(nrows.sum())) - base[pown]
        le_local = local // er[sel][pown]
        re_local = local % er[sel][pown]
        lidx = loff[li[sel]][pown] + le_local
        ridx = roff[ri[sel]][pown] + re_local
        ax0, ay0, ax1, ay1 = lx0[lidx], ly0[lidx], lx1[lidx], ly1[lidx]
        bx0, by0, bx1, by1 = rx0[ridx], ry0[ridx], rx1[ridx], ry1[ridx]
        # bbox reject first (cheap), then orientation test
        ok = (np.minimum(ax0, ax1) <= np.maximum(bx0, bx1) + _EPS) & \
             (np.maximum(ax0, ax1) >= np.minimum(bx0, bx1) - _EPS) & \
             (np.minimum(ay0, ay1) <= np.maximum(by0, by1) + _EPS) & \
             (np.maximum(ay0, ay1) >= np.minimum(by0, by1) - _EPS)
        hit = np.zeros(len(ok), bool)
        if ok.any():
            s = np.flatnonzero(ok)
            d1 = _orient(bx0[s], by0[s], bx1[s], by1[s], ax0[s], ay0[s])
            d2 = _orient(bx0[s], by0[s], bx1[s], by1[s], ax1[s], ay1[s])
            d3 = _orient(ax0[s], ay0[s], ax1[s], ay1[s], bx0[s], by0[s])
            d4 = _orient(ax0[s], ay0[s], ax1[s], ay1[s], bx1[s], by1[s])
            proper = (((d1 > _EPS) & (d2 < -_EPS)) | ((d1 < -_EPS) & (d2 > _EPS))) & \
                     (((d3 > _EPS) & (d4 < -_EPS)) | ((d3 < -_EPS) & (d4 > _EPS)))
            touch = (
                (np.abs(d1) <= _EPS) & _on_seg(bx0[s], by0[s], bx1[s], by1[s], ax0[s], ay0[s]) |
                (np.abs(d2) <= _EPS) & _on_seg(bx0[s], by0[s], bx1[s], by1[s], ax1[s], ay1[s]) |
                (np.abs(d3) <= _EPS) & _on_seg(ax0[s], ay0[s], ax1[s], ay1[s], bx0[s], by0[s]) |
                (np.abs(d4) <= _EPS) & _on_seg(ax0[s], ay0[s], ax1[s], ay1[s], bx1[s], by1[s])
            )
            hit[s] = proper | touch
        np.logical_or.at(out, sel[pown], hit)
    return out


def _geom_has_polygon(batch: GeomBatch) -> np.ndarray:
    """(n,) vectorized: geometry has at least one polygon part."""
    n = len(batch)
    part_geom = np.repeat(np.arange(n),
                          batch.geom_part_off[1:] - batch.geom_part_off[:-1])
    out = np.zeros(n, bool)
    if len(part_geom):
        np.logical_or.at(out, part_geom, batch.part_kind == KIND_POLYGON)
    return out


def pairs_intersect(lb: GeomBatch, rb: GeomBatch,
                    li: np.ndarray, ri: np.ndarray) -> np.ndarray:
    """Exact ``intersects`` for candidate pairs (li[i], ri[i]).

    Closed-form fast path for point x axis-rectangle pairs (the
    dominant case: point docs vs region boxes/tiles); everything else
    goes through the grouped vectorized kernels (one edge table per
    distinct right geometry). Dispatch by kind:

    * point × polygon → vectorized PIP;
    * point × point  → coordinate equality (eps);
    * anything with edges × anything with edges → edge-pair
      intersection test, plus containment probes both ways.
    """
    m = len(li)
    out = np.zeros(m, bool)
    if m == 0:
        return out
    ok = lb.valid[li] & rb.valid[ri]

    # ---- closed-form: single-point left x axis-rect right -------------
    lpt = _is_single_point(lb)
    rrect_bounds = rb.bounds()
    rrect = is_axis_rect(rb, rrect_bounds)
    fast = ok & lpt[li] & rrect[ri]
    if fast.any():
        fl, fr = li[fast], ri[fast]
        px = lb.coords[lb.ring_coord_off[lb.part_ring_off[
            lb.geom_part_off[fl]]], 0]
        py = lb.coords[lb.ring_coord_off[lb.part_ring_off[
            lb.geom_part_off[fl]]], 1]
        out[fast] = ((px >= rrect_bounds[fr, 0]) & (px <= rrect_bounds[fr, 2]) &
                     (py >= rrect_bounds[fr, 1]) & (py <= rrect_bounds[fr, 3]))

    # ---- flat PIP: single-point left x general polygon right ----------
    rhas_poly = _geom_has_polygon(rb)
    flatpip = ok & ~fast & lpt[li] & rhas_poly[ri]
    if flatpip.any():
        fl, fr = li[flatpip], ri[flatpip]
        cidx = lb.ring_coord_off[lb.part_ring_off[lb.geom_part_off[fl]]]
        out[flatpip] = _points_in_geoms_flat(
            lb.coords[cidx, 0], lb.coords[cidx, 1], rb, fr)

    rest = ok & ~fast & ~flatpip
    if not rest.any():
        return out

    # ---- flat edge-cross + containment probes for edge-bearing lefts --
    ltab = general_edge_table(lb)
    rtab = general_edge_table(rb)
    l_has_edges = (ltab[4][1:] - ltab[4][:-1]) > 0
    r_has_edges = (rtab[4][1:] - rtab[4][:-1]) > 0
    # multipoint rights (no edges, >1 coord) need the per-point fallback
    rfirst = rb.ring_coord_off[rb.part_ring_off[rb.geom_part_off[:-1]]]
    rlast = rb.ring_coord_off[rb.part_ring_off[rb.geom_part_off[1:]]]
    r_multi_pts = ~r_has_edges & ((rlast - rfirst) > 1)
    lfirst = lb.ring_coord_off[lb.part_ring_off[lb.geom_part_off[:-1]]]
    llast = lb.ring_coord_off[lb.part_ring_off[lb.geom_part_off[1:]]]
    lhas_poly = _geom_has_polygon(lb)

    # multi-PART geometries break the single-probe containment shortcut
    # (one part may sit inside the partner with no edge crossings while
    # the probed part is outside) -> exact grouped fallback for them
    l_multi_part = (lb.geom_part_off[1:] - lb.geom_part_off[:-1]) > 1
    r_multi_part = (rb.geom_part_off[1:] - rb.geom_part_off[:-1]) > 1
    flatC = rest & l_has_edges[li] & ~r_multi_pts[ri] & \
        ~l_multi_part[li] & ~r_multi_part[ri]
    if flatC.any():
        fl, fr = li[flatC], ri[flatC]
        hit = _edges_cross_flat(ltab, rtab, fl, fr)
        # left vertex inside right polygon (covers left-inside-right)
        sub = rhas_poly[fr]
        if sub.any():
            hit[sub] |= _points_in_geoms_flat(
                lb.coords[lfirst[fl[sub]], 0], lb.coords[lfirst[fl[sub]], 1],
                rb, fr[sub])
        # right vertex inside left polygon (covers right-inside-left)
        sub = lhas_poly[fl] & (rlast[fr] > rfirst[fr])
        if sub.any():
            hit[sub] |= _points_in_geoms_flat(
                rb.coords[rfirst[fr[sub]], 0], rb.coords[rfirst[fr[sub]], 1],
                lb, fl[sub])
        # point-like right on a left edge (single-point rights only here)
        sub = ~r_has_edges[fr] & ((rlast[fr] - rfirst[fr]) == 1)
        if sub.any():
            hit[sub] |= _points_on_edges_flat(
                rb.coords[rfirst[fr[sub]], 0], rb.coords[rfirst[fr[sub]], 1],
                ltab, fl[sub])
        out[flatC] = hit

    # ---- grouped fallback: multipoint lefts / multipoint rights -------
    rest2 = rest & ~flatC
    if not rest2.any():
        return out
    idx = np.flatnonzero(rest2)
    li_r, ri_r = li[idx], ri[idx]
    order = np.argsort(ri_r, kind="stable")
    li_s, ri_s = li_r[order], ri_r[order]
    res = np.zeros(len(idx), bool)
    group_starts = np.flatnonzero(np.concatenate(
        ([True], ri_s[1:] != ri_s[:-1])))
    group_stops = np.concatenate((group_starts[1:], [len(idx)]))
    for gs, ge in zip(group_starts, group_stops):
        r = int(ri_s[gs])
        sel = np.arange(gs, ge)
        res[sel] = _group_intersects(lb, li_s[sel], rb, r)
    out[idx[order]] = res
    return out


def _points_on_edges_flat(px: np.ndarray, py: np.ndarray, table,
                          gi: np.ndarray) -> np.ndarray:
    """(m,) point i lies on any edge of table-geometry gi[i] — flat."""
    from cdap_geo_spark.core.wkb import _expand_ranges
    ex0, ey0, ex1, ey1, off = table
    starts, stops = off[gi], off[gi + 1]
    eidx = _expand_ranges(starts, stops)
    pown = np.repeat(np.arange(len(gi)), stops - starts)
    out = np.zeros(len(gi), bool)
    if len(eidx) == 0:
        return out
    X0, Y0, X1, Y1 = ex0[eidx], ey0[eidx], ex1[eidx], ey1[eidx]
    PX, PY = px[pown], py[pown]
    dx, dy = X1 - X0, Y1 - Y0
    ex_, ey_ = PX - X0, PY - Y0
    cross = dx * ey_ - dy * ex_
    seg_len2 = dx * dx + dy * dy
    dot = ex_ * dx + ey_ * dy
    on = (np.abs(cross) <= _EPS * np.maximum(1.0, np.sqrt(seg_len2))) & \
         (dot >= -_EPS) & (dot <= seg_len2 + _EPS) & (seg_len2 > _EPS * _EPS)
    np.logical_or.at(out, pown, on)
    return out


_EDGE_CHUNK = 131_072  # bound the (L_edges x R_edges) matrices


def _group_intersects(lb: GeomBatch, lids: np.ndarray,
                      rb: GeomBatch, r: int) -> np.ndarray:
    """intersects(lb[lids[i]], rb[r]) for all i — fully vectorized:
    the group's left geometries are flattened into one edge/point table
    and tested against the (single) right geometry in bulk."""
    k = len(lids)
    result = np.zeros(k, bool)
    r_rings = _geom_polygon_rings(rb, r)
    r_edges = _geom_edges(rb, r)
    r_pts = _geom_points(rb, r)
    r_is_poly = len(r_rings) > 0

    # split left side by shape class
    l_kinds = lb.kinds[lids]
    is_pt = (l_kinds == KIND_POINT) | (l_kinds == KIND_MULTIPOINT)

    # --- left points ---------------------------------------------------
    if is_pt.any():
        idx = np.flatnonzero(is_pt)
        owners, px, py = _gather_points(lb, lids[idx])
        if len(px):
            if r_is_poly:
                hit = points_in_rings(px, py, r_rings)
            elif len(r_edges):
                hit = _points_on_segments(px, py, r_edges[:, 0], r_edges[:, 1],
                                          r_edges[:, 2], r_edges[:, 3])
            elif len(r_pts):
                hit = _points_equal_any(px, py, r_pts)
            else:
                hit = np.zeros(len(px), bool)
            np.logical_or.at(result, idx[owners], hit)

    # --- left geometries with edges (flat table, no per-row loop) ------
    nonpt = np.flatnonzero(~is_pt)
    if len(nonpt) == 0:
        return result
    gids = lids[nonpt]
    ex0, ey0, ex1, ey1, eowner = _flat_edges(lb, gids)

    if len(ex0) and len(r_edges):
        # edge-pair intersection, chunked to bound memory
        step = max(1, _EDGE_CHUNK // max(len(r_edges), 1))
        for s in range(0, len(ex0), step):
            e = slice(s, s + step)
            m = segments_intersect(
                np.column_stack([ex0[e], ey0[e], ex1[e], ey1[e]]), r_edges)
            np.logical_or.at(result, nonpt[eowner[e]], m.any(axis=1))

    if r_is_poly and len(ex0):
        # left entirely inside right: probe each left geometry's first
        # vertex (sound: if no edges cross, containment is all-or-none)
        first = np.concatenate(([True], eowner[1:] != eowner[:-1]))
        probe_owner = nonpt[eowner[first]]
        hit = points_in_rings(ex0[first], ey0[first], r_rings)
        np.logical_or.at(result, probe_owner, hit)

    # right inside left polygons: probe right's first vertex against all
    # left polygons at once
    has_poly = np.array([_has_polygon(lb, int(g)) for g in gids])
    if has_poly.any() and len(r_pts):
        sub = nonpt[has_poly]
        hit = _point_in_many(r_pts[0, 0], r_pts[0, 1], lb, lids[sub])
        np.logical_or.at(result, sub, hit)

    if len(r_pts) and not len(r_edges) and len(ex0):
        # right is point-like: on-any-left-edge test, flat per owner
        for pi in range(len(r_pts)):
            d = _seg_point_mask(r_pts[pi, 0], r_pts[pi, 1],
                                ex0, ey0, ex1, ey1)
            np.logical_or.at(result, nonpt[eowner], d)
    return result


def _flat_edges(batch: GeomBatch, gids: np.ndarray):
    """All edges of the given geometries: (x0,y0,x1,y1,owner) where
    owner indexes into gids. Vectorized: edges are consecutive coord
    pairs within rings; ring boundaries break the chain."""
    xs0, ys0, xs1, ys1, own = [], [], [], [], []
    for j, g in enumerate(gids):
        e = _geom_edges(batch, int(g))
        if len(e):
            xs0.append(e[:, 0])
            ys0.append(e[:, 1])
            xs1.append(e[:, 2])
            ys1.append(e[:, 3])
            own.append(np.full(len(e), j, np.int64))
    if not xs0:
        z = np.zeros(0)
        return z, z, z, z, np.zeros(0, np.int64)
    return (np.concatenate(xs0), np.concatenate(ys0), np.concatenate(xs1),
            np.concatenate(ys1), np.concatenate(own))


def _seg_point_mask(px: float, py: float, x0, y0, x1, y1) -> np.ndarray:
    """(E,) True where the single point lies on each segment."""
    dx, dy = x1 - x0, y1 - y0
    ex, ey = px - x0, py - y0
    cross = dx * ey - dy * ex
    seg_len2 = dx * dx + dy * dy
    dot = ex * dx + ey * dy
    on_line = np.abs(cross) <= _EPS * np.maximum(1.0, np.sqrt(seg_len2))
    within = (dot >= -_EPS) & (dot <= seg_len2 + _EPS)
    degenerate = seg_len2 <= _EPS * _EPS
    on_pt = degenerate & (np.abs(ex) <= _EPS) & (np.abs(ey) <= _EPS)
    return (on_line & within & ~degenerate) | on_pt


def _point_in_many(px: float, py: float, batch: GeomBatch,
                   gids: np.ndarray) -> np.ndarray:
    """One point vs many polygons: even-odd crossing counts accumulated
    per owner over the flat edge table of polygon rings only."""
    k = len(gids)
    out = np.zeros(k, bool)
    xs0, ys0, xs1, ys1, own = [], [], [], [], []
    for j, g in enumerate(gids):
        rings = _geom_polygon_rings(batch, int(g))
        for ring in rings:
            xs0.append(ring[:-1, 0])
            ys0.append(ring[:-1, 1])
            xs1.append(ring[1:, 0])
            ys1.append(ring[1:, 1])
            own.append(np.full(len(ring) - 1, j, np.int64))
    if not xs0:
        return out
    x0 = np.concatenate(xs0)
    y0 = np.concatenate(ys0)
    x1 = np.concatenate(xs1)
    y1 = np.concatenate(ys1)
    owner = np.concatenate(own)
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) / (y1 - y0) * (x1 - x0)
    crossing = cond & (px < xint)
    counts = np.zeros(k, np.int64)
    np.add.at(counts, owner, crossing.astype(np.int64))
    out = (counts % 2).astype(bool)
    boundary = _seg_point_mask(px, py, x0, y0, x1, y1)
    np.logical_or.at(out, owner, boundary)
    return out


def _gather_points(batch: GeomBatch, gids: np.ndarray):
    """All point coords of the (point-ish) geometries gids.

    Returns (owners, px, py) where owners[i] indexes back into gids.
    Fast path: single-point geometries are gathered with one fancy
    index; only multipoints loop.
    """
    first = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[gids]]]
    last = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[gids + 1]]]
    ncoords = last - first
    single = ncoords == 1
    owners_s = np.flatnonzero(single)
    px_s = batch.coords[first[single], 0]
    py_s = batch.coords[first[single], 1]
    if single.all():
        return owners_s, px_s, py_s
    owners, xs, ys = [owners_s], [px_s], [py_s]
    for j in np.flatnonzero(~single):
        pts = _geom_points(batch, int(gids[j]))
        if len(pts):
            owners.append(np.full(len(pts), j))
            xs.append(pts[:, 0])
            ys.append(pts[:, 1])
    return (np.concatenate(owners), np.concatenate(xs), np.concatenate(ys))


def _points_equal_any(px, py, pts) -> np.ndarray:
    dx = np.abs(px[:, None] - pts[None, :, 0])
    dy = np.abs(py[:, None] - pts[None, :, 1])
    return np.any((dx <= _EPS) & (dy <= _EPS), axis=1)


def pairs_distance(lb: GeomBatch, rb: GeomBatch,
                   li: np.ndarray, ri: np.ndarray) -> np.ndarray:
    """Exact euclidean distance per candidate pair (0 if intersecting).

    Non-intersecting geometries attain their min distance at a vertex
    of one side vs an edge (or vertex) of the other, so the kernel is
    exact: min over (left vertices x right edges) and (right vertices
    x left edges), vectorized per right-geometry group like
    :func:`pairs_intersect`.
    """
    m = len(li)
    out = np.full(m, np.inf)
    if m == 0:
        return out

    # ---- closed-form: single-point left x axis-rect right -------------
    okv = lb.valid[li] & rb.valid[ri]
    lpt = _is_single_point(lb)
    rbounds = rb.bounds()
    rrect = is_axis_rect(rb, rbounds)
    fast = okv & lpt[li] & rrect[ri]
    if fast.any():
        fl, fr = li[fast], ri[fast]
        cidx = lb.ring_coord_off[lb.part_ring_off[lb.geom_part_off[fl]]]
        px, py = lb.coords[cidx, 0], lb.coords[cidx, 1]
        dx = np.maximum(np.maximum(rbounds[fr, 0] - px, px - rbounds[fr, 2]), 0)
        dy = np.maximum(np.maximum(rbounds[fr, 1] - py, py - rbounds[fr, 3]), 0)
        out[fast] = np.sqrt(dx * dx + dy * dy)
    if fast.all():
        return out
    sub = np.flatnonzero(~fast)
    li, ri = li[sub], ri[sub]
    subout = np.full(len(sub), np.inf)

    inter = pairs_intersect(lb, rb, li, ri)
    subout[inter] = 0.0
    ok = lb.valid[li] & rb.valid[ri] & ~inter
    order = np.argsort(ri, kind="stable")
    group_starts = np.flatnonzero(np.concatenate(
        ([True], ri[order][1:] != ri[order][:-1])))
    group_stops = np.concatenate((group_starts[1:], [len(sub)]))
    for gs, ge in zip(group_starts, group_stops):
        sel = order[gs:ge]
        sel = sel[ok[sel]]
        if len(sel) == 0:
            continue
        r = int(ri[sel[0]])
        lids = li[sel]
        r_edges = _geom_edges(rb, r)
        r_pts = _geom_points(rb, r)
        # all left vertices with owner map
        owners, px, py = _gather_points_all(lb, lids)
        best = np.full(len(sel), np.inf)
        if len(r_edges) and len(px):
            d = _point_seg_min_per_point(px, py, r_edges)
            np.minimum.at(best, owners, d)
        elif len(r_pts) and len(px):
            d2 = (px[:, None] - r_pts[None, :, 0]) ** 2 + \
                 (py[:, None] - r_pts[None, :, 1]) ** 2
            np.minimum.at(best, owners, np.sqrt(d2.min(axis=1)))
        # right vertices vs left edges
        ex0, ey0, ex1, ey1, eowner = _flat_edges(lb, lids)
        if len(ex0) and len(r_pts):
            for pi in range(len(r_pts)):
                d = _point_to_segs(r_pts[pi, 0], r_pts[pi, 1],
                                   ex0, ey0, ex1, ey1)
                np.minimum.at(best, eowner, d)
        subout[sel] = best
    out[sub] = subout
    return out


def _gather_points_all(batch: GeomBatch, gids: np.ndarray):
    """ALL vertices of the given geometries (any kind), with owners."""
    first = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[gids]]]
    last = batch.ring_coord_off[batch.part_ring_off[batch.geom_part_off[gids + 1]]]
    lens = last - first
    from cdap_geo_spark.core.wkb import _expand_ranges
    idx = _expand_ranges(first, last)
    owners = np.repeat(np.arange(len(gids)), lens)
    return owners, batch.coords[idx, 0], batch.coords[idx, 1]


def _point_seg_min_per_point(px, py, segs) -> np.ndarray:
    """(k,) min distance of each point to any segment, chunked."""
    k = len(px)
    out = np.full(k, np.inf)
    step = max(1, _EDGE_CHUNK // max(len(segs), 1))
    x0, y0 = segs[:, 0][None, :], segs[:, 1][None, :]
    x1, y1 = segs[:, 2][None, :], segs[:, 3][None, :]
    dx, dy = x1 - x0, y1 - y0
    len2 = dx * dx + dy * dy
    safe = np.where(len2 == 0, 1, len2)
    for s in range(0, k, step):
        PX, PY = px[s:s + step][:, None], py[s:s + step][:, None]
        t = np.clip(((PX - x0) * dx + (PY - y0) * dy) / safe, 0.0, 1.0)
        cx, cy = x0 + t * dx, y0 + t * dy
        d2 = (PX - cx) ** 2 + (PY - cy) ** 2
        out[s:s + step] = np.sqrt(d2.min(axis=1))
    return out


def _point_to_segs(px: float, py: float, x0, y0, x1, y1) -> np.ndarray:
    """(E,) distance of one point to each segment."""
    dx, dy = x1 - x0, y1 - y0
    len2 = dx * dx + dy * dy
    safe = np.where(len2 == 0, 1, len2)
    t = np.clip(((px - x0) * dx + (py - y0) * dy) / safe, 0.0, 1.0)
    cx, cy = x0 + t * dx, y0 + t * dy
    return np.sqrt((px - cx) ** 2 + (py - cy) ** 2)


def _min_point_seg(pts: np.ndarray, segs: np.ndarray) -> float:
    px, py = pts[:, 0][:, None], pts[:, 1][:, None]
    x0, y0 = segs[:, 0][None, :], segs[:, 1][None, :]
    x1, y1 = segs[:, 2][None, :], segs[:, 3][None, :]
    dx, dy = x1 - x0, y1 - y0
    len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip(((px - x0) * dx + (py - y0) * dy) / np.where(len2 == 0, 1, len2),
                    0.0, 1.0)
    cx, cy = x0 + t * dx, y0 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    return float(np.sqrt(d2.min()))


def _geom_polygon_rings_signed(batch: GeomBatch, g: int):
    """Rings of all polygon parts of geometry g as (ring, sign) pairs:
    ring 0 of each part is the exterior (+1), later rings are holes
    (-1) — WKB ring-order semantics, tracked PER PART (a flattened list
    would mis-sign the exterior rings of later MultiPolygon parts)."""
    rings = []
    for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
        if batch.part_kind[p] != KIND_POLYGON:
            continue
        r0 = batch.part_ring_off[p]
        for ri in range(r0, batch.part_ring_off[p + 1]):
            s, e = batch.ring_coord_off[ri], batch.ring_coord_off[ri + 1]
            if e - s >= 4:
                rings.append((batch.coords[s:e], 1.0 if ri == r0 else -1.0))
    return rings


def _dedupe_ring(ring: np.ndarray) -> np.ndarray:
    """Open vertex list of a closed ring, consecutive dups dropped."""
    pts = ring[:-1]
    if len(pts) == 0:
        return pts
    keep = np.ones(len(pts), bool)
    keep[1:] = np.any(pts[1:] != pts[:-1], axis=1)
    pts = pts[keep]
    if len(pts) >= 2 and pts[0][0] == pts[-1][0] and pts[0][1] == pts[-1][1]:
        pts = pts[:-1]
    return pts


def _is_convex_ccw(pts: np.ndarray) -> bool:
    """True iff the open CCW vertex list is convex (collinear ok)."""
    a = pts
    b = np.roll(pts, -1, axis=0)
    c = np.roll(pts, -2, axis=0)
    cross = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
             - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    return bool(np.all(cross >= -_EPS))


def _ear_triangulate(pts: np.ndarray) -> list:
    """Ear-clipping triangulation of a simple open CCW ring ->
    list of (3,2) triangles. O(n^2); per-row kernel scale is fine."""
    idx = list(range(len(pts)))
    tris = []
    while len(idx) > 3:
        n = len(idx)
        clipped = False
        for t in range(n):
            i0, i1, i2 = idx[t - 1], idx[t], idx[(t + 1) % n]
            ax, ay = pts[i0]
            bx, by = pts[i1]
            cx, cy = pts[i2]
            cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            if cross <= _EPS:  # reflex or degenerate: not an ear yet
                continue
            # no other ring vertex strictly inside the candidate ear
            others = [i for i in idx if i not in (i0, i1, i2)]
            op = pts[others]
            d0 = (bx - ax) * (op[:, 1] - ay) - (by - ay) * (op[:, 0] - ax)
            d1 = (cx - bx) * (op[:, 1] - by) - (cy - by) * (op[:, 0] - bx)
            d2 = (ax - cx) * (op[:, 1] - cy) - (ay - cy) * (op[:, 0] - cx)
            if np.any((d0 > _EPS) & (d1 > _EPS) & (d2 > _EPS)):
                continue
            tris.append(pts[[i0, i1, i2]])
            del idx[t]
            clipped = True
            break
        if not clipped:
            # numerically stuck (near-degenerate ring): drop the most
            # degenerate vertex and continue — area error is O(eps)
            n = len(idx)
            best, best_abs = 0, np.inf
            for t in range(n):
                i0, i1, i2 = idx[t - 1], idx[t], idx[(t + 1) % n]
                ax, ay = pts[i0]
                bx, by = pts[i1]
                cx, cy = pts[i2]
                cr = abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
                if cr < best_abs:
                    best, best_abs = t, cr
            del idx[best]
    if len(idx) == 3:
        tris.append(pts[idx])
    return tris


def _convex_cells(ring: np.ndarray) -> list:
    """Closed ring -> list of OPEN convex CCW vertex arrays covering its
    region exactly: the ring itself when convex, else ear triangles."""
    pts = _dedupe_ring(ring)
    if len(pts) < 3:
        return []
    x, y = pts[:, 0], pts[:, 1]
    if 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        pts = pts[::-1]
    if _is_convex_ccw(pts):
        return [pts]
    return [t for t in _ear_triangulate(pts)
            if abs(_tri_area2(t)) > 0.0]


def _tri_area2(t: np.ndarray) -> float:
    return ((t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1])
            - (t[1, 1] - t[0, 1]) * (t[2, 0] - t[0, 0]))


def _signed_convex_cover(batch: GeomBatch, g: int) -> list:
    """Geometry -> list of (open convex CCW cell, sign, bbox): the
    signed indicator 1_geom = sum(sign * 1_cell) pointwise a.e. for
    valid polygons (exterior cells +1, hole cells -1)."""
    cells = []
    for ring, sign in _geom_polygon_rings_signed(batch, g):
        for cell in _convex_cells(ring):
            bb = (cell[:, 0].min(), cell[:, 1].min(),
                  cell[:, 0].max(), cell[:, 1].max())
            cells.append((cell, sign, bb))
    return cells


def _convex_pair_area(a: np.ndarray, b: np.ndarray) -> float:
    """|a ∩ b| for two open convex CCW vertex lists (Sutherland–Hodgman,
    exact for convex⊗convex)."""
    return _clip_area(np.vstack([a, a[:1]]), np.vstack([b, b[:1]]))


def pairs_intersection_area(lb: GeomBatch, rb: GeomBatch,
                            li: np.ndarray, ri: np.ndarray) -> np.ndarray:
    """Area of intersection per pair — GENERAL: both sides may be
    non-convex (Multi)Polygons with holes (the reference clips arbitrary
    shapely geometries, ``cdap_geo/functions.py:37-39``).

    Each side is decomposed into signed convex cells (convex rings stay
    whole; concave rings are ear-triangulated; holes get sign -1), then
    area(L ∩ R) = sum over cell pairs of sign_l*sign_r*|cell_l ∩ cell_r|
    — exact for valid inputs because the signed indicators multiply
    pointwise. Cell pairs are bbox-pruned. Per-geometry covers are
    cached across the pair batch (grouped-kernel convention, module
    docstring)."""
    m = len(li)
    out = np.zeros(m)
    # axis-rect ⊗ axis-rect fast path: the overlap is the bbox overlap
    # (closed form, one vectorized pass) — measured ~1 ms/pair through
    # the generic convex-decomposition loop vs ~ns here; rectangles
    # dominate real region tables
    lrect = is_axis_rect(lb)
    rrect = is_axis_rect(rb)
    fast = lrect[li] & rrect[ri] & lb.valid[li] & rb.valid[ri]
    if fast.any():
        lbnd = lb.bounds()[li[fast]]
        rbnd = rb.bounds()[ri[fast]]
        w = np.minimum(lbnd[:, 2], rbnd[:, 2]) \
            - np.maximum(lbnd[:, 0], rbnd[:, 0])
        h = np.minimum(lbnd[:, 3], rbnd[:, 3]) \
            - np.maximum(lbnd[:, 1], rbnd[:, 1])
        out[fast] = np.maximum(w, 0.0) * np.maximum(h, 0.0)
    lcache: dict = {}
    rcache: dict = {}
    for j in np.flatnonzero(~fast):
        lg, rg = int(li[j]), int(ri[j])
        if not (lb.valid[lg] and rb.valid[rg]):
            continue
        if lg not in lcache:
            lcache[lg] = _signed_convex_cover(lb, lg)
        if rg not in rcache:
            rcache[rg] = _signed_convex_cover(rb, rg)
        total = 0.0
        for ca, sa, ba in lcache[lg]:
            for cb, sb, bb2 in rcache[rg]:
                if (ba[0] > bb2[2] or ba[2] < bb2[0]
                        or ba[1] > bb2[3] or ba[3] < bb2[1]):
                    continue
                total += sa * sb * _convex_pair_area(ca, cb)
        out[j] = max(total, 0.0)
    return out


def _clip_ring(subject: np.ndarray, clip: np.ndarray):
    """Sutherland–Hodgman clip of `subject` ring by convex `clip` ring;
    returns the clipped polygon's (k,2) vertices (open) or None."""
    # ensure clip is CCW for the inside test
    cx, cy = clip[:-1, 0], clip[:-1, 1]
    if 0.5 * np.sum(cx * np.roll(cy, -1) - np.roll(cx, -1) * cy) < 0:
        clip = clip[::-1]
    poly = subject[:-1].tolist()
    cpts = clip[:-1]
    nc = len(cpts)
    for i in range(nc):
        if not poly:
            return None
        ax, ay = cpts[i]
        bx, by = cpts[(i + 1) % nc]
        out_pts = []
        prev = poly[-1]
        prev_in = (bx - ax) * (prev[1] - ay) - (by - ay) * (prev[0] - ax) >= -_EPS
        for cur in poly:
            cur_in = (bx - ax) * (cur[1] - ay) - (by - ay) * (cur[0] - ax) >= -_EPS
            if cur_in:
                if not prev_in:
                    out_pts.append(_line_inter(prev, cur, (ax, ay), (bx, by)))
                out_pts.append(list(cur))
            elif prev_in:
                out_pts.append(_line_inter(prev, cur, (ax, ay), (bx, by)))
            prev, prev_in = cur, cur_in
        poly = out_pts
    if len(poly) < 3:
        return None
    return np.asarray(poly)


def _clip_area(subject: np.ndarray, clip: np.ndarray) -> float:
    """|area| of the Sutherland–Hodgman clip (see :func:`_clip_ring`)."""
    arr = _clip_ring(subject, clip)
    if arr is None:
        return 0.0
    x, y = arr[:, 0], arr[:, 1]
    return abs(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _line_inter(p, q, a, b):
    px, py = p
    qx, qy = q
    ax, ay = a
    bx, by = b
    d1 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    d2 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    t = d1 / (d1 - d2) if d1 != d2 else 0.0
    return [px + t * (qx - px), py + t * (qy - py)]


# ---------------------------------------------------------------------------
# Constructive union — vertical slab (trapezoid) decomposition
# ---------------------------------------------------------------------------
# A point is in the union iff it is inside >=1 member polygon; each
# member fills by even-odd over its own rings (exterior + holes). The
# classic vertical decomposition makes this exactly computable with
# array ops: cut the plane at every vertex x and every pairwise edge
# crossing x; inside one open slab no two edges cross, so the covered
# region is a y-interval union whose ends are edges — i.e. trapezoids.
# Exact union AREA falls out for free; the constructive geometry is the
# horizontal merge of trapezoid runs (valid, possibly with collinear
# seam vertices — same caveat GEOS documents for its snap-rounded
# overlay). The reference gets all of this from shapely's
# ``unary_union`` (``cdap_geo/functions.py:16-27``); this is the
# from-scratch equivalent used by dissolve / buffer / make_valid.

def _union_edges(polys: list) -> tuple:
    """Flatten member polygons (list of lists of closed rings) into
    non-vertical edge arrays oriented x0 < x1, + poly ids."""
    x0s, y0s, x1s, y1s, pids = [], [], [], [], []
    for pid, rings in enumerate(polys):
        for ring in rings:
            pts = np.asarray(ring, float)
            if len(pts) < 4:
                continue
            ax, ay = pts[:-1, 0], pts[:-1, 1]
            bx, by = pts[1:, 0], pts[1:, 1]
            keep = ax != bx
            if not keep.any():
                continue
            ax, ay, bx, by = ax[keep], ay[keep], bx[keep], by[keep]
            flip = ax > bx
            ax2 = np.where(flip, bx, ax)
            bx2 = np.where(flip, ax, bx)
            ay2 = np.where(flip, by, ay)
            by2 = np.where(flip, ay, by)
            x0s.append(ax2)
            y0s.append(ay2)
            x1s.append(bx2)
            y1s.append(by2)
            pids.append(np.full(len(ax2), pid))
    if not x0s:
        z = np.empty(0)
        return z, z, z, z, np.empty(0, np.int64)
    return (np.concatenate(x0s), np.concatenate(y0s),
            np.concatenate(x1s), np.concatenate(y1s),
            np.concatenate(pids).astype(np.int64))


def _crossing_xs(x0, y0, x1, y1, chunk: int = 512) -> np.ndarray:
    """x-coordinates of all pairwise proper edge crossings (interior
    overlap in x AND straddling in y). O(E^2) pair tests, vectorized
    and chunked; per-group kernel scale (dissolve keys, one buffer's
    components), never a dataset-wide loop."""
    e = len(x0)
    out = []
    dx = x1 - x0
    dy = y1 - y0
    for s in range(0, e, chunk):
        t = slice(s, min(e, s + chunk))
        # candidate pairs: x-intervals overlap with nonzero interior
        lo = np.maximum(x0[t][:, None], x0[None, :])
        hi = np.minimum(x1[t][:, None], x1[None, :])
        ii, jj = np.nonzero(lo < hi)
        if len(ii) == 0:
            continue
        ii = ii + s
        keep = ii < jj
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            continue
        # line crossing: solve for intersection of supporting lines
        den = dx[ii] * dy[jj] - dy[ii] * dx[jj]
        ok = den != 0
        ii, jj, den = ii[ok], jj[ok], den[ok]
        if len(ii) == 0:
            continue
        tt = ((x0[jj] - x0[ii]) * dy[jj] - (y0[jj] - y0[ii]) * dx[jj]) / den
        xc = x0[ii] + tt * dx[ii]
        inside = (xc > np.maximum(x0[ii], x0[jj])) \
            & (xc < np.minimum(x1[ii], x1[jj]))
        out.append(xc[inside])
    return np.concatenate(out) if out else np.empty(0)


def union_trapezoids(polys: list) -> tuple:
    """Union of member polygons -> (quads, area).

    ``polys``: list of members, each a list of closed (k,2) rings
    filling even-odd. Returns ``(list of (4,2) CCW trapezoid vertex
    arrays, exact union area)``. The trapezoids tile the union region
    exactly (disjoint interiors); adjacent slabs bounded by the same
    edge pair are merged into maximal runs.
    """
    x0, y0, x1, y1, pid = _union_edges(polys)
    if len(x0) == 0:
        return [], 0.0
    xs = np.unique(np.concatenate([x0, x1, _crossing_xs(x0, y0, x1, y1)]))
    if len(xs) < 2:
        return [], 0.0
    # edge e spans slabs [searchsorted(x0e) .. searchsorted(x1e)-1]
    i0 = np.searchsorted(xs, x0)
    i1 = np.searchsorted(xs, x1)
    span = i1 - i0
    reps = np.repeat(np.arange(len(x0)), span)           # edge id per inst
    slab = np.repeat(i0, span) + _expand_offsets(span)   # slab id per inst
    xl, xr = xs[slab], xs[slab + 1]
    tpar = np.where(x1[reps] != x0[reps],
                    1.0 / (x1[reps] - x0[reps]), 0.0)
    yl = y0[reps] + (xl - x0[reps]) * tpar * (y1[reps] - y0[reps])
    yr = y0[reps] + (xr - x0[reps]) * tpar * (y1[reps] - y0[reps])
    ym = yl + yr
    ip = pid[reps]
    # sort by (slab, poly, ymid): within (slab, poly) instances
    # alternate even-odd -> consecutive pairs bound covered intervals
    order = np.lexsort((yl, ym, ip, slab))
    slab, ip, yl, yr, ym = (a[order] for a in (slab, ip, yl, yr, ym))
    eid = reps[order]
    grp_new = np.ones(len(slab), bool)
    grp_new[1:] = (slab[1:] != slab[:-1]) | (ip[1:] != ip[:-1])
    rank = np.arange(len(slab)) - np.maximum.accumulate(
        np.where(grp_new, np.arange(len(slab)), -1))
    # an interval = an even-rank instance paired with the NEXT instance
    # of the same group; a trailing unpaired lower (odd group size =
    # degenerate ring) is dropped by the ~group-end condition
    grp_end = np.append(grp_new[1:], True)
    lo_idx = np.nonzero(((rank % 2) == 0) & ~grp_end)[0]
    hi_idx = lo_idx + 1
    if len(lo_idx) == 0:
        return [], 0.0
    # per-interval data (still per (slab, poly)); now union across polys
    s_l = slab[lo_idx]
    b_yl, b_yr, b_ym, b_eid = yl[lo_idx], yr[lo_idx], ym[lo_idx], eid[lo_idx]
    t_yl, t_yr, t_ym, t_eid = yl[hi_idx], yr[hi_idx], ym[hi_idx], eid[hi_idx]
    o2 = np.lexsort((b_ym, s_l))
    s_l, b_yl, b_yr, b_ym, b_eid, t_yl, t_yr, t_ym, t_eid = (
        a[o2] for a in (s_l, b_yl, b_yr, b_ym, b_eid,
                        t_yl, t_yr, t_ym, t_eid))
    # union-merge intervals within each slab: tight python sweep (the
    # sweep state — which edge currently bounds the top — defeats a
    # clean vectorization; counts here are per-group-kernel small)
    quads = []
    area_sum = 0.0
    i = 0
    n = len(s_l)
    # merged intervals per slab -> (slab, bot edge data, top edge data)
    merged = []  # (slab, b_eid, t_eid, byl, byr, tyl, tyr)
    while i < n:
        j = i
        cur_t_ym = t_ym[i]
        cur = [s_l[i], b_eid[i], t_eid[i], b_yl[i], b_yr[i],
               t_yl[i], t_yr[i]]
        j += 1
        while j < n and s_l[j] == s_l[i] and b_ym[j] <= cur_t_ym:
            if t_ym[j] > cur_t_ym:
                cur_t_ym = t_ym[j]
                cur[2], cur[5], cur[6] = t_eid[j], t_yl[j], t_yr[j]
            j += 1
        merged.append(cur)
        i = j
    if not merged:
        return [], 0.0
    m = np.array([[c[0], c[1], c[2]] for c in merged], np.int64)
    my = np.array([[c[3], c[4], c[5], c[6]] for c in merged])
    # horizontal merge: runs of consecutive slabs with same (bot, top)
    o3 = np.lexsort((m[:, 0], m[:, 2], m[:, 1]))
    m, my = m[o3], my[o3]
    brk = np.ones(len(m), bool)
    brk[1:] = (m[1:, 1] != m[:-1, 1]) | (m[1:, 2] != m[:-1, 2]) \
        | (m[1:, 0] != m[:-1, 0] + 1)
    run_id = np.cumsum(brk) - 1
    for r in range(run_id[-1] + 1):
        sel = np.nonzero(run_id == r)[0]
        first, last = sel[0], sel[-1]
        xlq, xrq = xs[m[first, 0]], xs[m[last, 0] + 1]
        byl, tyl = my[first, 0], my[first, 2]
        byr, tyr = my[last, 1], my[last, 3]
        if xrq <= xlq:
            continue
        a = 0.5 * (xrq - xlq) * ((tyl - byl) + (tyr - byr))
        if a <= 0:
            continue
        area_sum += a
        quads.append(np.array([[xlq, byl], [xrq, byr],
                               [xrq, tyr], [xlq, tyl]]))
    return quads, area_sum


def _expand_offsets(counts: np.ndarray) -> np.ndarray:
    """[2,0,3] -> [0,1,0,1,2] (within-group arange)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    idx = np.arange(total)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return idx - starts


def polygon_members(batch: GeomBatch, g: int) -> list:
    """Polygon parts of geometry g as union-kernel members: one list
    of closed rings (exterior + holes, even-odd fill) per part."""
    members = []
    for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
        if batch.part_kind[p] != KIND_POLYGON:
            continue
        rings = []
        for ri in range(batch.part_ring_off[p], batch.part_ring_off[p + 1]):
            s, e = batch.ring_coord_off[ri], batch.ring_coord_off[ri + 1]
            if e - s >= 4:
                rings.append(batch.coords[s:e])
        if rings:
            members.append(rings)
    return members
