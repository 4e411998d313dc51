"""Arrow-vectorized pandas UDF factories over the NumPy kernels.

This is the ONLY place geometry bytes cross the JVM<->Python boundary,
always as Arrow batches (engine contract: no per-row Python — the
reference's 11 per-row ``F.udf`` sites, SURVEY.md §2.10, all collapse
into these factories). Parameterized UDFs follow the reference's
currying pattern (closure captures level/how/resolution,
``cdap_geo/functions.py:20-24``).

Pair predicates factorize the right-hand Series first
(``pd.factorize`` on the raw WKB bytes) so each distinct geometry is
parsed once per batch and its edge tables are reused across all its
pairs — the Arrow-batch analogue of shapely prepared geometries
(``cdap_geo/_indexing.py:253-254``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T
from pyspark.sql.functions import pandas_udf

from cdap_geo_spark.core import cells as C, geom as G, wkb as W


def _warm_pages_once() -> None:
    """Touch a heap arena once per python worker process.

    In this sandbox first-touch page faults are ~1000x slower than
    warm pages (microVM lazy backing). With MALLOC_TRIM_THRESHOLD_=-1
    (set by session._tune_malloc_env and inherited by workers) the
    freed arena stays in the process heap, so all subsequent NumPy /
    Arrow allocations reuse warm pages. No-op outside such
    environments (costs one memset of CDAP_GEO_WARM_MB).
    """
    mb = int(os.environ.get("CDAP_GEO_WARM_MB", "0") or 0)
    if mb > 0 and not getattr(_warm_pages_once, "_done", False):
        arena = np.empty(mb * 131072, np.float64)  # mb MiB
        arena[:] = 1.0
        del arena
        _warm_pages_once._done = True


_warm_pages_once()

BOUNDS_FIELDS = [
    T.StructField("minx", T.DoubleType()),
    T.StructField("miny", T.DoubleType()),
    T.StructField("maxx", T.DoubleType()),
    T.StructField("maxy", T.DoubleType()),
]
BOUNDS_TYPE = T.StructType(BOUNDS_FIELDS)

INDEX_TYPE = T.StructType(BOUNDS_FIELDS + [
    T.StructField("cells", T.ArrayType(T.LongType())),
    T.StructField("inside", T.ArrayType(T.BooleanType())),
])


def _to_blob_list(s: pd.Series) -> list:
    return [None if v is None else bytes(v) for v in s]


# ---------------------------------------------------------------------------
# Decode / bounds / index
# ---------------------------------------------------------------------------

def st_bounds():
    """binary WKB -> struct<minx,miny,maxx,maxy> (null geometry -> nulls).

    Reference: ``bounds`` UDF + array indexing, ``cdap_geo/functions.py:26-28``,
    ``cdap_geo/index_bbox.py:6-13`` — named struct fields instead of
    positional array access.
    """
    @pandas_udf(BOUNDS_TYPE)
    def _bounds(s: pd.Series) -> pd.DataFrame:
        b = W.parse_wkb(_to_blob_list(s)).bounds()
        return pd.DataFrame(b, columns=["minx", "miny", "maxx", "maxy"])
    return _bounds


def st_index(level: int, how: str = "bbox", pad: float = 1.0,
             dilate: float = 0.0):
    """binary WKB -> struct<minx..maxy, cells:array<long>, inside:array<bool>>.

    One fused decode: bounds + hierarchical cell cover + interior flags
    (the reference computes these in three separate per-row UDF passes:
    ``cdap_geo/index_bbox.py:8,15-30``; ``cdap_geo/_indexing.py:290-304``).
    ``dilate`` expands the cover for distance-join candidates.
    """
    @pandas_udf(INDEX_TYPE)
    def _index(s: pd.Series) -> pd.DataFrame:
        batch = W.parse_wkb(_to_blob_list(s))
        b = batch.bounds()
        off, cc, inside = C.cover_batch(batch, level, how=how, pad=pad,
                                        dilate=dilate)
        out = pd.DataFrame(b, columns=["minx", "miny", "maxx", "maxy"])
        out["cells"] = [cc[off[i]:off[i + 1]] for i in range(len(batch))]
        out["inside"] = [inside[off[i]:off[i + 1]] for i in range(len(batch))]
        return out
    return _index


def st_cells(level: int, how: str = "bbox", pad: float = 1.0):
    """binary WKB -> array<long> cell cover only."""
    @pandas_udf(T.ArrayType(T.LongType()))
    def _cells(s: pd.Series) -> pd.Series:
        batch = W.parse_wkb(_to_blob_list(s))
        off, cc, _ = C.cover_batch(batch, level, how=how, pad=pad)
        return pd.Series([cc[off[i]:off[i + 1]] for i in range(len(batch))])
    return _cells


def st_cell_point(level: int):
    """binary WKB point -> single int64 cell id (no straddle; for
    storage layout / range partitioning keys). Null for invalid."""
    @pandas_udf(T.LongType())
    def _cell(s: pd.Series) -> pd.Series:
        batch = W.parse_wkb(_to_blob_list(s))
        b = batch.bounds()
        cs = C.cell_size(level)
        with np.errstate(invalid="ignore"):
            xi = np.floor((b[:, 0] - C.WORLD_X0) / cs)
            yi = np.floor((b[:, 1] - C.WORLD_Y0) / cs)
        bad = np.isnan(xi) | np.isnan(yi)
        ids = C.encode(level, np.nan_to_num(xi).astype(np.int64),
                       np.nan_to_num(yi).astype(np.int64)).astype(object)
        out = pd.Series(ids)
        out[bad] = None
        return out
    return _cell


# ---------------------------------------------------------------------------
# Scalar geometry functions
# ---------------------------------------------------------------------------

def st_area():
    """binary -> double (``cdap_geo/functions.py:12-14``, float->double)."""
    @pandas_udf(T.DoubleType())
    def _area(s: pd.Series) -> pd.Series:
        return pd.Series(G.area(W.parse_wkb(_to_blob_list(s))))
    return _area


def st_length():
    """binary -> double boundary length (polygon perimeter incl. holes,
    line length, point 0 — PostGIS ``ST_Perimeter``/``ST_Length``
    semantics; the reference reads ``shapely .length`` on flattened
    parts). Vectorized batch kernel, no per-row Python."""
    @pandas_udf(T.DoubleType())
    def _len(s: pd.Series) -> pd.Series:
        return pd.Series(G.length(W.parse_wkb(_to_blob_list(s))))
    return _len


def st_num_points():
    """binary -> long vertex count (``cdap_geo/misc.py:30-32``) — the
    engine's skew/cost signal."""
    @pandas_udf(T.LongType())
    def _n(s: pd.Series) -> pd.Series:
        return pd.Series(G.vertex_counts(W.parse_wkb(_to_blob_list(s))))
    return _n


def st_is_valid():
    @pandas_udf(T.BooleanType())
    def _v(s: pd.Series) -> pd.Series:
        return pd.Series(W.parse_wkb(_to_blob_list(s)).valid)
    return _v


def st_point():
    """(x: double, y: double) -> binary WKB point (vectorized emit)."""
    @pandas_udf(T.BinaryType())
    def _pt(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(W.points_to_wkb(x.to_numpy(np.float64),
                                         y.to_numpy(np.float64)))
    return _pt


def st_box():
    """(minx,miny,maxx,maxy) -> binary WKB box polygon."""
    @pandas_udf(T.BinaryType())
    def _box(minx: pd.Series, miny: pd.Series,
             maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        return pd.Series(W.boxes_to_wkb(minx.to_numpy(np.float64),
                                        miny.to_numpy(np.float64),
                                        maxx.to_numpy(np.float64),
                                        maxy.to_numpy(np.float64)))
    return _box


def st_centroid():
    """binary -> binary WKB centroid point (highest-dimension rule:
    polygon area-weighted / line length-weighted / point mean — see
    :func:`cdap_geo_spark.core.geom.centroid`). NULL/empty -> NULL.
    The recommended pointifier for feeding extended geometries into
    point-mode ``knn_join``."""
    @pandas_udf(T.BinaryType())
    def _cent(s: pd.Series) -> pd.Series:
        c = G.centroid(W.parse_wkb(_to_blob_list(s)))
        bad = np.isnan(c[:, 0])
        blobs = W.points_to_wkb(np.nan_to_num(c[:, 0]),
                                np.nan_to_num(c[:, 1]))
        out = pd.Series(blobs)
        out[bad] = None
        return out
    return _cent


def st_centroid_xy():
    """binary -> struct<x: double, y: double> centroid coordinates
    (same kernel as :func:`st_centroid`, no re-encode)."""
    out_t = T.StructType([T.StructField("x", T.DoubleType()),
                          T.StructField("y", T.DoubleType())])

    @pandas_udf(out_t)
    def _cent(s: pd.Series) -> pd.DataFrame:
        c = G.centroid(W.parse_wkb(_to_blob_list(s)))
        return pd.DataFrame({"x": c[:, 0], "y": c[:, 1]})
    return _cent


# ---------------------------------------------------------------------------
# Pair predicates (the refinement pass)
# ---------------------------------------------------------------------------

def _pair_kernel(kernel, out_dtype):
    """Factorize BOTH sides: candidates repeat each doc ~once per
    overlapping region and each region across many docs, so parsing
    unique blobs only cuts WKB decode work by the duplication factor."""
    prof = os.environ.get("CDAP_GEO_PROF")

    def run(l: pd.Series, r: pd.Series) -> np.ndarray:
        import time as _time
        t0 = _time.perf_counter()
        lcodes, lunique = pd.factorize(l, use_na_sentinel=True)
        rcodes, runique = pd.factorize(r, use_na_sentinel=True)
        t1 = _time.perf_counter()
        lb = W.parse_wkb(_to_blob_list(pd.Series(lunique)))
        rb = W.parse_wkb(_to_blob_list(pd.Series(runique)))
        t2 = _time.perf_counter()
        n = len(l)
        li = lcodes.astype(np.int64)
        ri = rcodes.astype(np.int64)
        valid_pair = (ri >= 0) & (li >= 0)
        out = np.zeros(n, out_dtype)
        if valid_pair.any():
            # Cache-sized kernel slices, NOT whole-batch: a 64k-pair
            # gather touches tens of MB (coords + edge tables + masks);
            # at 32 concurrent workers that working set thrashes the
            # shared LLC and the per-pair cost exploded 13x (measured
            # 313 us/pair vs 23 us/pair at 2 workers, BENCH/BASELINE.md).
            # 2k-pair slices keep each worker's active set ~L2-sized:
            # same-window A/B at sf0.1/local[32] cut the refine stage
            # 110 s -> 24-44 s and per-pair kernel CPU 313 -> 29 us,
            # and even the 2-worker run improved (117.8 -> 89.9 s).
            # Arrow batches stay large (65536) — IPC amortization and
            # cache behavior are decoupled by slicing HERE.
            vi = np.flatnonzero(valid_pair)
            chunk = int(os.environ.get("CDAP_GEO_KERNEL_CHUNK", "2048"))
            if chunk <= 0:
                chunk = len(vi)
            for s in range(0, len(vi), chunk):
                sl = vi[s:s + chunk]
                out[sl] = kernel(lb, rb, li[sl], ri[sl])
        if prof:
            t3 = _time.perf_counter()
            with open(f"{prof}.{os.getpid()}", "a") as f:
                f.write(f"{n} {len(lunique)} {len(runique)} "
                        f"{t1 - t0:.4f} {t2 - t1:.4f} {t3 - t2:.4f}\n")
        return out
    return run


def st_intersects():
    """(l_wkb, r_wkb) -> bool exact intersects — the refinement predicate
    (``cdap_geo/functions.py:72-78``; boundary touch counts)."""
    run = _pair_kernel(G.pairs_intersect, bool)

    @pandas_udf(T.BooleanType())
    def _its(l: pd.Series, r: pd.Series) -> pd.Series:
        return pd.Series(run(l, r))
    return _its


def st_distance():
    """(l_wkb, r_wkb) -> double euclidean distance (0 when intersecting;
    the ``st_join(distance=d)`` refinement predicate,
    ``cdap_geo/sedona.py:136-141``)."""
    run = _pair_kernel(G.pairs_distance, np.float64)

    @pandas_udf(T.DoubleType())
    def _dist(l: pd.Series, r: pd.Series) -> pd.Series:
        return pd.Series(run(l, r))
    return _dist


def st_intersection_area():
    """(l_wkb, r_wkb) -> double area of overlap, fused in one kernel like
    the reference's ``intersection_area`` (``cdap_geo/functions.py:37-39``,
    README.md:27). v1: right side must be a convex polygon/box."""
    run = _pair_kernel(G.pairs_intersection_area, np.float64)

    @pandas_udf(T.DoubleType())
    def _ia(l: pd.Series, r: pd.Series) -> pd.Series:
        return pd.Series(run(l, r))
    return _ia


def st_point_distance():
    """Fast path: (lx, ly, rx, ry) -> double, fully numeric, no WKB."""
    @pandas_udf(T.DoubleType())
    def _d(lx: pd.Series, ly: pd.Series, rx: pd.Series, ry: pd.Series) -> pd.Series:
        dx = lx.to_numpy(np.float64) - rx.to_numpy(np.float64)
        dy = ly.to_numpy(np.float64) - ry.to_numpy(np.float64)
        return pd.Series(np.sqrt(dx * dx + dy * dy))
    return _d


# ---------------------------------------------------------------------------
# kNN support
# ---------------------------------------------------------------------------

def st_ring_cells(level: int):
    """(x, y, lo:int, hi:int) -> array<long> cells whose Chebyshev
    distance from the point's cell lies in [lo, hi] — the annulus
    probe for geometric cell-ring expansion in kNN (lo=hi=0 is the
    point's own cell)."""
    @pandas_udf(T.ArrayType(T.LongType()))
    def _ring(x: pd.Series, y: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
        cs = C.cell_size(level)
        n = 1 << level
        xi = np.floor((x.to_numpy(np.float64) - C.WORLD_X0) / cs).astype(np.int64)
        yi = np.floor((y.to_numpy(np.float64) - C.WORLD_Y0) / cs).astype(np.int64)
        los = lo.to_numpy(np.int64)
        his = hi.to_numpy(np.int64)
        out = []
        for cx, cy, l_, h_ in zip(xi, yi, los, his):
            xs = np.arange(max(cx - h_, 0), min(cx + h_, n - 1) + 1)
            ys = np.arange(max(cy - h_, 0), min(cy + h_, n - 1) + 1)
            gx, gy = np.meshgrid(xs, ys, indexing="ij")
            cheb = np.maximum(np.abs(gx - cx), np.abs(gy - cy))
            m = (cheb >= l_) & (cheb <= h_)
            out.append(C.encode(level, gx[m], gy[m]))
        return pd.Series(out)
    return _ring


def st_ring_cells_rect(level: int):
    """(minx, miny, maxx, maxy, lo:int, hi:int) -> array<long> cells
    whose Chebyshev distance from the BOX's cover rectangle lies in
    [lo, hi] — the annulus probe for box-mode kNN. The base rectangle
    reproduces :func:`cells.cover_bbox`'s pad=0 floor/ceil arithmetic
    exactly, so ring cells align with the corpus-side cover index
    (misaligned conventions would make the certification bound
    unsound at cell boundaries)."""
    @pandas_udf(T.ArrayType(T.LongType()))
    def _ring(minx: pd.Series, miny: pd.Series, maxx: pd.Series,
              maxy: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
        cs = C.cell_size(level)
        n = 1 << level
        x1 = np.clip(np.floor((minx.to_numpy(np.float64) - C.WORLD_X0) / cs),
                     0, n - 1).astype(np.int64)
        y1 = np.clip(np.floor((miny.to_numpy(np.float64) - C.WORLD_Y0) / cs),
                     0, n - 1).astype(np.int64)
        x2 = np.clip(np.ceil((maxx.to_numpy(np.float64) - C.WORLD_X0) / cs),
                     1, n).astype(np.int64)
        y2 = np.clip(np.ceil((maxy.to_numpy(np.float64) - C.WORLD_Y0) / cs),
                     1, n).astype(np.int64)
        bx = x1 + np.maximum(x2 - x1, 1) - 1
        by = y1 + np.maximum(y2 - y1, 1) - 1
        los = lo.to_numpy(np.int64)
        his = hi.to_numpy(np.int64)
        out = []
        for ax0, ay0, ax1, ay1, l_, h_ in zip(x1, y1, bx, by, los, his):
            xs = np.arange(max(ax0 - h_, 0), min(ax1 + h_, n - 1) + 1)
            ys = np.arange(max(ay0 - h_, 0), min(ay1 + h_, n - 1) + 1)
            gx, gy = np.meshgrid(xs, ys, indexing="ij")
            dx = np.maximum(np.maximum(ax0 - gx, gx - ax1), 0)
            dy = np.maximum(np.maximum(ay0 - gy, gy - ay1), 0)
            cheb = np.maximum(dx, dy)
            m = (cheb >= l_) & (cheb <= h_)
            out.append(C.encode(level, gx[m], gy[m]))
        return pd.Series(out)
    return _ring
