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


def point_segment_dist2(px, py, ax, ay, bx, by) -> Column:
    """Squared Euclidean distance from point P to closed segment AB,
    as a DOUBLE with a FIXED expression shape.

    Exactness contract (the cross-engine hashability argument): with
    BIGINT inputs, ``dot = AP·AB``, ``len2 = |AB|²`` and the endpoint
    distances are exact BIGINTs; the branch selectors compare those
    integers exactly, so both engines always take the same branch.
    Each branch's value is at most TWO IEEE-754 basic operations on
    exactly-representable integers (``cross·cross`` then ``/len2``) —
    both correctly rounded by the 754 spec, hence bit-identical in any
    compliant engine. The boundary caveat: when ``cross² > 2^53`` the
    product rounds once, so a comparison of the result against an
    exact integer threshold can differ from true math by < 2 ulp —
    deterministically, the same way, in every engine (documented at
    :func:`snap_to_segments`).
    """
    apx, apy = px - ax, py - ay
    bpx, bpy = px - bx, py - by
    abx, aby = bx - ax, by - ay
    dot = (apx * abx + apy * aby).cast("long")
    len2 = (abx * abx + aby * aby).cast("long")
    ap2 = (apx * apx + apy * apy).cast("long").cast("double")
    bp2 = (bpx * bpx + bpy * bpy).cast("long").cast("double")
    cross = (apx * aby - apy * abx).cast("long").cast("double")
    return (F.when((len2 == 0) | (dot <= 0), ap2)
            .when(dot >= len2, bp2)
            .otherwise((cross * cross) / len2.cast("double")))


def snap_to_segments(points: DataFrame, segments: DataFrame, *,
                     radius: int, cell: int,
                     point_id: str = "event_id",
                     px: str = "x", py: str = "y",
                     seg_id: str = "road_id",
                     seg_coords=("ax", "ay", "bx", "by")) -> DataFrame:
    """Map-matching-lite: snap each point to its NEAREST segment within
    ``radius`` — the linear-referencing primitive (GPS pings onto a
    road network) the areal join surface cannot express. Points with
    no segment within ``radius`` are dropped (the unmatched-ping
    semantics; left-join the result back by ``point_id`` to keep
    them). Returns ``(point_id, seg_id, d2_u, frac_u)``:

    - ``d2_u``   = round(1e6 · d²) to the winning segment (BIGINT);
    - ``frac_u`` = round(1e6 · t) where t ∈ [0,1] is the clamped
      projection parameter along AB — the chainage fraction for
      linear referencing (0 at A, 1 at B).

    Plan (the scale story): each segment fans out map-side to the grid
    cells covered by its bbox DILATED by ``radius`` (bounded by
    ``(len/cell + 2r/cell + 2)²`` — the caller picks ``cell`` near the
    median segment length); each point maps to exactly ONE cell, so
    the single (cx, cy) equi-join produces every qualifying pair at
    most once — no dedup pass at all. The distance never leaves
    whole-stage codegen, and the per-point argmin is a ``min_by``
    keyed aggregation WITH map-side partials (one candidate per point
    per task rides the final exchange), never a sort window over the
    candidate relation. At 100 TB the candidate relation is 7 longs
    wide and AQE splits skewed (dense-urban) cells.

    Correctness of the cover: any segment within true distance r of p
    has its r-dilated bbox containing p, hence covers p's cell —
    candidates are a superset of matches, and the residual predicate
    ``d² ≤ r²`` (evaluated on the deterministic rounded double of
    :func:`point_segment_dist2`, ulp-exact per that docstring) decides
    membership identically in every engine. Ties on d² break to the
    smallest ``seg_id``. Non-negative integer coordinates required
    (truncating ``div``), as :func:`segment_join`.
    """
    if radius < 1 or cell < 1:
        raise ValueError("snap_to_segments: radius and cell must be >= 1")
    ca = list(seg_coords)
    s = segments.select(F.col(seg_id),
                        *[F.col(c).cast("long").alias(c) for c in ca])
    x0 = F.greatest(F.least(F.col(ca[0]), F.col(ca[2])) - radius, F.lit(0))
    x1 = F.greatest(F.col(ca[0]), F.col(ca[2])) + radius
    y0 = F.greatest(F.least(F.col(ca[1]), F.col(ca[3])) - radius, F.lit(0))
    y1 = F.greatest(F.col(ca[1]), F.col(ca[3])) + radius
    sc = (s.withColumn("_cx", F.explode(F.sequence(
              (x0 / cell).cast("long"), (x1 / cell).cast("long"))))
           .withColumn("_cy", F.explode(F.sequence(
              (y0 / cell).cast("long"), (y1 / cell).cast("long")))))
    p = points.select(F.col(point_id),
                      F.col(px).cast("long").alias("_px"),
                      F.col(py).cast("long").alias("_py"),
                      (F.col(px).cast("long") / cell).cast("long")
                      .alias("_cx"),
                      (F.col(py).cast("long") / cell).cast("long")
                      .alias("_cy"))
    _px, _py = F.col("_px"), F.col("_py")
    A = [F.col(c) for c in ca]
    d2 = point_segment_dist2(_px, _py, *A)
    dot = ((_px - A[0]) * (A[2] - A[0])
           + (_py - A[1]) * (A[3] - A[1])).cast("long")
    len2 = ((A[2] - A[0]) * (A[2] - A[0])
            + (A[3] - A[1]) * (A[3] - A[1])).cast("long")
    frac = (F.when((len2 == 0) | (dot <= 0), F.lit(0.0))
            .when(dot >= len2, F.lit(1.0))
            .otherwise(dot.cast("double") / len2.cast("double")))
    cand = (p.join(sc, ["_cx", "_cy"])
            .withColumn("_d2", d2)
            .where(F.col("_d2") <= F.lit(float(radius) * float(radius)))
            .withColumn("_t", frac))
    win = F.struct(F.col(seg_id).alias("seg"),
                   F.col("_d2").alias("d2"), F.col("_t").alias("t"))
    best = (cand.groupBy(point_id)
            .agg(F.min_by(win, F.struct(F.col("_d2"), F.col(seg_id)))
                 .alias("_w")))
    return best.select(
        point_id,
        F.col("_w.seg").alias(seg_id),
        F.round(F.col("_w.d2") * 1_000_000).cast("long").alias("d2_u"),
        F.round(F.col("_w.t") * 1_000_000).cast("long").alias("frac_u"))


def clip_length_join(segments: DataFrame, boxes: DataFrame, *,
                     cell: int,
                     seg_id: str = "seg_id", box_id: str = "box_id",
                     length_scale: int = 1_000_000) -> DataFrame:
    """Vector-overlay length: for every (segment, box) pair whose
    bboxes overlap, the length of the segment clipped to the box
    (Liang–Barsky parametric clipping), aggregated per box. Returns
    ``(box_id, n_segs, len_sum_u)`` — the road-length-per-region /
    cable-length-per-parcel overlay statistic.

    Candidate generation is the repo's dedup-free 2D canonical-corner
    scheme: both sides explode to covering grid cells of their bbox
    and the pair is kept ONLY in the cell containing
    ``(max(sminx, minx), max(sminy, miny))`` — a corner both bboxes
    provably cover — so each pair survives in exactly one cell: plain
    equi-join, zero dedup shuffle, never a nested loop.

    Determinism contract: inputs are BIGINT coordinates, so every
    Liang–Barsky numerator/denominator (p, q) is exact and every
    branch decision (signs of p, rejection on q) is an integer
    comparison; the four candidate ``q/p`` ratios are single correctly
    rounded IEEE divides, t0/t1 are GREATEST/LEAST over them, and the
    final ``sqrt(len²)·(t1−t0)`` has a fixed expression shape —
    micro-rounded per pair, then summed as exact BIGINTs.

    Scale: the exchanges are the cell equi-join (fanout = bbox
    area / cell², bounded by geometry size) and one box-keyed agg with
    map-side partials. A hot cell salts like any skewed join key.

    Cell assignment uses truncating integer division, so bbox
    coordinates must be non-negative (the same contract as
    ``timeseries.cell_dwell`` / ``zonal.cell_coverage``); the clip
    arithmetic itself has no sign constraint.
    """
    if cell < 1:
        raise ValueError("clip_length_join: cell must be >= 1")
    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")
    s = segments.select(
        F.col(seg_id).alias("_sid"),
        ax.cast("long").alias("ax"), ay.cast("long").alias("ay"),
        bx.cast("long").alias("bx"), by.cast("long").alias("by"),
        F.least(ax, bx).cast("long").alias("sminx"),
        F.greatest(ax, bx).cast("long").alias("smaxx"),
        F.least(ay, by).cast("long").alias("sminy"),
        F.greatest(ay, by).cast("long").alias("smaxy"))
    s = (s.withColumn("cx", F.explode(F.sequence(
            F.expr(f"sminx DIV {cell}"), F.expr(f"smaxx DIV {cell}"))))
         .withColumn("cy", F.explode(F.sequence(
            F.expr(f"sminy DIV {cell}"), F.expr(f"smaxy DIV {cell}")))))
    b = boxes.select(
        F.col(box_id).alias("_bid"),
        F.col("minx").cast("long").alias("minx"),
        F.col("miny").cast("long").alias("miny"),
        F.col("maxx").cast("long").alias("maxx"),
        F.col("maxy").cast("long").alias("maxy"))
    b = (b.withColumn("cx", F.explode(F.sequence(
            F.expr(f"minx DIV {cell}"), F.expr(f"maxx DIV {cell}"))))
         .withColumn("cy", F.explode(F.sequence(
            F.expr(f"miny DIV {cell}"), F.expr(f"maxy DIV {cell}")))))
    canon = ((F.col("cx") == F.expr(
                f"GREATEST(sminx, minx) DIV {cell}"))
             & (F.col("cy") == F.expr(
                f"GREATEST(sminy, miny) DIV {cell}")))
    overlap = ((F.col("sminx") <= F.col("maxx"))
               & (F.col("minx") <= F.col("smaxx"))
               & (F.col("sminy") <= F.col("maxy"))
               & (F.col("miny") <= F.col("smaxy")))
    pairs = s.join(b, ["cx", "cy"]).where(overlap & canon)

    dx = (F.col("bx") - F.col("ax")).alias("dx")
    dy = (F.col("by") - F.col("ay")).alias("dy")
    pairs = pairs.select("_sid", "_bid", "ax", "ay", "minx", "miny",
                         "maxx", "maxy", dx, dy)
    # Liang–Barsky edge tuples (p, q): exact BIGINTs
    pq = [(-F.col("dx"), F.col("ax") - F.col("minx")),
          (F.col("dx"), F.col("maxx") - F.col("ax")),
          (-F.col("dy"), F.col("ay") - F.col("miny")),
          (F.col("dy"), F.col("maxy") - F.col("ay"))]
    reject = None
    t0_args, t1_args = [F.lit(0.0)], [F.lit(1.0)]
    for p, q in pq:
        rj = (p == 0) & (q < 0)
        reject = rj if reject is None else (reject | rj)
        r = q.cast("double") / p.cast("double")
        t0_args.append(F.when(p < 0, r).otherwise(F.lit(0.0)))
        t1_args.append(F.when(p > 0, r).otherwise(F.lit(1.0)))
    t0, t1 = F.greatest(*t0_args), F.least(*t1_args)
    d2 = (F.col("dx") * F.col("dx")
          + F.col("dy") * F.col("dy")).cast("double")
    len_u = F.round(F.lit(float(length_scale)) * F.sqrt(d2)
                    * (t1 - t0)).cast("long")
    clipped = (pairs.withColumn("_rej", reject)
               .withColumn("_t0", t0).withColumn("_t1", t1)
               .where(~F.col("_rej") & (F.col("_t1") >= F.col("_t0")))
               .select("_sid", "_bid", len_u.alias("len_u")))
    return (clipped.groupBy(F.col("_bid").alias(box_id))
            .agg(F.count(F.lit(1)).cast("long").alias("n_segs"),
                 F.sum("len_u").cast("long").alias("len_sum_u")))


def raster_line(segments: DataFrame, *, cell: int,
                seg_id: str = "seg_id") -> DataFrame:
    """Vector→raster supercover for LINES: the set of grid cells each
    segment passes through, aggregated to a tile-density raster
    ``(cx, cy, n_segs)`` — the line-network complement of the polygon
    cell covers in ``core/cells.py`` (reference tile semantics:
    ``cdap_geo/_indexing.py:232-270`` keeps only cells whose box
    intersects the geometry; this is that rule for segments, entirely
    in integer arithmetic).

    Exact test, no floats anywhere: a candidate cell (from the
    segment's bbox cell range, so cell box × segment bbox overlap
    holds by construction) is traversed iff the four cell-box corners
    do NOT lie strictly on one side of the segment's supporting line —
    four BIGINT cross products and sign tests (closed-box semantics:
    touching counts, matching the reference's boundary-inclusive
    covers). Zero-length segments degrade to the point-in-cell test
    via the same sign rule (all cross products zero).

    Scale: map-side explode bounded by bbox area / cell², one (cx, cy)
    count exchange with map-side partials — bounded by occupied tiles,
    not segments. Coordinates must be non-negative (truncating-DIV
    cell contract).
    """
    if cell < 1:
        raise ValueError("raster_line: cell must be >= 1")
    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")
    s = segments.select(
        F.col(seg_id).alias("_sid"),
        ax.cast("long").alias("ax"), ay.cast("long").alias("ay"),
        bx.cast("long").alias("bx"), by.cast("long").alias("by"),
        F.least(ax, bx).cast("long").alias("_x0"),
        F.greatest(ax, bx).cast("long").alias("_x1"),
        F.least(ay, by).cast("long").alias("_y0"),
        F.greatest(ay, by).cast("long").alias("_y1"))
    s = (s.withColumn("cx", F.explode(F.sequence(
            F.expr(f"_x0 DIV {cell}"), F.expr(f"_x1 DIV {cell}"))))
         .withColumn("cy", F.explode(F.sequence(
            F.expr(f"_y0 DIV {cell}"), F.expr(f"_y1 DIV {cell}")))))
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    crosses = []
    for ix, iy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        px = (F.col("cx") + ix) * cell
        py = (F.col("cy") + iy) * cell
        crosses.append(dx * (py - F.col("ay")) - dy * (px - F.col("ax")))
    all_pos = crosses[0] > 0
    all_neg = crosses[0] < 0
    for c in crosses[1:]:
        all_pos = all_pos & (c > 0)
        all_neg = all_neg & (c < 0)
    return (s.where(~(all_pos | all_neg))
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).cast("long").alias("n_segs")))


def raster_line_oracle_sql(segments_sql: str, *, cell: int) -> str:
    """ANSI/DuckDB twin of :func:`raster_line` — identical integer
    sign tests over the same candidate cells. ``segments_sql`` must
    yield (seg_id, ax, ay, bx, by) BIGINTs."""
    corners = []
    for ix, iy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        corners.append(
            f"((bx - ax) * ((cy + {iy}) * {cell} - ay)"
            f" - (by - ay) * ((cx + {ix}) * {cell} - ax))")
    allpos = " AND ".join(f"{c} > 0" for c in corners)
    allneg = " AND ".join(f"{c} < 0" for c in corners)
    return f"""
      WITH s AS ({segments_sql}),
      bb AS (
        SELECT seg_id, ax, ay, bx, by,
               LEAST(ax, bx) // {cell} AS cx0,
               GREATEST(ax, bx) // {cell} AS cx1,
               LEAST(ay, by) // {cell} AS cy0,
               GREATEST(ay, by) // {cell} AS cy1
        FROM s
      ),
      candx AS (
        -- one axis per stage: multiple UNNESTs in one SELECT would zip
        SELECT seg_id, ax, ay, bx, by, cy0, cy1,
               CAST(UNNEST(generate_series(cx0, cx1)) AS BIGINT) AS cx
        FROM bb
      ),
      cand AS (
        SELECT seg_id, ax, ay, bx, by, cx,
               CAST(UNNEST(generate_series(cy0, cy1)) AS BIGINT) AS cy
        FROM candx
      )
      SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_segs
      FROM cand
      WHERE NOT (({allpos}) OR ({allneg}))
      GROUP BY 1, 2
    """
