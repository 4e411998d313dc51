"""Grid-density spatial clustering (DBSCAN-lite over cell histograms).

The scalable form of density clustering a 100 TB point corpus can
actually run: instead of the classic DBSCAN epsilon-graph over POINTS
(quadratic neighbor search), points reduce to an integer grid-cell
histogram (one keyed aggregation), cells at or above ``min_pts``
become "dense", and clusters are the connected components of the
8-neighborhood graph over DENSE CELLS ONLY — a relation bounded by the
occupied-cell count whatever the corpus size. Components reuse
:func:`cdap_geo_spark.operators.dedup.dedup_components`
(pointer-jumping min-label, O(log diameter) rounds).

Exactness: integer cell coordinates (coords integer-divided by an
integer ``cell_size``; non-negative coordinate contract documented —
Spark's DIV truncates toward zero while SQL ``//`` floors, which only
agree for non-negatives), integer counts, cluster label = min cell key
in the component — every output column is an exact BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdap_geo_spark.operators.dedup import dedup_components

#: cell-key stride: key = cx * _M + cy. Valid while 0 <= cy < _M and
#: cx * _M fits int64 — i.e. any coordinate domain up to ~4e6 cells a
#: side, far beyond the test frames; assert-guarded below.
_M = 4_000_003


def grid_cluster(points: DataFrame, *, x_col: str = "x",
                 y_col: str = "y", cell_size: int,
                 min_pts: int = 3) -> DataFrame:
    """Cluster the dense regions of a point set: returns one row per
    DENSE cell — ``(cx, cy, n_pts, cluster)`` — where dense means
    ``>= min_pts`` points in the ``cell_size`` × ``cell_size`` cell
    and ``cluster`` is the minimum cell key of the cell's
    8-connected dense component (exact BIGINTs throughout; points in
    non-dense cells are noise by definition and appear in no cluster).

    Plan: ONE keyed aggregation collapses the corpus to occupied
    cells; the neighbor graph is an equi-join of dense cells against
    their 8 exploded neighbor keys (map-side explode, never a theta
    join); components run over the dense-cell graph only. The corpus
    never shuffles twice.
    """
    if cell_size <= 0:
        raise ValueError("grid_cluster: cell_size must be > 0")
    if min_pts < 1:
        raise ValueError("grid_cluster: min_pts must be >= 1")
    cs = int(cell_size)
    cells = (points.select(
        F.expr(f"CAST({x_col} AS BIGINT) DIV {cs}").alias("cx"),
        F.expr(f"CAST({y_col} AS BIGINT) DIV {cs}").alias("cy"))
        .groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n_pts"))
        .where(F.col("n_pts") >= min_pts))
    key = (F.col("cx") * _M + F.col("cy")).alias("key")
    k = cells.select(key, "cx", "cy", "n_pts")
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)])
    nbr = (k.select("key", "cx", "cy",
                    F.explode(offsets).alias("o"))
           .select("key",
                   ((F.col("cx") + F.col("o.dx")) * _M
                    + (F.col("cy") + F.col("o.dy"))).alias("nkey")))
    edges = (nbr.join(k.select(F.col("key").alias("nkey")), "nkey")
             .where(F.col("key") < F.col("nkey"))
             .select(F.col("key").alias("id_a"),
                     F.col("nkey").alias("id_b")))
    comp = dedup_components(edges)
    return (k.join(comp.withColumnRenamed("node", "key"), "key", "left")
            .select("cx", "cy", "n_pts",
                    F.coalesce(F.col("component"), F.col("key"))
                    .cast("long").alias("cluster")))


def grid_cluster_oracle_sql(points_sql: str, *, cell_size: int,
                            min_pts: int = 3) -> str:
    """ANSI-SQL twin of :func:`grid_cluster` for DuckDB: the same
    dense-cell histogram, the 8-neighbor join (theta join — fine
    single-node over dense cells), and a recursive-CTE transitive
    closure for the components. ``points_sql`` yields (x, y)."""
    return f"""
      WITH RECURSIVE pts AS (
        SELECT CAST(x AS BIGINT) // {int(cell_size)} AS cx,
               CAST(y AS BIGINT) // {int(cell_size)} AS cy
        FROM ({points_sql})
      ), dense AS (
        SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_pts
        FROM pts GROUP BY cx, cy HAVING COUNT(*) >= {int(min_pts)}
      ), k AS (
        SELECT cx * {_M} + cy AS key, cx, cy, n_pts FROM dense
      ), edges AS (
        SELECT a.key AS src, b.key AS dst
        FROM k a JOIN k b
          ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
         AND a.key <> b.key
      ), reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
      ), comp AS (
        SELECT src AS key, LEAST(src, MIN(dst)) AS cluster
        FROM reach GROUP BY src
      )
      SELECT k.cx, k.cy, k.n_pts,
             COALESCE(comp.cluster, k.key) AS cluster
      FROM k LEFT JOIN comp ON k.key = comp.key
    """


def grid_heatmap(points: DataFrame, *, x_col: str = "x",
                 y_col: str = "y", cell_size: int,
                 radius: int = 1) -> DataFrame:
    """Rasterized density heat-map — the KDE-lite a 100 TB point corpus
    can afford: points collapse to an integer grid-cell histogram (ONE
    keyed aggregation), then each occupied cell scatters its count into
    the ``(2r+1)²`` neighborhood under the separable integer pyramid
    kernel ``w(dx,dy) = (r+1-|dx|) * (r+1-|dy|)`` (the discrete tent —
    the 2-fold box convolution, so the smoothing is genuinely
    kernel-shaped while every weight stays an exact integer). Returns
    ``(cx, cy, heat)`` for every cell with non-zero heat, including
    halo cells that hold no raw point. Counts, weights, and the
    convolved sums are all BIGINTs — order-independent, cross-engine
    hashable.

    Plan shape: the corpus shuffles ONCE (the histogram agg with
    map-side partials); the scatter is a bounded map-side explode of
    the occupied-cell relation (× (2r+1)²) into a second keyed agg —
    cost scales with OCCUPIED CELLS, not corpus points. Same
    non-negative coordinate contract as :func:`grid_cluster` (Spark
    DIV truncates toward zero; SQL ``//`` floors).
    """
    if cell_size <= 0:
        raise ValueError("grid_heatmap: cell_size must be > 0")
    if radius < 0:
        raise ValueError("grid_heatmap: radius must be >= 0")
    cs, r = int(cell_size), int(radius)
    cells = (points.select(
        F.expr(f"CAST({x_col} AS BIGINT) DIV {cs}").alias("cx"),
        F.expr(f"CAST({y_col} AS BIGINT) DIV {cs}").alias("cy"))
        .groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n")))
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit((r + 1 - abs(dx)) * (r + 1 - abs(dy)))
                 .cast("long").alias("w"))
        for dx in range(-r, r + 1) for dy in range(-r, r + 1)])
    return (cells.select("cx", "cy", "n", F.explode(offsets).alias("o"))
            .groupBy((F.col("cx") + F.col("o.dx")).alias("cx"),
                     (F.col("cy") + F.col("o.dy")).alias("cy"))
            .agg(F.sum(F.col("n") * F.col("o.w")).cast("long")
                 .alias("heat")))


def grid_heatmap_oracle_sql(points_sql: str, *, cell_size: int,
                            radius: int = 1) -> str:
    """ANSI-SQL twin of :func:`grid_heatmap` (same integer pyramid
    kernel; offsets as a VALUES relation)."""
    r = int(radius)
    vals = ", ".join(
        f"({dx}, {dy}, {(r + 1 - abs(dx)) * (r + 1 - abs(dy))})"
        for dx in range(-r, r + 1) for dy in range(-r, r + 1))
    return f"""
      WITH pts AS ({points_sql}),
      cells AS (
        SELECT CAST(x AS BIGINT) // {int(cell_size)} AS cx,
               CAST(y AS BIGINT) // {int(cell_size)} AS cy,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pts GROUP BY 1, 2
      ),
      off(dx, dy, w) AS (SELECT * FROM (VALUES {vals}))
      SELECT CAST(c.cx + o.dx AS BIGINT) AS cx,
             CAST(c.cy + o.dy AS BIGINT) AS cy,
             CAST(SUM(c.n * o.w) AS BIGINT) AS heat
      FROM cells c CROSS JOIN off o
      GROUP BY 1, 2
    """


def _hex_axial(x, y, size: float):
    """Fractional axial coords (q, r) of a pointy-top hex grid, then
    cube-rounded to the containing hex — the standard cube-rounding
    algorithm (Amit Patel's public hex-grid reference), expressed as
    pure Column arithmetic so it runs in whole-stage codegen AND can
    be mirrored token-for-token in a SQL twin.

    Determinism: every step is IEEE-754 basic ops (+,−,·,/, sqrt, the
    engine's half-up ROUND, comparisons) with a FIXED expression
    shape on exactly-representable integer inputs — correctly rounded
    by spec, so any compliant engine computes bit-identical hex ids.
    (The half-up tie rule on cube rounding is a *defined* convention
    here; it only has to be the SAME convention in both engines.)
    """
    fq = (F.sqrt(F.lit(3.0)) / 3.0 * x - y / F.lit(3.0)) / size
    fr = (F.lit(2.0) / 3.0 * y) / size
    fy = -fq - fr
    rq, rr, ry = F.round(fq), F.round(fr), F.round(fy)
    dq, dr, dy = F.abs(rq - fq), F.abs(rr - fr), F.abs(ry - fy)
    q = F.when((dq > dy) & (dq > dr), -ry - rr).otherwise(rq)
    r = F.when(~((dq > dy) & (dq > dr)) & (dr > dy), -rq - ry) \
         .otherwise(rr)
    return q.cast("long"), r.cast("long")


def hex_bin(points: DataFrame, *, size: float,
            x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Hexagonal density binning (the H3/Uber-style analytics surface
    over a flat CRS): each point lands in its pointy-top hexagon of
    circumradius ``size``; returns ``(hq, hr, n)`` axial coordinates
    with exact counts. Hexagons beat squares for density maps because
    all 6 neighbors are equidistant (no diagonal bias).

    Plan: the hex assignment is pure map-side codegen arithmetic (no
    UDF, no shuffle); the ONE exchange is the (hq, hr) count with
    map-side partials — bounded by occupied hexes, not points. At
    100 TB this is a scan + one dimension-sized aggregate.
    """
    if size <= 0:
        raise ValueError("hex_bin: size must be > 0")
    q, r = _hex_axial(F.col(x_col).cast("double"),
                      F.col(y_col).cast("double"), float(size))
    return (points.where(F.col(x_col).isNotNull()
                         & F.col(y_col).isNotNull())
            .select(q.alias("hq"), r.alias("hr"))
            .groupBy("hq", "hr")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def hex_bin_oracle_sql(points_sql: str, *, size: float) -> str:
    """ANSI-SQL twin of :func:`hex_bin` with the identical expression
    shape (every op correctly rounded ⇒ bit-identical assignment).
    ``points_sql`` must yield (x, y)."""
    s = float(size)
    return f"""
      WITH p AS ({points_sql}),
      f AS (
        SELECT (SQRT(3.0) / 3.0 * CAST(x AS DOUBLE)
                - CAST(y AS DOUBLE) / 3.0) / {s} AS fq,
               (2.0 / 3.0 * CAST(y AS DOUBLE)) / {s} AS fr
        FROM p
      ), g AS (
        SELECT fq, fr, -fq - fr AS fy,
               ROUND(fq) AS rq, ROUND(fr) AS rr,
               ROUND(-fq - fr) AS ry
        FROM f
      ), h AS (
        SELECT CASE WHEN ABS(rq - fq) > ABS(ry - fy)
                     AND ABS(rq - fq) > ABS(rr - fr)
                    THEN -ry - rr ELSE rq END AS q,
               CASE WHEN NOT (ABS(rq - fq) > ABS(ry - fy)
                              AND ABS(rq - fq) > ABS(rr - fr))
                     AND ABS(rr - fr) > ABS(ry - fy)
                    THEN -rq - ry ELSE rr END AS r
        FROM g
      )
      SELECT CAST(q AS BIGINT) AS hq, CAST(r AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM h GROUP BY q, r
    """


#: pointy-top axial k=1 ring: the hex itself + its six neighbors
HEX_RING1 = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1))


def hex_smooth(hexes: DataFrame, *, q_col: str = "hq",
               r_col: str = "hr", n_col: str = "n") -> DataFrame:
    """k=1 ring smoothing over a hexagonal density surface (the
    standard H3-style hotspot smoothing pass after :func:`hex_bin`):
    every hex's smoothed value is the mean of itself and its six
    axial neighbors, absent hexes counting 0 — the fixed divisor 7 is
    what keeps the mean EXACT (one micro-rounded divide of an exact
    BIGINT sum; no occupancy-dependent denominator to disagree on).
    Returns ``(hq, hr, sum_n, smooth_u)`` for every hex TOUCHED by an
    occupied hex's ring (the smoothed surface dilates one ring, as
    any convolution does).

    Plan: each occupied hex fans out to its 7 ring positions (a
    literal 7-element explode — pure map-side), then ONE (hq, hr) sum
    with map-side partials, bounded by touched hexes. The hex
    convolution at 100 TB is a scan + one dimension-sized exchange.
    """
    contrib = (hexes.select(
        F.col(q_col).cast("long").alias("_q"),
        F.col(r_col).cast("long").alias("_r"),
        F.col(n_col).cast("long").alias("_n"))
        .select(F.explode(F.array(*[
            F.struct((F.col("_q") + dq).alias("hq"),
                     (F.col("_r") + dr).alias("hr"),
                     F.col("_n").alias("n"))
            for dq, dr in HEX_RING1])).alias("c"))
        .select("c.hq", "c.hr", "c.n"))
    return (contrib.groupBy("hq", "hr")
            .agg(F.sum("n").cast("long").alias("sum_n"))
            .select("hq", "hr", "sum_n",
                    F.round(F.lit(1_000_000.0)
                            * F.col("sum_n").cast("double")
                            / F.lit(7.0)).cast("long")
                    .alias("smooth_u")))


def hex_smooth_oracle_sql(hexes_sql: str) -> str:
    """ANSI/DuckDB twin of :func:`hex_smooth` — same 7-offset fanout
    (UNION ALL arms), same fixed-divisor mean. ``hexes_sql`` must
    yield (hq, hr, n)."""
    arms = "\n        UNION ALL\n".join(
        f"        SELECT hq + {dq} AS hq, hr + {dr} AS hr, n FROM h"
        for dq, dr in HEX_RING1)
    return f"""
      WITH h AS ({hexes_sql}),
      contrib AS (
{arms}
      )
      SELECT CAST(hq AS BIGINT) AS hq, CAST(hr AS BIGINT) AS hr,
             CAST(SUM(n) AS BIGINT) AS sum_n,
             CAST(ROUND(1000000.0 * CAST(SUM(n) AS DOUBLE) / 7.0)
               AS BIGINT) AS smooth_u
      FROM contrib GROUP BY 1, 2
    """


def dbscan(points: DataFrame, *, eps: int, min_pts: int,
           id_col: str = "id", x_col: str = "x",
           y_col: str = "y") -> DataFrame:
    """Exact point-level DBSCAN (Ester et al. 1996) — the companion
    to :func:`grid_cluster` (which trades point-level labels for a
    histogram-bounded relation): ``core`` = ≥ ``min_pts`` points
    within ``eps`` (INCLUDING itself, the textbook count), clusters =
    connected components of the core–core ε-graph, ``border`` =
    non-core with a core neighbor (assigned the MIN neighboring core
    cluster — the deterministic tie rule; classic DBSCAN is
    scan-order-dependent here, which no distributed engine should
    reproduce), ``noise`` = the rest. Returns ``(id, cluster, kind)``
    with cluster NULL for noise and cluster = min core id of the
    component otherwise.

    All arithmetic exact: integer d² ≤ eps², integer counts, min-id
    labels. The ε-neighbor relation comes from ONE 3×3-neighbor cell
    equi-join at cell size ``eps`` (directed, i≠j — the count and the
    border assignment both need direction); components reuse
    :func:`dedup_components` (pointer-jumping min-label propagation,
    O(log diameter) rounds, per-round localCheckpoint).

    Scale: candidate volume is points-per-cell² (salt-able); the
    component state is one row per CORE point. Against 10^12 points
    pick eps well below the percolation radius or the core graph's
    giant component makes any engine's label propagation the
    bottleneck — that trade is the operator's documented contract,
    same as single-linkage clustering.

    **Lifetime contract**: inherits :func:`dedup_components`'s — the
    returned frame is checkpoint-backed; materialize fully inside any
    enclosing ``checkpoint_scope``.
    """
    if eps < 1 or min_pts < 1:
        raise ValueError("dbscan: need eps >= 1 and min_pts >= 1")
    base = (points
            .where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
            .select(F.col(id_col).cast("long").alias("_id"),
                    F.col(x_col).cast("long").alias("_x"),
                    F.col(y_col).cast("long").alias("_y")))
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    left = (base.select(F.col("_id").alias("i"), F.col("_x").alias("ax"),
                        F.col("_y").alias("ay"),
                        F.expr(f"_x DIV {eps}").alias("_cx"),
                        F.expr(f"_y DIV {eps}").alias("_cy"))
            .withColumn("_ox", off).withColumn("_oy", off)
            .select("i", "ax", "ay",
                    (F.col("_cx") + F.col("_ox")).alias("cx"),
                    (F.col("_cy") + F.col("_oy")).alias("cy")))
    right = base.select(F.col("_id").alias("j"), F.col("_x").alias("bx"),
                        F.col("_y").alias("by"),
                        F.expr(f"_x DIV {eps}").alias("cx"),
                        F.expr(f"_y DIV {eps}").alias("cy"))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    nbrs = (left.join(right, ["cx", "cy"])
            .where((F.col("i") != F.col("j"))
                   & (d2 <= F.lit(eps * eps)))
            .select("i", "j"))
    deg = nbrs.groupBy("i").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("_n_eps"))
    core = (base.join(deg, base["_id"] == deg["i"], "left")
            .where(F.coalesce(F.col("_n_eps"), F.lit(1)) >= min_pts)
            .select(F.col("_id").alias("c")))
    cedges = (nbrs.where(F.col("i") < F.col("j"))
              .join(core.select(F.col("c").alias("i")), "i")
              .join(core.select(F.col("c").alias("j")), "j")
              .select(F.col("i").alias("id_a"), F.col("j").alias("id_b")))
    comp = dedup_components(cedges)
    corelab = (core.join(comp, core["c"] == comp["node"], "left")
               .select(F.col("c").alias("_id"),
                       F.coalesce(F.col("component"), F.col("c"))
                       .alias("cluster"),
                       F.lit("core").alias("kind")))
    borderlab = (nbrs
                 .join(corelab.select(F.col("_id").alias("j"),
                                      F.col("cluster").alias("_jc")),
                       "j")
                 .join(core.select(F.col("c").alias("i")), "i",
                       "left_anti")
                 .groupBy("i")
                 .agg(F.min("_jc").alias("cluster"))
                 .select(F.col("i").alias("_id"), "cluster",
                         F.lit("border").alias("kind")))
    labeled = corelab.unionByName(borderlab)
    noise = (base.select("_id")
             .join(labeled.select("_id"), "_id", "left_anti")
             .select("_id", F.lit(None).cast("long").alias("cluster"),
                     F.lit("noise").alias("kind")))
    return (labeled.unionByName(noise)
            .select(F.col("_id").alias(id_col), "cluster", "kind"))
