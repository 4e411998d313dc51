"""Distributed per-group convex hull over integer point sets.

Beyond the reference (cdap_geo has no hull operator); this is the
classic spatial aggregate a geometry engine needs next to dissolve /
bbox / buffer. Everything is EXACT INTEGER arithmetic — cross products
of int64 coordinates — so the hull vertex set is cross-engine
value-hashable, and the definition is pinned precisely: a point is a
hull vertex iff it is a strict corner of the minimal convex polygon
(collinear boundary mid-points are NOT vertices; a 2-point or
collinear set yields its two extreme points; a 1-point set yields
itself). Duplicate coordinates are deduped first.

Scale design (how a hull of 100 TB of points stays cheap):

1. **Akl–Toussaint cull, map-side and native.** Per group, the four
   extreme points (W/S/E/N with deterministic lexicographic
   tie-breaks) are ONE aggregation (map-side partials) broadcast back;
   any point STRICTLY inside their quadrilateral cannot be a hull
   vertex and is dropped inside whole-stage codegen — four integer
   cross-sign tests, no Python. For uniformly distributed points this
   discards all but O(sqrt(n)) boundary-band points before anything
   shuffles.
2. **Per-partition partial hull.** Survivors run a monotone chain per
   (partition, group) inside ``mapInPandas`` — a global hull vertex is
   a hull vertex of every subset containing it, so taking each
   partition's local hull first is lossless and bounds the shuffle at
   the sum of local hull sizes.
3. **Final exact chain per group** via ``applyInPandas`` — the only
   sequential step, over the (tiny) candidate set. Degenerate inputs
   (all points on a circle) keep every candidate; the final fold is
   then O(hull size) on one executor — the inherent lower bound for an
   exact hull, stated honestly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _cross(ox, oy, ax, ay, bx, by):
    """Column expr: z of (a-o) x (b-o) — exact BIGINT."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _chain(pts):
    """Monotone chain over SORTED unique (x, y) int tuples; strict
    turns only (collinear mid-points popped)."""
    if len(pts) <= 2:
        return list(pts)

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def _hull_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for g, grp in pdf.groupby("g", sort=False):
        pts = sorted({(int(x), int(y))
                      for x, y in zip(grp["x"], grp["y"])})
        out.extend((g, x, y) for x, y in _chain(pts))
    return pd.DataFrame(out, columns=["g", "x", "y"])


def convex_hull(df: DataFrame, *, group: str, x_col: str,
                y_col: str) -> DataFrame:
    """Hull vertex set per ``group``: returns ``(group, x, y)`` BIGINT
    rows — one per strict hull corner (see module docstring for the
    exact degenerate-input contract). Coordinates must be integral
    (cast to long; the exactness contract is integer cross products).
    """
    pts = (df.select(F.col(group).alias("g"),
                     F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
           .where(F.col("x").isNotNull() & F.col("y").isNotNull())
           .distinct())
    # four extreme points per group, deterministic lexicographic ties:
    # W = min (x,y), E = max (x,y), S = min (y,x), N = max (y,x)
    xy = F.struct(F.col("x"), F.col("y"))
    yx = F.struct(F.col("y"), F.col("x"))
    ext = pts.groupBy("g").agg(F.min(xy).alias("w"), F.max(xy).alias("e"),
                               F.min(yx).alias("s"), F.max(yx).alias("n"))
    # quad in CCW cyclic order W -> S -> E -> N; strictly inside <=>
    # cross > 0 on all four edges (degenerate edges give 0 -> kept).
    # struct(y, x) keeps its FIELD NAMES y and x, so `<corner>.x` is
    # the original x for every corner regardless of sort-key order.
    j = pts.join(F.broadcast(ext), "g")

    def corner_xy(name):
        return F.col(f"{name}.x"), F.col(f"{name}.y")

    def edge_cross(a, b):
        ax, ay = corner_xy(a)
        bx, by = corner_xy(b)
        return _cross(ax, ay, bx, by, F.col("x"), F.col("y"))

    strictly_inside = ((edge_cross("w", "s") > 0)
                       & (edge_cross("s", "e") > 0)
                       & (edge_cross("e", "n") > 0)
                       & (edge_cross("n", "w") > 0))
    survivors = j.where(~strictly_inside).select("g", "x", "y")
    # per-partition partial hull (lossless: a global hull vertex is a
    # local hull vertex of every subset containing it)
    partial = survivors.mapInPandas(
        lambda it: (_hull_pdf(pdf) for pdf in it),
        schema="g long, x long, y long")
    return (partial.groupBy("g")
            .applyInPandas(lambda pdf: _hull_pdf(pdf),
                           schema="g long, x long, y long")
            .select(F.col("g").alias(group), "x", "y"))


def hull_diameter(df: DataFrame, *, group: str, x_col: str,
                  y_col: str) -> DataFrame:
    """Per-group diameter (farthest point pair): returns
    ``(group, d2, ax, ay, bx, by)`` where ``d2`` is the EXACT squared
    euclidean distance (BIGINT — no sqrt, so hashable) and (a, b) is
    the lexicographically-smallest achieving pair (deterministic under
    ties).

    The diameter of a point set is attained between two CONVEX HULL
    vertices, so this composes over :func:`convex_hull`: the all-pairs
    max runs only over each group's hull vertex set — O(h²) per group
    on relations the hull stage already reduced to the boundary band,
    never an all-pairs join over the raw points. (The classic rotating
    calipers is O(h); at h ≤ a few hundred per group the equi-joined
    O(h²) max is one codegen'd aggregate and keeps the whole operator
    declarative.)
    """
    h = convex_hull(df, group=group, x_col=x_col, y_col=y_col)
    a = h.select(F.col(group).alias("g"), F.col("x").alias("ax"),
                 F.col("y").alias("ay"))
    b = h.select(F.col(group).alias("g"), F.col("x").alias("bx"),
                 F.col("y").alias("by"))
    pairs = (a.join(b, "g")
             .where((F.col("ax") < F.col("bx"))
                    | ((F.col("ax") == F.col("bx"))
                       & (F.col("ay") <= F.col("by")))))
    d2 = ((F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
          + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay")))
    key = F.struct(d2.alias("d2"),
                   (-F.col("ax")).alias("nax"), (-F.col("ay")).alias("nay"),
                   (-F.col("bx")).alias("nbx"), (-F.col("by")).alias("nby"))
    best = (pairs.groupBy("g")
            .agg(F.max(key).alias("k"))
            .select(F.col("g").alias(group),
                    F.col("k.d2").alias("d2"),
                    (-F.col("k.nax")).alias("ax"),
                    (-F.col("k.nay")).alias("ay"),
                    (-F.col("k.nbx")).alias("bx"),
                    (-F.col("k.nby")).alias("by")))
    return best


def hull_diameter_oracle_sql(points_sql: str) -> str:
    """DuckDB twin of :func:`hull_diameter`: max squared distance over
    the SQL hull vertex set, smallest achieving pair on ties (same
    max-of-negated-struct rule)."""
    return f"""
      WITH hv AS ({hull_oracle_sql(points_sql)}),
      pr AS (
        SELECT a.g,
               (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
                 AS d2,
               a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
        FROM hv a JOIN hv b ON a.g = b.g
         AND (a.x < b.x OR (a.x = b.x AND a.y <= b.y))
      ), rk AS (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY g ORDER BY d2 DESC, ax, ay, bx, by) AS rn
        FROM pr
      )
      SELECT CAST(g AS BIGINT) AS g, d2, ax, ay, bx, by
      FROM rk WHERE rn = 1
    """


def hull_oracle_sql(points_sql: str) -> str:
    """ANSI-SQL twin of :func:`convex_hull` for DuckDB. ``points_sql``
    must yield ``(g, x, y)`` integer points (duplicates allowed — they
    are deduped here). Definition-equal to the monotone chain: a hull
    EDGE (a, b) has every other point strictly left of a->b, or
    collinear and between a and b inclusive; hull VERTICES are the
    edge endpoints, plus the point itself for 1-point groups. All
    predicates are integer cross products — exact."""
    return f"""
      WITH p AS (SELECT DISTINCT g, CAST(x AS BIGINT) AS x,
                        CAST(y AS BIGINT) AS y FROM ({points_sql})),
      e AS (
        SELECT a.g, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
        FROM p a JOIN p b ON a.g = b.g
                 AND (a.x <> b.x OR a.y <> b.y)
        WHERE NOT EXISTS (
          SELECT 1 FROM p c
          WHERE c.g = a.g AND (c.x <> a.x OR c.y <> a.y)
                          AND (c.x <> b.x OR c.y <> b.y)
            AND NOT (
              (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) > 0
              OR (
                (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) = 0
                AND c.x BETWEEN LEAST(a.x, b.x) AND GREATEST(a.x, b.x)
                AND c.y BETWEEN LEAST(a.y, b.y) AND GREATEST(a.y, b.y))))
      ), v AS (
        SELECT g, ax AS x, ay AS y FROM e
        UNION
        SELECT g, bx, by FROM e
        UNION
        SELECT g, MIN(x), MIN(y) FROM p
        GROUP BY g HAVING COUNT(*) = 1
      )
      SELECT CAST(g AS BIGINT) AS g, x, y FROM v
    """
