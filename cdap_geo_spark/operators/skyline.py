"""Distributed 2D skyline (Pareto frontier) — an operator Spark lacks.

A row is on the skyline iff no other row strictly dominates it (>= on
both criteria, > on at least one, with per-criterion direction flags).
The naive formulation is a quadratic NOT-EXISTS self-join — Spark would
plan a BroadcastNestedLoopJoin, undistributable at corpus scale. This
is the classic two-phase distributed skyline instead (Börzsönyi et al.
2001's block-nested-loop idea turned map-side):

1. ``distinct`` on the two criterion columns — coordinates, not rows,
   travel the plan (exact duplicates can never dominate each other, so
   dominance is a property of the coordinate set);
2. **local frontier** per partition via ``mapInPandas`` — each Arrow
   batch reduces to its own Pareto frontier with one NumPy
   sort + cummax (a frontier of a subset is a SUPERSET filter: no
   globally-dominant point is ever dropped locally);
3. **global frontier** over the union of local frontiers — bounded by
   the sum of per-partition frontier sizes (typically O(log n) each for
   non-adversarial data; worst case documented below), one small
   single-partition pass;
4. winners return as a broadcast semi-join on the coordinate pair, so
   the wide payload never rides any of it.

Worst case: perfectly anti-correlated data puts EVERY distinct
coordinate on the frontier, and phase-3 sees all of them — the same
degenerate input that defeats every skyline algorithm. The operator is
still correct; phase 3 is then the bottleneck and the caller should
pre-bucket (the standard grid-partitioned skyline refinement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _frontier(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pareto frontier of distinct (_x, _y) coordinates, maximizing
    both (callers pre-apply direction signs). One sort + cummax."""
    if pdf.empty:
        return pdf
    # within equal x only the max y can survive; then walking x
    # descending, keep y strictly above the best y of any greater x
    g = pdf.groupby("_x")["_y"].max().sort_index(ascending=False)
    cm = g.cummax().shift(1)
    keep = g > cm.fillna(-np.inf)
    f = g[keep]
    return pd.DataFrame({"_x": f.index.to_numpy(), "_y": f.to_numpy()})


def skyline(df: DataFrame, *, x: str, y: str,
            maximize_x: bool = True, maximize_y: bool = True) -> DataFrame:
    """All rows of ``df`` on the 2D Pareto frontier of ``(x, y)``.

    Ties: exact coordinate duplicates dominate neither each other nor
    anything a single copy would not — every row carrying a frontier
    coordinate is returned. Rows with a NULL criterion are excluded
    (dominance is undefined for them).
    """
    sx, sy = (1 if maximize_x else -1), (1 if maximize_y else -1)
    pts = (df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
             .select((F.col(x) * sx).alias("_x"),
                     (F.col(y) * sy).alias("_y"))
             .distinct())

    def local(it):
        # per-BATCH frontier is a valid (superset) filter — Arrow may
        # split a partition into several batches and that's fine here
        for pdf in it:
            yield _frontier(pdf)

    def global_exact(it):
        # the exact frontier needs ALL surviving candidates at once:
        # concatenate the partition's batches BEFORE pruning (a
        # per-batch prune could keep a point dominated from another
        # batch). Memory is bounded by the candidate set, not the data.
        pdfs = [p for p in it if len(p)]
        if pdfs:
            yield _frontier(pd.concat(pdfs, ignore_index=True))

    cand = pts.mapInPandas(local, pts.schema)
    # union of per-partition frontiers is small by construction —
    # one explicit single-partition pass computes the exact frontier
    glob = cand.repartition(1).mapInPandas(global_exact, pts.schema)
    win = glob.select((F.col("_x") * sx).alias("_x"),
                      (F.col("_y") * sy).alias("_y"))
    return df.join(F.broadcast(win),
                   (F.col(x) == F.col("_x")) & (F.col(y) == F.col("_y")),
                   "left_semi")
