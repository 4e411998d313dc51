"""Hilbert space-filling-curve index — locality-preserving write layout.

The cell scheme (``core/cells.py``) keys shuffles with Morton (Z-order)
interleaving, which is the right trade for *join keys* (parent/child by
bit shifts). For *write layout* — the reference's ``ingest`` clusters
rows by cell before writing (``cdap_geo/write.py:57-88``) so that
spatially-close rows land in the same files — Hilbert order is strictly
better: consecutive Hilbert indices are always grid-adjacent (unit
steps, no Z-order jumps across the map), so range-partitioning by the
Hilbert key gives every output file a compact spatial footprint and
min/max column statistics that actually prune.

Algorithm: the standard per-bit rotate/reflect walk (Hilbert 1891; the
public-domain formulation on the Wikipedia "Hilbert curve" page) over
``order`` bit levels:

    for s in 2^(order-1) .. 1:
        rx = (x & s) > 0;  ry = (y & s) > 0
        d += s*s * ((3*rx) XOR ry)
        if ry == 0:
            if rx == 1: x, y = n-1-x, n-1-y     # reflect
            x, y = y, x                          # transpose

Execution shape: the loop unrolls into ``order`` chained narrow
``Project`` stages of pure integer Column arithmetic — no UDF, no
shuffle, whole-stage codegen end to end. (Catalyst does NOT collapse
the chain into one exponential expression: ``CollapseProject`` refuses
to inline a non-cheap alias referenced more than once, and every
``x_i``/``y_i`` CASE is referenced by rx, the reflection and the swap
of the next level.) Everything is exact int64 — bit-identical in any
engine — so the DuckDB oracle twin is a recursive CTE running the same
recurrence.

At 100 TB: ``hilbert_repartition`` is one ``repartitionByRange`` on the
map-side-computed key — a single range exchange (sampled boundaries),
exactly the shuffle a clustered write must pay, and files come out with
tight bboxes for downstream partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hilbert_index", "hilbert_repartition", "hilbert_oracle_sql",
           "hilbert_py"]


def hilbert_index(df: DataFrame, *, order: int,
                  x_col: str = "x", y_col: str = "y",
                  out_col: str = "h") -> DataFrame:
    """Add the Hilbert-curve distance ``out_col`` of integer grid
    coordinates ``(x_col, y_col)`` on the ``2**order × 2**order`` grid.

    Inputs must be integers in ``[0, 2**order)`` (raise-free: the bit
    walk simply ignores higher bits; callers quantize first). Pure
    map-side — ``order`` chained Projects, zero exchanges.
    """
    if not (1 <= order <= 31):
        raise ValueError("hilbert_index: order must be in [1, 31]")
    n = 1 << order
    out = df.select("*",
                    F.col(x_col).cast("long").alias("_hx"),
                    F.col(y_col).cast("long").alias("_hy"),
                    F.lit(0).cast("long").alias("_hd"))
    for i in range(order - 1, -1, -1):
        s = 1 << i
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)) \
              .otherwise(F.lit(0)).cast("long")
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)) \
              .otherwise(F.lit(0)).cast("long")
        d2 = (d + F.lit(s * s).cast("long")
              * (F.lit(3) * rx).bitwiseXOR(ry)).alias("_hd")
        # if ry==0: reflect (when rx==1) then transpose; else unchanged
        x2 = F.when(ry == 0,
                    F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)) \
              .otherwise(x).alias("_hx")
        y2 = F.when(ry == 0,
                    F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)) \
              .otherwise(y).alias("_hy")
        keep = [c for c in out.columns if c not in ("_hx", "_hy", "_hd")]
        out = out.select(*keep, x2, y2, d2)
    return out.withColumnRenamed("_hd", out_col).drop("_hx", "_hy")


def hilbert_repartition(df: DataFrame, *, order: int, num_partitions: int,
                        x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Range-repartition by the Hilbert key — the clustered-write
    layout: ONE range exchange; every output partition covers a
    contiguous Hilbert run, i.e. a spatially compact blob whose
    parquet min/max stats prune. The key column is kept (``_hilbert``)
    so writers can also sortWithinPartitions on it."""
    keyed = hilbert_index(df, order=order, x_col=x_col, y_col=y_col,
                          out_col="_hilbert")
    return keyed.repartitionByRange(num_partitions, F.col("_hilbert"))


def hilbert_py(order: int, x: int, y: int) -> int:
    """Pure-python reference twin (tests)."""
    n = 1 << order
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_oracle_sql(points_sql: str, *, order: int,
                       id_col: str = "doc_id") -> str:
    """ANSI/DuckDB twin of :func:`hilbert_index`: a recursive CTE
    running the identical integer recurrence (exact int64 throughout ⇒
    hash-identical). ``points_sql`` must yield (id_col, x, y)."""
    n = 1 << order
    return f"""
      WITH RECURSIVE hseq AS (
        SELECT {id_col}, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
               CAST(0 AS BIGINT) AS d, {order - 1} AS i
        FROM ({points_sql})
        UNION ALL
        SELECT {id_col},
               CASE WHEN ry = 0 THEN
                      CASE WHEN rx = 1 THEN {n - 1} - y ELSE y END
                    ELSE x END,
               CASE WHEN ry = 0 THEN
                      CASE WHEN rx = 1 THEN {n - 1} - x ELSE x END
                    ELSE y END,
               d + s * s * xor(3 * rx, ry),
               i - 1
        FROM (
          SELECT {id_col}, x, y, d, i,
                 (CAST(1 AS BIGINT) << i) AS s,
                 CASE WHEN (x & (CAST(1 AS BIGINT) << i)) > 0
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                 END AS rx,
                 CASE WHEN (y & (CAST(1 AS BIGINT) << i)) > 0
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                 END AS ry
          FROM hseq WHERE i >= 0
        )
      )
      SELECT {id_col}, d AS h FROM hseq WHERE i = -1
    """
