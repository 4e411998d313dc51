"""Mergeable sketches (HyperLogLog / count-min / histogram) as relations.

``approx_count_distinct`` exists in Spark, but its HLL++ register
layout is opaque (not readable, not joinable, not oracle-checkable) and
DuckDB's implementation is a different sketch entirely — the two can
never hash-match. This module implements classic HyperLogLog (Flajolet
et al. 2007) from public formulas with every ingredient DETERMINISTIC
and expressible in both engines:

* hash   = 60-bit md5 prefix (the repo-wide portable-hash idiom);
* bucket = top ``p`` hash bits, rank = leading zeros of the remaining
  ``w = 60 - p`` bits + 1;
* the harmonic sum ``S = Σ 2^-M_j`` is computed EXACTLY as the integer
  ``Σ 2^(w+1-M_j)`` (every term dyadic, max ``m * 2^w`` < 2^63) — no
  floating-point accumulation order to disagree about;
* the final estimate is one straight-line double expression, rounded,
  with the standard small-range (linear-counting) correction.

The sketch RELATION (group, bucket, max_rank) is the mergeable object:
union two relations and re-``max`` per bucket to merge sketches —
that is exactly how a 100 TB corpus folds per-partition sketches into
one estimate with a shuffle bounded by ``groups x m`` rows, never by
the data. Reference analogue: none (beyond-parity pipeline operator).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

#: HLL bias-correction constant for m >= 128 (Flajolet et al. 2007).
def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def _hash60(value_col):
    return F.conv(F.substring(F.md5(value_col), 1, 15), 16, 10) \
        .cast("long")


def hll_relation(df: DataFrame, *, value_col: str,
                 group_cols: list[str] | None = None,
                 p: int = 9) -> DataFrame:
    """The mergeable HLL sketch relation: one row per (group, bucket)
    carrying ``max_rank``. Map-side partial ``max`` collapses each
    input partition to <= ``groups * 2^p`` rows before the exchange.
    Merge two sketch relations with ``unionByName`` + re-aggregation
    by ``F.max`` (pytest pins merge == sketch-of-union).
    """
    if not 4 <= p <= 16:
        raise ValueError("hll_relation: p must be in [4, 16]")
    g = list(group_cols or [])
    w = 60 - p
    h = _hash60(F.col(value_col))
    bucket = F.shiftright(h, w)
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    bitlen = F.when(rem > 0,
                    F.length(F.conv(rem.cast("string"), 10, 2))
                    .cast("int")).otherwise(F.lit(0))
    rank = (F.lit(w + 1) - bitlen).cast("int")
    return (df.where(F.col(value_col).isNotNull())
              .select(*g, bucket.alias("bucket"), rank.alias("rank"))
              .groupBy(*g, "bucket")
              .agg(F.max("rank").alias("max_rank")))


def hll_estimate(df: DataFrame, *, value_col: str,
                 group_cols: list[str] | None = None,
                 p: int = 9, round_dp: int = 4) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (standard error
    ~1.04/sqrt(2^p)): the sketch relation folded through the exact
    dyadic-integer harmonic sum, bias constant, and the linear-counting
    small-range correction, rounded to ``round_dp`` so last-ulp libm
    differences between engines cannot flip the value hash.
    Emits ``n_filled`` (occupied buckets) alongside ``est_distinct``.
    """
    g = list(group_cols or [])
    m = 1 << p
    w = 60 - p
    rel = hll_relation(df, value_col=value_col, group_cols=g, p=p)
    # exact integer term 2^(w+1-max_rank); max_rank in [1, w+1]
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                  f"CAST({w + 1} - max_rank AS INT))")
    agg = rel.groupBy(*g).agg(F.sum(term).alias("s0"),
                              F.count(F.lit(1)).alias("n_filled"))
    full = float(_alpha(m)) * m * m * float(1 << (w + 1))
    s = (F.col("s0")
         + (F.lit(m) - F.col("n_filled")) * F.lit(float(1 << (w + 1))))
    e_raw = F.lit(full) / s
    zeros = F.lit(m) - F.col("n_filled")
    e = F.when((e_raw <= F.lit(2.5 * m)) & (zeros > 0),
               F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)) \
         .otherwise(e_raw)
    return agg.select(*g,
                      F.round(e, round_dp).alias("est_distinct"),
                      F.col("n_filled").cast("long").alias("n_filled"))


def hll_oracle_sql(*, table_expr: str, value_expr: str,
                   group_exprs: list[tuple[str, str]] | None = None,
                   p: int = 9, round_dp: int = 4) -> str:
    """The DuckDB twin of :func:`hll_estimate`, generated from the SAME
    constants (the bias numerator is embedded as the Python-computed
    double literal, so both engines divide the identical number)."""
    g = group_exprs or []
    m = 1 << p
    w = 60 - p
    full = repr(_alpha(m) * m * m * float(1 << (w + 1)))
    sel_g = "".join(f"{expr} AS {name}, " for name, expr in g)
    out_g = "".join(f"{name}, " for name, _ in g)
    by_g = ", ".join(name for name, _ in g)
    grp_bucket = f"GROUP BY {by_g}, bucket" if by_g else "GROUP BY bucket"
    grp_outer = f"GROUP BY {by_g}" if by_g else ""
    return f"""
      WITH h AS (
        SELECT {sel_g}
               CAST(concat('0x', substr(md5({value_expr}), 1, 15))
                    AS BIGINT) AS hv
        FROM {table_expr}
        WHERE {value_expr} IS NOT NULL
      ), r AS (
        SELECT {out_g} hv >> {w} AS bucket,
               CASE WHEN hv % {1 << w} > 0
                    THEN {w + 1} - length(bin(hv % {1 << w}))
                    ELSE {w + 1} END AS rank
        FROM h
      ), s AS (
        SELECT {out_g} bucket, MAX(rank) AS max_rank
        FROM r {grp_bucket}
      ), t AS (
        SELECT {out_g}
               SUM(CAST(1 AS BIGINT) << ({w + 1} - max_rank)) AS s0,
               COUNT(*) AS n_filled
        FROM s {grp_outer}
      )
      SELECT {out_g}
             ROUND(CASE WHEN {full} / (s0 + ({m} - n_filled)
                                             * {float(1 << (w + 1))!r})
                             <= {2.5 * m}
                         AND ({m} - n_filled) > 0
                    THEN {float(m)!r} * ln({float(m)!r}
                                           / ({m} - n_filled))
                    ELSE {full} / (s0 + ({m} - n_filled)
                                         * {float(1 << (w + 1))!r})
                    END, {round_dp}) AS est_distinct,
             CAST(n_filled AS BIGINT) AS n_filled
      FROM t
    """
