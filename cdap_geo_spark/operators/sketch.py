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


def hll_bucket_rank(value, p: int):
    """(bucket, rank) column pair for one value expression — the HLL
    map-side ingredients, exposed so other relations (e.g. streaming
    event windows) can build sketch relations with their own grouping."""
    if not 4 <= p <= 16:
        raise ValueError("hll: p must be in [4, 16]")
    w = 60 - p
    h = _hash60(value)
    bucket = F.shiftright(h, w)
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    bitlen = F.when(rem > 0,
                    F.length(F.conv(rem.cast("string"), 10, 2))
                    .cast("int")).otherwise(F.lit(0))
    rank = (F.lit(w + 1) - bitlen).cast("int")
    return bucket, rank


def hll_relation(df: DataFrame, *, value_col: str,
                 group_cols: list[str] | None = None,
                 p: int = 9) -> DataFrame:
    """The mergeable HLL sketch relation: one row per (group, bucket)
    carrying ``max_rank``. Map-side partial ``max`` collapses each
    input partition to <= ``groups * 2^p`` rows before the exchange.
    Merge two sketch relations with ``unionByName`` + re-aggregation
    by ``F.max`` (pytest pins merge == sketch-of-union).
    """
    g = list(group_cols or [])
    bucket, rank = hll_bucket_rank(F.col(value_col), p)
    return (df.where(F.col(value_col).isNotNull())
              .select(*g, bucket.alias("bucket"), rank.alias("rank"))
              .groupBy(*g, "bucket")
              .agg(F.max("rank").alias("max_rank")))


def hll_estimate(df: DataFrame, *, value_col: str,
                 group_cols: list[str] | None = None,
                 p: int = 9, round_dp: int = 4) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (standard error
    ~1.04/sqrt(2^p)): :func:`hll_relation` folded through
    :func:`hll_finalize`."""
    rel = hll_relation(df, value_col=value_col,
                       group_cols=group_cols, p=p)
    return hll_finalize(rel, group_cols=group_cols, p=p,
                        round_dp=round_dp)


def hll_merge(rel: DataFrame, *, group_cols_out: list[str] | None = None
              ) -> DataFrame:
    """Merge HLL sketch relations by re-``max`` per (group, bucket) —
    THE mergeability operation that makes the sketch a 100 TB citizen:
    per-partition / per-day / per-source sketches fold into any coarser
    grouping (``group_cols_out`` ⊆ the relation's group columns; pass
    ``[]``/``None`` to collapse everything into one global sketch)
    with a shuffle bounded by ``groups_out × 2^p`` rows, never by the
    data. Exact, not approximate-on-approximate: max is idempotent,
    commutative and associative, so the merged relation is IDENTICAL
    to the sketch built over the unioned raw data (pytest pins it, and
    the ``hll_union`` oracle hash-checks it against an independent
    engine that sketches the raw union directly).

    Input may be one relation or a ``unionByName`` of several (the
    caller unions; this folds). Output schema matches
    :func:`hll_relation`, ready for :func:`hll_finalize`.
    """
    g = list(group_cols_out or [])
    return (rel.groupBy(*g, "bucket")
               .agg(F.max("max_rank").alias("max_rank")))


def hll_finalize(rel: DataFrame, *, group_cols: list[str] | None = None,
                 p: int = 9, round_dp: int = 4) -> DataFrame:
    """Estimates from an EXISTING sketch relation (columns: groups +
    bucket + max_rank) — the read-time half of the mergeable design:
    sinks store sketch relations, consumers finalize. The sketch folds
    through the exact dyadic-integer harmonic sum, bias constant, and
    the linear-counting small-range correction, rounded to
    ``round_dp`` so last-ulp libm differences between engines cannot
    flip the value hash. Emits ``n_filled`` (occupied buckets)
    alongside ``est_distinct``.
    """
    g = list(group_cols or [])
    m = 1 << p
    w = 60 - p
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


def kmv_relation(df: DataFrame, *, value_col: str, group_col: str,
                 k: int = 256) -> DataFrame:
    """Bottom-k (KMV / k-minimum-values, Bar-Yossef et al. 2002)
    sketch relation: per group, the ``k`` smallest 60-bit md5 hashes
    of the distinct values — the sketch that, unlike HLL, supports
    SET-INTERSECTION and Jaccard estimates between groups
    (:func:`kmv_pairwise`). One row per (group, hash), ≤ k per group.

    Scale: the raw relation collapses to the DISTINCT (group, hash)
    relation in one keyed aggregation (map-side partials bound the
    exchange by distinct values, not rows); the per-group bottom-k is
    one ranking window over that reduced relation. Merge sketches by
    union + re-bottom-k (pytest pins merge == sketch-of-union).
    """
    if k < 2:
        raise ValueError("kmv_relation: k must be >= 2")
    from pyspark.sql import Window
    h = _hash60(F.col(value_col))
    dist = (df.where(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("g"), h.alias("h"))
            .distinct())
    rn = F.row_number().over(Window.partitionBy("g").orderBy("h"))
    return dist.withColumn("_rn", rn).where(F.col("_rn") <= k) \
               .select("g", "h")


def kmv_pairwise(rel: DataFrame, *, k: int = 256,
                 round_dp: int = 0) -> DataFrame:
    """Pairwise set-overlap estimates from a :func:`kmv_relation`
    sketch: for every group pair ``ga < gb`` returns
    ``(ga, gb, jaccard_micro, est_union, est_inter)``.

    The estimator (classic KMV): take the union of the two bottom-k
    sets, keep ITS bottom-k; with ``rho`` = the k-th smallest union
    hash and ``c`` = how many of those k hashes sit in BOTH sketches,
    ``est_union = (k-1)·2^60 / rho`` and ``est_inter = c·est_union/k``
    (J = c/k). When the union sketch holds fewer than k hashes the
    sketch IS the exact distinct set, and the exact counts are used
    (the small-range branch, mirrored in the SQL twin).

    Determinism: hashes are exact BIGINTs; each estimate is ONE double
    expression over exact integers with the identical literal shape in
    both engines, rounded before emission. The pair fan-out is
    groups², each pair carrying ≤ 2k sketch rows — dimension-sized,
    never data-sized.
    """
    if k < 2:
        raise ValueError("kmv_pairwise: k must be >= 2")
    from pyspark.sql import Window
    a = rel.select(F.col("g").alias("ga"), "h")
    b = rel.select(F.col("g").alias("gb"), "h")
    pairs = (a.select("ga").distinct()
             .join(b.select("gb").distinct(),
                   F.col("ga") < F.col("gb")))
    tagged = (pairs.join(a, "ga")
              .select("ga", "gb", "h", F.lit(1).alias("in_a"),
                      F.lit(0).alias("in_b"))
              .unionByName(
                  pairs.join(b, "gb")
                  .select("ga", "gb", "h", F.lit(0).alias("in_a"),
                          F.lit(1).alias("in_b"))))
    u = (tagged.groupBy("ga", "gb", "h")
         .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    rn = F.row_number().over(
        Window.partitionBy("ga", "gb").orderBy("h"))
    topk = u.withColumn("_rn", rn).where(F.col("_rn") <= k)
    agg = (topk.groupBy("ga", "gb")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.max("h").alias("rho"),
                F.sum((F.col("in_a") * F.col("in_b")).cast("long"))
                 .alias("c")))
    two60 = float(1 << 60)
    est_union = F.when(
        F.col("cnt") < k, F.col("cnt").cast("double")) \
        .otherwise(F.round((F.lit(float(k - 1)) * F.lit(two60))
                           / F.col("rho").cast("double")))
    agg = agg.withColumn("est_union", est_union.cast("long"))
    jac = F.round(F.lit(1_000_000.0) * F.col("c")
                  / F.least(F.col("cnt"), F.lit(k))).cast("long")
    inter = F.round((F.col("c").cast("double") * F.col("est_union"))
                    / F.least(F.col("cnt"), F.lit(k))).cast("long")
    return agg.select("ga", "gb", jac.alias("jaccard_micro"),
                      "est_union", inter.alias("est_inter"))


def kmv_oracle_sql(*, table_expr: str, value_expr: str,
                   group_expr: str, k: int = 256) -> str:
    """ANSI-SQL twin of :func:`kmv_relation` + :func:`kmv_pairwise`
    over one table: the same md5 hashes, the same bottom-k windows,
    and the identical estimate expression shapes."""
    two60 = repr(float(1 << 60))
    return f"""
      WITH dist AS (
        SELECT DISTINCT {group_expr} AS g,
               CAST(concat('0x', substr(md5({value_expr}), 1, 15))
                    AS BIGINT) AS h
        FROM {table_expr} WHERE {value_expr} IS NOT NULL
      ), sk AS (
        SELECT g, h FROM (
          SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g
                                          ORDER BY h) AS rn
          FROM dist
        ) WHERE rn <= {k}
      ), gs AS (SELECT DISTINCT g FROM sk),
      pr AS (
        SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g
      ), tagged AS (
        SELECT pr.ga, pr.gb, sk.h, 1 AS in_a, 0 AS in_b
        FROM pr JOIN sk ON sk.g = pr.ga
        UNION ALL
        SELECT pr.ga, pr.gb, sk.h, 0, 1
        FROM pr JOIN sk ON sk.g = pr.gb
      ), u AS (
        SELECT ga, gb, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
        FROM tagged GROUP BY ga, gb, h
      ), topk AS (
        SELECT * FROM (
          SELECT ga, gb, h, in_a, in_b,
                 ROW_NUMBER() OVER (PARTITION BY ga, gb
                                    ORDER BY h) AS rn
          FROM u
        ) WHERE rn <= {k}
      ), agg AS (
        SELECT ga, gb, COUNT(*) AS cnt, MAX(h) AS rho,
               SUM(CAST(in_a * in_b AS BIGINT)) AS c
        FROM topk GROUP BY ga, gb
      ), est AS (
        SELECT ga, gb, cnt, c,
               CAST(CASE WHEN cnt < {k} THEN CAST(cnt AS DOUBLE)
                    ELSE ROUND(({float(k - 1)!r} * {two60})
                               / CAST(rho AS DOUBLE)) END AS BIGINT)
                 AS est_union
        FROM agg
      )
      SELECT ga, gb,
             CAST(ROUND(1000000.0 * c / LEAST(cnt, {k})) AS BIGINT)
               AS jaccard_micro,
             est_union,
             CAST(ROUND((CAST(c AS DOUBLE) * est_union)
                        / LEAST(cnt, {k})) AS BIGINT) AS est_inter
      FROM est
    """


def _q_name(q: float) -> str:
    """0.5 -> q50, 0.9 -> q90, 0.99 -> q99, 0.999 -> q999."""
    frac = str(q)[2:]
    return "q" + (frac.ljust(2, "0") if len(frac) < 2 else frac)


def cms_relation(df: DataFrame, *, value_col: str,
                 group_cols: list[str] | None = None,
                 depth: int = 4, width: int = 512) -> DataFrame:
    """Count-min sketch as a relation: one row per (group, hrow,
    bucket) carrying ``cnt`` (Cormode & Muthukrishnan 2005). Hash row
    ``i``'s bucket is the 60-bit md5 prefix of ``'{i}:{value}'`` mod
    ``width`` — deterministic and cross-engine, the same portable-hash
    idiom as :func:`hll_relation`. The explode multiplies rows by
    ``depth`` BEFORE the partial aggregate, which collapses each input
    partition to <= ``groups * depth * width`` rows — the exchange is
    bounded by the sketch size, never the data. Merge two sketch
    relations with ``unionByName`` + re-``sum`` per (group, hrow,
    bucket) (pytest pins merge == sketch-of-union).
    Reference analogue: none (beyond-parity pipeline operator).
    """
    if depth < 1 or width < 2:
        raise ValueError("cms_relation: need depth >= 1, width >= 2")
    g = list(group_cols or [])
    base = (df.where(F.col(value_col).isNotNull())
              .select(*g, F.col(value_col).alias("_v"),
                      F.explode(F.array(*[F.lit(i) for i in range(depth)]))
                       .alias("hrow")))
    h = _hash60(F.concat_ws(":", F.col("hrow").cast("string"),
                            F.col("_v")))
    return (base.select(*g, "hrow", (h % F.lit(width)).alias("bucket"))
                .groupBy(*g, "hrow", "bucket")
                .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(rel: DataFrame, probes: DataFrame, *, value_col: str,
                 group_cols: list[str] | None = None,
                 depth: int = 4, width: int = 512) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_relation` sketch:
    for each distinct probe value, ``est_count = min_i cnt[i, h_i(v)]``
    (an upper bound on the true count; never an undercount). The probe
    side is distinct-reduced and exploded by ``depth`` — when the probe
    set is small AQE broadcasts it; the sketch relation itself is at
    most ``groups * depth * width`` rows, so the join never scales with
    the corpus. Unseen buckets count as 0 via the left join.
    """
    g = list(group_cols or [])
    p = (probes.where(F.col(value_col).isNotNull())
               .select(*g, F.col(value_col).alias("_v")).distinct())
    pe = p.select(*g, "_v",
                  F.explode(F.array(*[F.lit(i) for i in range(depth)]))
                   .alias("hrow"))
    h = _hash60(F.concat_ws(":", F.col("hrow").cast("string"),
                            F.col("_v")))
    pe = pe.withColumn("bucket", h % F.lit(width))
    joined = pe.join(rel, on=g + ["hrow", "bucket"], how="left")
    return (joined.groupBy(*g, "_v")
                  .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                        .alias("est_count"))
                  .select(*g, F.col("_v").alias(value_col),
                          F.col("est_count").cast("long")
                           .alias("est_count")))


def cms_oracle_sql(*, table_expr: str, value_expr: str,
                   probe_filter: str, depth: int = 4,
                   width: int = 512) -> str:
    """DuckDB twin of ``cms_relation`` + ``cms_estimate`` over an
    ungrouped token stream: ``table_expr`` must yield rows
    ``(tok, probe_flag)``; the sketch is built over every tok and
    probed with the distinct toks where ``probe_filter`` holds."""
    return f"""
      WITH hr AS (SELECT CAST(unnest(range({depth})) AS INT) AS hrow),
      rel AS (
        SELECT hrow,
               CAST(concat('0x', substr(md5(concat(hrow, ':', tok)),
                                        1, 15)) AS BIGINT)
                 % {width} AS bucket,
               COUNT(*) AS cnt
        FROM ({table_expr}) CROSS JOIN hr
        GROUP BY 1, 2
      ), probes AS (
        SELECT DISTINCT tok FROM ({table_expr}) WHERE {probe_filter}
      ), pe AS (
        SELECT p.tok, h.hrow,
               CAST(concat('0x', substr(md5(concat(h.hrow, ':', p.tok)),
                                        1, 15)) AS BIGINT)
                 % {width} AS bucket
        FROM probes p CROSS JOIN hr h
      )
      SELECT pe.tok AS {value_expr},
             CAST(MIN(COALESCE(rel.cnt, 0)) AS BIGINT) AS est_count
      FROM pe LEFT JOIN rel USING (hrow, bucket)
      GROUP BY pe.tok
    """


def bloom_relation(df: DataFrame, *, value_col: str,
                   group_cols: list[str] | None = None,
                   m_bits: int = 4096, k: int = 4) -> DataFrame:
    """Bloom filter as a relation: the distinct set bits, one row per
    (group, bit) (Bloom 1970). Bit ``i`` of a value is the 60-bit md5
    prefix of ``'{i}:{value}'`` mod ``m_bits`` — the same portable-hash
    idiom as the other sketches, so a DuckDB oracle sets the identical
    bits. The relation is bounded by ``groups * m_bits`` rows whatever
    the corpus size (distinct-aggregated map-side first); merge two
    filters with ``unionByName`` + ``dropDuplicates`` (pytest pins
    merge == sketch-of-union).
    Reference analogue: none (beyond-parity pipeline operator).
    """
    if k < 1 or m_bits < 2:
        raise ValueError("bloom_relation: need k >= 1, m_bits >= 2")
    g = list(group_cols or [])
    base = (df.where(F.col(value_col).isNotNull())
              .select(*g, F.col(value_col).alias("_v"),
                      F.explode(F.array(*[F.lit(i) for i in range(k)]))
                       .alias("hrow")))
    h = _hash60(F.concat_ws(":", F.col("hrow").cast("string"),
                            F.col("_v")))
    return (base.select(*g, (h % F.lit(m_bits)).alias("bit"))
                .dropDuplicates(g + ["bit"]))


def bloom_contains(rel: DataFrame, probes: DataFrame, *,
                   value_col: str, group_cols: list[str] | None = None,
                   m_bits: int = 4096, k: int = 4) -> DataFrame:
    """Membership probe against a :func:`bloom_relation`: ``contains``
    is true iff ALL ``k`` probe bits are set (false positives possible
    at the standard Bloom rate, never false negatives — pytest-pinned).
    The filter side is at most ``groups * m_bits`` rows, so AQE
    broadcasts it under any realistic sizing; the probe side never
    shuffles more than (probe, bit) pairs."""
    g = list(group_cols or [])
    p = (probes.where(F.col(value_col).isNotNull())
               .select(*g, F.col(value_col).alias("_v")).distinct())
    pe = p.select(*g, "_v",
                  F.explode(F.array(*[F.lit(i) for i in range(k)]))
                   .alias("hrow"))
    h = _hash60(F.concat_ws(":", F.col("hrow").cast("string"),
                            F.col("_v")))
    pe = pe.withColumn("bit", h % F.lit(m_bits)).drop("hrow")
    hit = pe.join(rel, on=g + ["bit"], how="left_semi")
    counted = (pe.groupBy(*g, "_v").agg(F.count(F.lit(1)).alias("_nb"))
                 .join(hit.groupBy(*g, "_v")
                          .agg(F.count(F.lit(1)).alias("_hits")),
                       on=g + ["_v"], how="left"))
    return counted.select(
        *g, F.col("_v").alias(value_col),
        (F.coalesce(F.col("_hits"), F.lit(0)) == F.col("_nb"))
         .alias("contains"))


def bloom_oracle_sql(*, table_expr: str, value_expr: str,
                     probe_expr: str, m_bits: int = 4096,
                     k: int = 4) -> str:
    """DuckDB twin of ``bloom_relation`` + ``bloom_contains``:
    ``table_expr`` yields the member rows ``(tok)``, ``probe_expr``
    the probe rows ``(tok)``; output (token, contains)."""
    return f"""
      WITH hr AS (SELECT CAST(unnest(range({k})) AS INT) AS hrow),
      rel AS (
        SELECT DISTINCT
               CAST(concat('0x', substr(md5(concat(hrow, ':', tok)),
                                        1, 15)) AS BIGINT)
                 % {m_bits} AS bit
        FROM ({table_expr}) CROSS JOIN hr
      ), probes AS (
        SELECT DISTINCT tok FROM ({probe_expr})
      ), pe AS (
        SELECT p.tok,
               CAST(concat('0x', substr(md5(concat(h.hrow, ':', p.tok)),
                                        1, 15)) AS BIGINT)
                 % {m_bits} AS bit
        FROM probes p CROSS JOIN hr h
      )
      SELECT pe.tok AS {value_expr},
             COUNT(*) FILTER (rel.bit IS NOT NULL) = COUNT(*)
               AS contains
      FROM pe LEFT JOIN rel USING (bit)
      GROUP BY pe.tok
    """


def hist_relation(df: DataFrame, *, value_col: str,
                  group_cols: list[str] | None = None,
                  lo: float, hi: float, nbins: int) -> DataFrame:
    """Fixed-bin histogram as a relation: one row per (group, bin)
    carrying ``cnt``; out-of-range values clamp to the edge bins. The
    partial aggregate collapses each partition to <= ``groups * nbins``
    rows before the exchange; merge = union + re-``sum``. The bin edge
    arithmetic is one multiply-add on literal doubles, so a DuckDB twin
    reproduces it bit-exactly.
    Reference analogue: none (beyond-parity pipeline operator).
    """
    if not (nbins >= 1 and hi > lo):
        raise ValueError("hist_relation: need nbins >= 1 and hi > lo")
    g = list(group_cols or [])
    step = (hi - lo) / nbins
    raw = F.floor((F.col(value_col).cast("double") - F.lit(float(lo)))
                  / F.lit(float(step)))
    b = F.greatest(F.lit(0), F.least(F.lit(nbins - 1), raw)).cast("int")
    return (df.where(F.col(value_col).isNotNull())
              .select(*g, b.alias("bin"))
              .groupBy(*g, "bin")
              .agg(F.count(F.lit(1)).alias("cnt")))


def hist_quantiles(df: DataFrame, *, value_col: str,
                   group_cols: list[str] | None = None,
                   lo: float, hi: float, nbins: int,
                   qs: tuple = (0.5, 0.9, 0.99),
                   round_dp: int = 6) -> DataFrame:
    """Per-group quantile estimates from the fixed-bin histogram: the
    estimate for ``q`` is the LOWER EDGE of the first bin whose
    cumulative count reaches ``ceil(q * n)`` (a deterministic rule —
    no interpolation ambiguity for a cross-engine oracle; error is
    bounded by one bin width). The cumulative window runs over the
    histogram relation (<= ``groups * nbins`` rows), not the data, so
    the sort is sketch-sized at any corpus scale.
    """
    from pyspark.sql import Window
    g = list(group_cols or [])
    step = (hi - lo) / nbins
    rel = hist_relation(df, value_col=value_col, group_cols=g,
                        lo=lo, hi=hi, nbins=nbins)
    w = (Window.partitionBy(*[F.col(c) for c in g]) if g
         else Window.partitionBy(F.lit(1)))
    cum = F.sum("cnt").over(w.orderBy("bin")
                             .rowsBetween(Window.unboundedPreceding, 0))
    n = F.sum("cnt").over(w.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    rel = rel.select(*g, "bin", cum.alias("cum"), n.alias("n"))
    aggs = [F.max("n").alias("n")]
    names = []
    for q in qs:
        name = _q_name(q)
        names.append(name)
        aggs.append(F.min(F.when(
            F.col("cum") >= F.ceil(F.lit(float(q)) * F.col("n")),
            F.col("bin"))).alias(f"_qbin_{name}"))
    out = rel.groupBy(*g).agg(*aggs)
    for name in names:
        out = out.withColumn(
            name, F.round(F.lit(float(lo))
                          + F.col(f"_qbin_{name}").cast("double")
                          * F.lit(float(step)), round_dp))
    return out.select(*g, F.col("n").cast("long").alias("n"), *names)


def hist_quantiles_oracle_sql(*, table_expr: str, value_expr: str,
                              group_exprs: list[tuple[str, str]],
                              lo: float, hi: float, nbins: int,
                              qs: tuple = (0.5, 0.9, 0.99),
                              round_dp: int = 6) -> str:
    """DuckDB twin of :func:`hist_quantiles` (same literal edge
    arithmetic, same first-bin-at-ceil rule)."""
    g = group_exprs
    step = (hi - lo) / nbins
    sel_g = "".join(f"{expr} AS {name}, " for name, expr in g)
    out_g = "".join(f"{name}, " for name, _ in g)
    by_g = ", ".join(name for name, _ in g)
    part = f"PARTITION BY {by_g}" if by_g else ""
    grp = f"GROUP BY {by_g}" if by_g else ""
    q_cols = []
    for q in qs:
        name = _q_name(q)
        q_cols.append(
            f"ROUND({lo!r} + CAST(MIN(CASE WHEN cum >= "
            f"CEIL({float(q)!r} * n) THEN bin END) AS DOUBLE)"
            f" * {step!r}, {round_dp}) AS {name}")
    return f"""
      WITH b AS (
        SELECT {sel_g}
               CAST(GREATEST(0, LEAST({nbins - 1},
                 FLOOR((CAST({value_expr} AS DOUBLE) - {lo!r})
                       / {step!r}))) AS INT) AS bin
        FROM {table_expr}
        WHERE {value_expr} IS NOT NULL
      ), h AS (
        SELECT {out_g} bin, COUNT(*) AS cnt FROM b
        GROUP BY {(by_g + ", bin") if by_g else "bin"}
      ), c AS (
        SELECT {out_g} bin,
               SUM(cnt) OVER ({part} ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER ({part}) AS n
        FROM h
      )
      SELECT {out_g} CAST(MAX(n) AS BIGINT) AS n, {", ".join(q_cols)}
      FROM c {grp}
    """


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
