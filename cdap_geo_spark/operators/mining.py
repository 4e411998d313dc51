"""Frequent-pattern mining: association rules over basket relations.

The classic market-basket analysis (Agrawal & Srikant 1994's output
shape — support / confidence / lift — without the Apriori candidate
ladder, which a 2-itemset rule mining doesn't need): given a relation
of (basket, item) facts, find the top-k directed rules ``a → b``
ranked by lift. Reference analogue: none (beyond-parity pipeline
operator; the reference has no mining surface).

Distributed shape (the 100 TB story):

* the raw facts collapse to the DISTINCT (basket, item) presence
  relation in one keyed aggregation — map-side partials mean the
  exchange carries presence rows, not raw events;
* pair supports come from the per-basket self-join under ``x < y`` —
  quadratic ONLY in distinct items per basket (inherent to 2-itemset
  co-occurrence; same bound as ``text.pmi_pairs``), never in baskets
  or corpus rows;
* item marginals are an item-dimension relation and the basket count
  a 1-row aggregate — both broadcast onto the pair relation by AQE;
* the final ranking is a bounded TakeOrdered (top-k), never a global
  sort of all rules.

Cross-engine exactness: every support is an exact BIGINT; confidence
and lift are each ONE double expression over exact integer products,
written with the identical literal shape in the SQL twin and rounded
to micro-units before ranking, so rank AND score hash-match.
Magnitude contract (documented, checked by the caller's scale): the
double numerators ``1e6 · supp_ab · n_baskets`` and denominators
``supp_a · supp_b`` must stay within 2^53 — holds through ~1e8
baskets; shard-and-merge beyond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M = 1_000_000.0  # micro-unit scale, embedded identically in the twin


def assoc_rules(baskets: DataFrame, *, basket_col: str = "basket",
                item_col: str = "item", min_support: int = 2,
                k: int = 50) -> DataFrame:
    """Top-``k`` directed association rules ``antecedent → consequent``
    by lift over a (basket, item) relation. Returns
    ``(antecedent, consequent, supp_ab, conf_micro, lift_micro,
    rank)`` — supports exact BIGINTs, confidence/lift micro-rounded,
    rank dense in (lift desc, antecedent, consequent) order (a total
    order: ties cannot reorder across engines).

    ``min_support`` filters pairs BEFORE the marginal joins (the
    Apriori pruning step); both directions of each surviving pair are
    emitted (same lift, different confidence).
    """
    if min_support < 1:
        raise ValueError("assoc_rules: min_support must be >= 1")
    if k < 1:
        raise ValueError("assoc_rules: k must be >= 1")
    b = (baskets.where(F.col(basket_col).isNotNull()
                       & F.col(item_col).isNotNull())
         .select(F.col(basket_col).alias("_b"),
                 F.col(item_col).alias("_i"))
         .distinct())
    n = b.select(F.count_distinct("_b").alias("_n"))
    marg = b.groupBy("_i").agg(F.count(F.lit(1)).alias("_supp"))
    l = b.select(F.col("_b"), F.col("_i").alias("_x"))
    r = b.select(F.col("_b"), F.col("_i").alias("_y"))
    pairs = (l.join(r, "_b")
             .where(F.col("_x") < F.col("_y"))
             .groupBy("_x", "_y")
             .agg(F.count(F.lit(1)).alias("supp_ab"))
             .where(F.col("supp_ab") >= min_support))
    enriched = (pairs
                .join(marg.select(F.col("_i").alias("_x"),
                                  F.col("_supp").alias("supp_x")), "_x")
                .join(marg.select(F.col("_i").alias("_y"),
                                  F.col("_supp").alias("supp_y")), "_y")
                .crossJoin(F.broadcast(n)))
    # both directions; conf = supp_ab/supp_a, lift symmetric
    fwd = enriched.select(
        F.col("_x").alias("antecedent"), F.col("_y").alias("consequent"),
        "supp_ab", F.col("supp_x").alias("supp_a"),
        F.col("supp_y").alias("supp_c"), "_n")
    bwd = enriched.select(
        F.col("_y").alias("antecedent"), F.col("_x").alias("consequent"),
        "supp_ab", F.col("supp_y").alias("supp_a"),
        F.col("supp_x").alias("supp_c"), "_n")
    both = fwd.unionByName(bwd)
    conf = F.round(F.lit(_M) * F.col("supp_ab") / F.col("supp_a")) \
            .cast("long")
    lift = F.round(F.lit(_M)
                   * (F.col("supp_ab") * F.col("_n")).cast("long")
                   / (F.col("supp_a") * F.col("supp_c")).cast("long")) \
            .cast("long")
    scored = both.select("antecedent", "consequent",
                         F.col("supp_ab").cast("long").alias("supp_ab"),
                         conf.alias("conf_micro"),
                         lift.alias("lift_micro"))
    top = (scored.orderBy(F.col("lift_micro").desc(),
                          "antecedent", "consequent")
           .limit(k))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("lift_micro").desc(),
                       "antecedent", "consequent")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def assoc_oracle_sql(baskets_sql: str, *, min_support: int = 2,
                     k: int = 50) -> str:
    """ANSI-SQL twin of :func:`assoc_rules`. ``baskets_sql`` must
    yield ``(basket, item)``; confidence/lift use the identical
    literal expression shape (one double over exact BIGINT products,
    micro-rounded) so the two engines cannot disagree on rank or
    score."""
    return f"""
      WITH b AS (
        SELECT DISTINCT basket AS _b, item AS _i
        FROM ({baskets_sql})
        WHERE basket IS NOT NULL AND item IS NOT NULL
      ), n AS (SELECT COUNT(DISTINCT _b) AS _n FROM b),
      marg AS (SELECT _i, COUNT(*) AS _supp FROM b GROUP BY _i),
      pairs AS (
        SELECT l._i AS _x, r._i AS _y, COUNT(*) AS supp_ab
        FROM b l JOIN b r ON l._b = r._b AND l._i < r._i
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_support}
      ), enriched AS (
        SELECT p._x, p._y, p.supp_ab,
               mx._supp AS supp_x, my._supp AS supp_y, n._n
        FROM pairs p
        JOIN marg mx ON mx._i = p._x
        JOIN marg my ON my._i = p._y
        CROSS JOIN n
      ), directed AS (
        -- 'both' is reserved in DuckDB (TRIM syntax); name it directed
        SELECT _x AS antecedent, _y AS consequent, supp_ab,
               supp_x AS supp_a, supp_y AS supp_c, _n FROM enriched
        UNION ALL
        SELECT _y, _x, supp_ab, supp_y, supp_x, _n FROM enriched
      ), scored AS (
        SELECT antecedent, consequent,
               CAST(supp_ab AS BIGINT) AS supp_ab,
               CAST(ROUND({_M!r} * supp_ab / supp_a) AS BIGINT)
                 AS conf_micro,
               CAST(ROUND({_M!r} * CAST(supp_ab * _n AS BIGINT)
                          / CAST(supp_a * supp_c AS BIGINT)) AS BIGINT)
                 AS lift_micro
        FROM directed
      )
      SELECT antecedent, consequent, supp_ab, conf_micro, lift_micro,
             CAST(ROW_NUMBER() OVER (ORDER BY lift_micro DESC,
                                     antecedent, consequent) AS INT)
               AS rank
      FROM scored
      ORDER BY lift_micro DESC, antecedent, consequent
      LIMIT {k}
    """
