"""Graph analytics over edge relations: integer-exact PageRank.

Connected components (the other graph op this engine needs) lives in
``operators/dedup.py`` (:func:`dedup_components`); this module adds the
canonical iterative-propagation algorithm, built the distributed way —
each iteration is one equi-join of the rank relation onto the edge
relation plus one keyed aggregation (map-side partials), i.e. the
standard Pregel-style shuffle pattern, with no driver-side loop over
rows and no all-pairs anything.

Cross-engine exactness (the design choice worth copying): classic
PageRank is floating-point, and a distributed SUM of doubles is
order-dependent — two engines (or two runs!) produce last-ulp-different
ranks, which breaks value-hash verification. Here ranks live in INTEGER
micro-units and every step is exact integer arithmetic::

    contrib(a->b) = rank_a DIV deg_a              (integer division)
    rank_b'       = (100-d)*scale DIV 100  +  (d * sum(contribs)) DIV 100

Sums of BIGINTs are associative and commutative — identical whatever
the partitioning, engine, or schedule. The DIV truncation loses < 1
micro-unit per term (a deliberate, documented quantization of the
textbook algorithm), in exchange for results that are bit-reproducible
everywhere — the property that lets a 1000-executor run be verified
against a single-node oracle.

Lineage: the edge/degree relations are referenced every iteration and
each round's ranks feed the next — both are ``localCheckpoint``ed via
``core.lifetime`` (tracked; superseded rounds released eagerly), the
same contract as ``knn_join``: consume the returned frame fully inside
the caller's ``checkpoint_scope``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdap_geo_spark.core.lifetime import (track_checkpoint,
                                          unpersist_checkpoint)


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             iterations: int = 3, damping_pct: int = 85,
             scale: int = 1_000_000) -> DataFrame:
    """Integer-exact PageRank over a DIRECTED edge relation (pass both
    directions for an undirected graph). Returns ``(id, rank)`` with
    ``rank`` in micro-units of ``scale`` (init = ``scale`` per node, the
    unnormalized convention: total mass ~ n_nodes * scale).

    Nodes are the distinct ``src`` values — a node with no out-edges
    cannot be ranked consistently under the integer scheme (its mass
    has nowhere to go), so callers pass symmetric edges or accept
    sink-mass loss exactly as the textbook simplification does.

    ``damping_pct`` is the damping factor in integer percent (85 =
    0.85) so the update rule stays in exact BIGINT arithmetic.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("pagerank: damping_pct must be in (0, 100)")
    if iterations < 1:
        raise ValueError("pagerank: need >= 1 iteration")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
             .localCheckpoint(eager=False)
    track_checkpoint(e)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = e.select(F.col("src").alias("id")).distinct()
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    prev = None
    for _ in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed("id", "src"), "src")
                     .join(deg, "src")
                     .select(F.col("dst").alias("id"),
                             F.expr("rank DIV deg").alias("c")))
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(sums, "id", "left")
                 .select("id",
                         (F.lit(base)
                          + F.expr(f"({damping_pct} * coalesce(s, "
                                   f"CAST(0 AS BIGINT))) DIV 100"))
                         .cast("long").alias("rank"))
                 .localCheckpoint(eager=True))
        track_checkpoint(ranks)
        if prev is not None:
            unpersist_checkpoint(prev)
        prev = ranks
    return ranks


def pagerank_oracle_sql(edges_sql: str, *, iterations: int = 3,
                        damping_pct: int = 85,
                        scale: int = 1_000_000) -> str:
    """ANSI-SQL twin of :func:`pagerank` with the iterations UNROLLED
    as chained CTEs (one per round) — possible precisely because every
    step is exact integer arithmetic, so the single-node SQL engine and
    the distributed plan cannot disagree. ``edges_sql`` must yield
    ``(src, dst)``."""
    base = (100 - damping_pct) * scale // 100
    parts = [f"e AS ({edges_sql})",
             "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
             "n AS (SELECT DISTINCT src AS id FROM e)",
             f"r0 AS (SELECT id, CAST({scale} AS BIGINT) AS rank FROM n)"]
    for i in range(iterations):
        parts.append(f"""r{i + 1} AS (
          SELECT n.id,
                 CAST({base} + ({damping_pct} * COALESCE(t.s, 0)) // 100
                      AS BIGINT) AS rank
          FROM n LEFT JOIN (
            SELECT e.dst AS id, SUM(r{i}.rank // deg.deg) AS s
            FROM e JOIN r{i} ON e.src = r{i}.id
                   JOIN deg ON e.src = deg.src
            GROUP BY e.dst) t ON n.id = t.id)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT CAST(id AS BIGINT) AS id, rank"
              f" FROM r{iterations}")
