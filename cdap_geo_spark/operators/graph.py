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


def triangle_counts(edges: DataFrame, *, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED graph (edges may
    arrive in either or both directions, with duplicates and self-loops
    — they are canonicalized away first). Returns ``(id, triangles)``
    for every node incident to at least one edge; counts are exact
    BIGINTs, so the result is cross-engine value-hashable.

    The distributed design is the compact-forward / degree-ordered
    orientation: every canonical edge is oriented from its lower
    ``(degree, id)`` endpoint to its higher one. Under that total
    order each triangle x<y<z is found exactly once — as the wedge
    (x→y, x→z) closed by the edge y→z — and, the scale property, the
    wedge self-join's fan-out is bounded: Σ out-deg² = O(m^1.5)
    (Latapy 2008; a hub of degree d contributes wedges only toward
    HIGHER-degree nodes, of which there are at most O(√m)). Every step
    is an equi-join or keyed aggregation (AQE-sized shuffles); there is
    no nested-loop join anywhere and no driver-side iteration.

    The canonical edge relation is referenced three times (degrees,
    orientation, closing join) and is ``localCheckpoint``ed via
    ``core.lifetime`` — consume the returned frame inside the caller's
    ``checkpoint_scope`` (same contract as :func:`pagerank`).
    """
    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                      F.greatest(F.col(src), F.col(dst)).alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct()
         .localCheckpoint(eager=False))
    track_checkpoint(e)
    nodes = (e.select(F.col("u").alias("id"))
             .unionByName(e.select(F.col("v").alias("id")))
             .distinct())
    deg = (e.select(F.col("u").alias("id"))
           .unionByName(e.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("deg")))
    t = (e.join(deg.select(F.col("id").alias("u"),
                           F.col("deg").alias("du")), "u")
          .join(deg.select(F.col("id").alias("v"),
                           F.col("deg").alias("dv")), "v"))
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    lo = ku < kv
    o = (t.select(F.when(lo, F.col("u")).otherwise(F.col("v")).alias("a"),
                  F.when(lo, F.col("v")).otherwise(F.col("u")).alias("b"),
                  F.when(lo, kv).otherwise(ku).alias("bk"))
         .localCheckpoint(eager=False))
    track_checkpoint(o)
    w1 = o.select("a", F.col("b"), F.col("bk"))
    w2 = o.select(F.col("a"), F.col("b").alias("c"),
                  F.col("bk").alias("ck"))
    wedges = (w1.join(w2, "a")
              .where(F.col("bk") < F.col("ck"))
              .select("a", "b", "c"))
    tri = wedges.join(o.select(F.col("a").alias("b"),
                               F.col("b").alias("c")), ["b", "c"])
    per_node = (tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
                .groupBy("id").agg(F.count(F.lit(1)).alias("t")))
    return (nodes.join(per_node, "id", "left")
            .select("id", F.coalesce(F.col("t"), F.lit(0))
                    .cast("long").alias("triangles")))


def bfs_hops(edges: DataFrame, sources: DataFrame, *,
             src: str = "src", dst: str = "dst", id_col: str = "id",
             max_hops: int = 4) -> DataFrame:
    """Multi-source BFS hop distances over a DIRECTED edge relation
    (pass both directions for undirected): returns ``(id, hops)`` for
    every node reachable from any source within ``max_hops`` — exact
    integers, so hashable cross-engine.

    Frontier-style propagation (the scale property): each round joins
    only the NEWLY discovered frontier onto the edges, dedups the
    candidates, and anti-joins the already-settled set — total work is
    O(edges touched), not O(rounds · |V|); settled state is one row per
    reached node, ``localCheckpoint``ed per round (lineage truncation,
    superseded rounds released — the :func:`pagerank` contract).
    An empty frontier short-circuits the remaining rounds (one cheap
    ``isEmpty`` on the already-checkpointed frontier per round).
    """
    if max_hops < 0:
        raise ValueError("bfs_hops: max_hops must be >= 0")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
             .localCheckpoint(eager=False)
    track_checkpoint(e)
    frontier = (sources.select(F.col(id_col).alias("id")).distinct()
                .localCheckpoint(eager=True))
    track_checkpoint(frontier)
    dist = frontier.withColumn("hops", F.lit(0).cast("long"))
    for i in range(1, max_hops + 1):
        if frontier.isEmpty():
            break
        cand = (frontier.join(e, frontier["id"] == e["src"])
                .select(F.col("dst").alias("id")).distinct())
        new = (cand.join(dist.select("id"), "id", "left_anti")
               .localCheckpoint(eager=True))
        # every frontier is a disjoint slice of the RESULT (dist is
        # their union), so none may be released before the caller's
        # checkpoint_scope closes — total pinned state is exactly one
        # row per reached node
        track_checkpoint(new)
        frontier = new
        dist = dist.unionByName(
            new.withColumn("hops", F.lit(i).cast("long")))
    return dist


def bfs_oracle_sql(edges_sql: str, sources_sql: str, *,
                   max_hops: int = 4) -> str:
    """ANSI-SQL twin of :func:`bfs_hops`, rounds unrolled as chained
    CTEs (frontier EXCEPT settled per round). ``edges_sql`` yields
    (src, dst); ``sources_sql`` yields (id)."""
    parts = [f"e AS ({edges_sql})",
             f"f0 AS (SELECT DISTINCT id FROM ({sources_sql}))",
             "d0 AS (SELECT id, CAST(0 AS BIGINT) AS hops FROM f0)"]
    for i in range(1, max_hops + 1):
        parts.append(f"""f{i} AS (
          SELECT DISTINCT e.dst AS id
          FROM e JOIN f{i - 1} ON e.src = f{i - 1}.id
          EXCEPT SELECT id FROM d{i - 1})""")
        parts.append(f"""d{i} AS (
          SELECT * FROM d{i - 1}
          UNION ALL SELECT id, CAST({i} AS BIGINT) FROM f{i})""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT CAST(id AS BIGINT) AS id, hops"
              f" FROM d{max_hops}")


def triangle_oracle_sql(edges_sql: str) -> str:
    """ANSI-SQL twin of :func:`triangle_counts`. ``edges_sql`` must
    yield CANONICAL undirected edges ``(u, v)`` with ``u < v`` and no
    duplicates; each triangle a<b<c then matches the three-way
    equi-join exactly once, so no degree orientation is needed on the
    single-node side (counts are integers — order-independent)."""
    return f"""
      WITH e AS ({edges_sql}),
      t AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
      ), x AS (
        SELECT a AS id FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t
      ), n AS (SELECT u AS id FROM e UNION SELECT v FROM e)
      SELECT CAST(n.id AS BIGINT) AS id,
             CAST(COALESCE(cnt.c, 0) AS BIGINT) AS triangles
      FROM n LEFT JOIN (SELECT id, COUNT(*) AS c FROM x GROUP BY id) cnt
             ON n.id = cnt.id
    """


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


def kcore_peel(edges: DataFrame, *, k: int, rounds: int = 4,
               src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-round k-core peeling over an UNDIRECTED graph (edges in
    any direction, duplicates/self-loops canonicalized away). Each
    round drops every node whose degree in the SURVIVING subgraph is
    below ``k`` (the synchronous peel); after ``rounds`` rounds the
    result is ``(id, deg)`` for every node still incident to an edge,
    with its degree in the surviving subgraph. Run to convergence this
    IS the exact k-core; a FIXED round count keeps the computation
    identical — and therefore value-hashable — against the single-node
    oracle (:func:`kcore_oracle_sql` unrolls the same rounds as chained
    CTEs). Degrees are exact BIGINTs.

    Distributed shape: each round is one keyed degree aggregation
    (map-side partials) plus two semi-joins of the edge relation
    against the surviving node set — AQE-sized equi-joins, no nested
    loop, no driver-side row loop. A round that removes no edge
    short-circuits the rest (the peel has converged; remaining rounds
    are provable no-ops, so early exit cannot change the result).
    Edge relations supersede each other round-to-round and are
    released eagerly (the :func:`pagerank` lineage contract: consume
    the returned frame inside the caller's ``checkpoint_scope``).
    """
    if k < 1:
        raise ValueError("kcore_peel: k must be >= 1")
    if rounds < 0:
        raise ValueError("kcore_peel: rounds must be >= 0")
    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                      F.greatest(F.col(src), F.col(dst)).alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct()
         .localCheckpoint(eager=True))
    track_checkpoint(e)
    n_edges = e.count()
    for _ in range(rounds):
        if n_edges == 0:
            break
        deg = (e.select(F.col("u").alias("id"))
               .unionByName(e.select(F.col("v").alias("id")))
               .groupBy("id").agg(F.count(F.lit(1)).alias("deg")))
        keep = deg.where(F.col("deg") >= k).select("id")
        nxt = (e.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
                .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint(eager=True))
        track_checkpoint(nxt)
        n_nxt = nxt.count()
        unpersist_checkpoint(e)
        e, converged = nxt, n_nxt == n_edges
        n_edges = n_nxt
        if converged:
            break
    return (e.select(F.col("u").alias("id"))
            .unionByName(e.select(F.col("v").alias("id")))
            .groupBy("id").agg(F.count(F.lit(1)).cast("long")
                               .alias("deg")))


def kcore_oracle_sql(edges_sql: str, *, k: int, rounds: int = 4) -> str:
    """ANSI-SQL twin of :func:`kcore_peel`, rounds unrolled as chained
    CTEs. ``edges_sql`` must yield CANONICAL undirected edges
    ``(u, v)`` with ``u < v``, no duplicates or self-loops."""
    parts = [f"e0 AS ({edges_sql})"]
    for i in range(rounds):
        parts.append(f"""d{i} AS (
          SELECT id, COUNT(*) AS deg FROM (
            SELECT u AS id FROM e{i}
            UNION ALL SELECT v FROM e{i}) GROUP BY id)""")
        parts.append(f"""s{i} AS (SELECT id FROM d{i} WHERE deg >= {k})""")
        parts.append(f"""e{i + 1} AS (
          SELECT u, v FROM e{i}
          WHERE u IN (SELECT id FROM s{i})
            AND v IN (SELECT id FROM s{i}))""")
    return (
        "WITH " + ",\n".join(parts) + f"""
        SELECT CAST(id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS id FROM e{rounds}
              UNION ALL SELECT v FROM e{rounds})
        GROUP BY id""")
