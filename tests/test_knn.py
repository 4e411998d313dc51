"""Operator tests: kNN via cell-ring expansion vs brute force
(FIXTURES.md §5 oracle: brute-force distance sort in pandas).
"""

import numpy as np

from cdap_geo_spark import fixtures
from cdap_geo_spark.operators.knn import knn_join


def test_knn_matches_bruteforce(spark):
    corpus = fixtures.documents(spark, 400, partitions=4)
    from cdap_geo_spark import docs as D
    corpus = D.with_geometry(corpus).select("doc_id", "geometry").cache()
    queries = fixtures.knn_queries(spark, 12).cache()
    k = 5
    got = knn_join(queries, corpus, k=k, level=9,
                   require_points=False).toPandas()

    # brute force
    qp = queries.toPandas()
    cp = corpus.toPandas()
    from cdap_geo_spark.core import wkb as W
    qb = W.parse_wkb([bytes(b) for b in qp.geometry]).bounds()
    cb = W.parse_wkb([bytes(b) for b in cp.geometry]).bounds()
    for qi in range(len(qp)):
        # corpus rows may be polygons/lines — knn uses their bounds min
        # corner only for point corpus; restrict to point rows like the
        # operator does (cell from min corner). For this test the corpus
        # geometry mix is fine because the operator and oracle use the
        # same representative coordinate.
        d = np.sqrt((cb[:, 0] - qb[qi, 0]) ** 2 + (cb[:, 1] - qb[qi, 1]) ** 2)
        order = sorted(range(len(d)), key=lambda i: (d[i], cp.doc_id[i]))
        want = [(cp.doc_id[i], round(float(d[i]), 6)) for i in order[:k]]
        sub = got[got.query_id == qp.query_id[qi]].sort_values("rank")
        have = [(r.doc_id, round(float(r.dist), 6)) for r in sub.itertuples()]
        assert have == want, qp.query_id[qi]


def test_knn_k1_and_sparse_region(spark):
    # queries in empty areas force multi-ring expansion
    from pyspark.sql import functions as F
    from cdap_geo_spark import udfs
    corpus = spark.createDataFrame(
        [("c1", 1000.0, 1000.0), ("c2", 200000.0, 200000.0),
         ("c3", 200100.0, 200000.0)],
        "doc_id string, x double, y double"
    ).select("doc_id", udfs.st_point()(F.col("x"), F.col("y")).alias("geometry"))
    queries = spark.createDataFrame(
        [("q1", 500000.0, 900000.0)], "query_id string, x double, y double"
    ).select("query_id", udfs.st_point()(F.col("x"), F.col("y")).alias("geometry"))
    got = knn_join(queries, corpus, k=2, level=9, max_rounds=80).toPandas()
    # c3 (200100, 200000) is marginally closer to (500000, 900000)
    # than c2 (200000, 200000): 761537 m vs 761577 m
    assert list(got.sort_values("rank").doc_id) == ["c3", "c2"]


def test_knn_non_broadcast_path_matches(spark):
    # force the shuffle-join probe path with a tiny threshold: results
    # must equal the broadcast path (and the auto planner must pick
    # non-broadcast without erroring)
    corpus = fixtures.documents(spark, 300, partitions=4)
    from cdap_geo_spark import docs as D
    corpus = D.with_geometry(corpus).select("doc_id", "geometry").cache()
    queries = fixtures.knn_queries(spark, 8).cache()
    bc = knn_join(queries, corpus, k=3, level=9, require_points=False,
                  broadcast_queries=True).toPandas()
    no = knn_join(queries, corpus, k=3, level=9, require_points=False,
                  broadcast_queries="auto",
                  broadcast_threshold=2).toPandas()
    key = lambda p: sorted(map(tuple, p[["query_id", "doc_id", "rank"]]
                               .itertuples(index=False)))
    assert key(bc) == key(no)


def test_annulus_cells_arithmetic():
    from cdap_geo_spark.operators.knn import _annulus_cells
    assert _annulus_cells(0, 0) == 1
    assert _annulus_cells(0, 1) == 9
    assert _annulus_cells(1, 2) == 24      # 5^2 - 1
    assert _annulus_cells(3, 6) == 13 ** 2 - 5 ** 2


def test_knn_empty_corpus_short_circuits(spark):
    from pyspark.sql import functions as F
    from cdap_geo_spark import udfs
    corpus = spark.createDataFrame(
        [], "doc_id string, geometry binary")
    queries = spark.createDataFrame(
        [("q1", 5.0, 9.0)], "query_id string, x double, y double"
    ).select("query_id", udfs.st_point()(F.col("x"), F.col("y")).alias("geometry"))
    got = knn_join(queries, corpus, k=3, level=9).toPandas()
    assert len(got) == 0
    assert list(got.columns) == ["query_id", "doc_id", "dist", "rank"]


def test_seed_radius():
    import math
    from cdap_geo_spark.operators.knn import (
        MAX_SEED_RADIUS, SEED_SAFETY, _seed_radius)
    # degenerate inputs never seed
    assert _seed_radius(0, 1e12, 5, 1000.0) == 0
    assert _seed_radius(100, 0.0, 5, 1000.0) == 0
    # dense corpus: inscribed disk of one cell already expects >> 4k
    # points, so the seed stays at the smallest certifiable radius (1)
    assert _seed_radius(1_000_000, 1e10, 5, 16384.0) == 1
    # sparse corpus: radius grows like 1/sqrt(density) ...
    r = _seed_radius(1_000, 1e12, 5, 1000.0)
    expect = math.ceil(
        math.sqrt(SEED_SAFETY * 5 / (math.pi * 1_000 / 1e12)) / 1000.0)
    assert r == min(MAX_SEED_RADIUS, expect) and r > 1
    # ... but is capped: ultra-sparse pays rounds, not a quadratic probe
    assert _seed_radius(10, 1e14, 50, 100.0) == MAX_SEED_RADIUS


def test_knn_rejects_non_point_corpus(spark):
    """Round-5 contract: a box/polygon corpus used to silently rank by
    bounds min-corner distance; it must raise unless the caller opts
    into that semantics explicitly."""
    import pytest
    from pyspark.sql import functions as F

    from cdap_geo_spark import fixtures
    from cdap_geo_spark.operators.knn import knn_join

    queries = fixtures.knn_queries(spark, 3)
    boxes = fixtures.regions(spark, 30).withColumnRenamed(
        "region_id", "doc_id")
    with pytest.raises(ValueError, match="non-point"):
        knn_join(queries, boxes, k=2, level=9).count()
    # opt-in keeps the documented corner-distance behaviour
    got = knn_join(queries, boxes, k=2, level=9,
                   require_points=False)
    assert got.count() == 6
    # and a point corpus still validates clean
    pts = fixtures.knn_queries(spark, 80).select(
        F.col("query_id").alias("doc_id"), "geometry")
    assert knn_join(queries, pts, k=2, level=9).count() == 6


def _random_boxes(spark, n, seed, prefix, max_side=40000.0, min_side=10.0):
    import numpy as np
    from pyspark.sql import functions as F
    from cdap_geo_spark import udfs
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 600000, n)
    y = rng.uniform(0, 1200000, n)
    if max_side <= 0:
        w = h = np.zeros(n)          # point-degenerate boxes
    else:
        w = rng.uniform(min_side, max_side, n)
        h = rng.uniform(min_side, max_side, n)
    rows = [(f"{prefix}{i}", float(x[i]), float(y[i]),
             float(x[i] + w[i]), float(y[i] + h[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "gid string, minx double, miny double, maxx double, maxy double")
    return df.select("gid", "minx", "miny", "maxx", "maxy",
                     udfs.st_box()(F.col("minx"), F.col("miny"),
                                   F.col("maxx"), F.col("maxy"))
                         .alias("geometry"))


def test_knn_box_matches_bruteforce(spark):
    """Box-mode kNN vs the O(n^2) box-to-box distance oracle: exact
    ranks AND distances, including dist-0 overlapping pairs (many
    zero ties broken by corpus id) and queries in sparse corners."""
    import numpy as np
    corpus = _random_boxes(spark, 120, 3, "c").cache()
    queries = _random_boxes(spark, 25, 7, "q").cache()
    k = 4
    got = knn_join(queries.selectExpr("gid as query_id", "geometry"),
                   corpus.selectExpr("gid as doc_id", "geometry"),
                   k=k, level=8, max_rounds=60, how="box").toPandas()

    qp = queries.toPandas()
    cp = corpus.toPandas()

    def boxdist(q, c):
        dx = max(q.minx - c.maxx, c.minx - q.maxx, 0.0)
        dy = max(q.miny - c.maxy, c.miny - q.maxy, 0.0)
        return float(np.hypot(dx, dy))

    for q in qp.itertuples():
        d = [(boxdist(q, c), c.gid) for c in cp.itertuples()]
        want = sorted(d)[:k]
        sub = got[got.query_id == q.gid].sort_values("rank")
        have = [(round(float(r.dist), 6), r.doc_id) for r in sub.itertuples()]
        assert have == [(round(dd, 6), g) for dd, g in want], q.gid
        # certified exactness must include zero-distance overlaps
    assert (got.dist == 0).any()   # the fixture produces overlaps


def test_knn_box_degenerate_boxes_match_point_mode(spark):
    """Point-degenerate boxes (minx==maxx, miny==maxy) under how='box'
    must reproduce the point mode's (id, rank, dist) exactly."""
    corpus = _random_boxes(spark, 150, 11, "c", max_side=0.0) \
        .selectExpr("gid as doc_id", "geometry").cache()
    queries = _random_boxes(spark, 8, 13, "q", max_side=0.0) \
        .selectExpr("gid as query_id", "geometry").cache()
    pt = knn_join(queries, corpus, k=3, level=9, max_rounds=40,
                  require_points=False).toPandas()
    bx = knn_join(queries, corpus, k=3, level=9,
                  how="box", max_rounds=40).toPandas()
    key = ["query_id", "rank"]
    pt = pt.sort_values(key).reset_index(drop=True)
    bx = bx.sort_values(key).reset_index(drop=True)
    assert list(pt.doc_id) == list(bx.doc_id)
    assert np.allclose(pt.dist, bx.dist)


def test_knn_centroid_pointify_closes_the_polygon_guard(spark):
    """The require_points guard suggests centroiding a polygon corpus;
    st_centroid makes that a one-liner, and the result must equal
    brute-force kNN on the exact centroids."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F
    from cdap_geo_spark import udfs

    rng = np.random.RandomState(5)
    n = 120
    cx = rng.uniform(1000, 99_000, n)
    cy = rng.uniform(1000, 99_000, n)
    w = rng.uniform(100, 900, n)
    h = rng.uniform(100, 900, n)
    corpus = spark.createDataFrame(
        [(int(i), float(cx[i] - w[i] / 2), float(cy[i] - h[i] / 2),
          float(cx[i] + w[i] / 2), float(cy[i] + h[i] / 2))
         for i in range(n)],
        "doc_id long, minx double, miny double, maxx double, maxy double"
    ).select("doc_id", udfs.st_box()("minx", "miny", "maxx", "maxy")
             .alias("geometry"))
    queries = spark.createDataFrame(
        [(int(q), float(rng.uniform(0, 100_000)),
          float(rng.uniform(0, 100_000))) for q in range(8)],
        "query_id long, x double, y double").select(
        "query_id", udfs.st_point()("x", "y").alias("geometry")).cache()
    qpd = queries.select("query_id",
                         udfs.st_bounds()("geometry").alias("b")).toPandas()

    # boxes refuse point-mode kNN...
    with pytest.raises(ValueError, match="point"):
        knn_join(queries, corpus, k=3, level=6).toPandas()
    # ...centroiding them is the documented fix
    pts = corpus.select("doc_id",
                        udfs.st_centroid()("geometry").alias("geometry"))
    got = knn_join(queries, pts, k=3, level=6).toPandas()

    for _, q in qpd.iterrows():
        qx, qy = q.b["minx"], q.b["miny"]
        d2 = (cx - qx) ** 2 + (cy - qy) ** 2
        order = sorted(range(n), key=lambda i: (d2[i], i))[:3]
        sub = got[got.query_id == q.query_id].sort_values("rank")
        assert list(sub.doc_id) == order, q.query_id


def test_idw_interpolate_matches_bruteforce(spark):
    import random

    from cdap_geo_spark.operators.knn import idw_interpolate

    rng = random.Random(19)
    corpus = [(i, rng.randrange(10000), rng.randrange(10000),
               rng.randrange(1, 1000)) for i in range(300)]
    queries = [(j, rng.randrange(10000), rng.randrange(10000))
               for j in range(8)]
    got = {r.query_id: (r.n_nb, r.num, r.den, r.est_centi)
           for r in idw_interpolate(
               spark.createDataFrame(queries, "query_id long, x long, y long"),
               spark.createDataFrame(corpus,
                                     "doc_id long, x long, y long, v long"),
               k=4, level=6, max_rounds=60).collect()}
    for qid, qx, qy in queries:
        nn = sorted(corpus, key=lambda c: ((c[1] - qx) ** 2
                                           + (c[2] - qy) ** 2, c[0]))[:4]
        num = den = 0
        for cid, cx, cy, v in nn:
            d2 = max((cx - qx) ** 2 + (cy - qy) ** 2, 1)
            num += int(v * 1e12 / d2 + 0.5)
            den += int(1e12 / d2 + 0.5)
        want = (4, num, den, int(num / den * 100 + 0.5))
        assert got[qid] == want, qid


def test_idw_coincident_point_dominates(spark):
    from cdap_geo_spark.operators.knn import idw_interpolate
    corpus = [(1, 50, 50, 777), (2, 900, 900, 1), (3, 901, 900, 2),
              (4, 900, 901, 3)]
    queries = [(0, 50, 50)]
    r = idw_interpolate(
        spark.createDataFrame(queries, "query_id long, x long, y long"),
        spark.createDataFrame(corpus, "doc_id long, x long, y long, v long"),
        k=4, level=5, max_rounds=60).collect()[0]
    assert r.n_nb == 4
    assert abs(r.est_centi - 77700) < 100  # coincident value dominates


def test_knn_classify_matches_bruteforce(spark):
    import random

    from pyspark.sql import functions as F
    from cdap_geo_spark.operators.knn import knn_classify

    rng = random.Random(61)
    corpus = [(i, rng.randrange(0, 1000), rng.randrange(0, 1000),
               f"L{i % 3}") for i in range(120)]
    queries = [(j, rng.randrange(0, 1000), rng.randrange(0, 1000))
               for j in range(8)]
    cdf = spark.createDataFrame(
        corpus, "doc_id long, x long, y long, label string")
    qdf = spark.createDataFrame(queries, "query_id long, x long, y long")
    got = {r.query_id: (r.label, r.votes) for r in
           knn_classify(qdf, cdf, k=5, level=6,
                        max_rounds=60).collect()}
    want = {}
    for qid, qx, qy in queries:
        ranked = sorted(corpus,
                        key=lambda c: ((c[1] - qx) ** 2 + (c[2] - qy) ** 2,
                                       c[0]))[:5]
        from collections import Counter
        cnt = Counter(c[3] for c in ranked)
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[qid] = best
    assert got == want


def test_knn_classify_tie_breaks_to_smallest_label(spark):
    from cdap_geo_spark.operators.knn import knn_classify

    # 4 neighbors, 2-2 label split at k=4: 'A' must win the tie
    corpus = [(1, 10, 0, "B"), (2, 0, 10, "A"),
              (3, 10, 10, "B"), (4, 5, 5, "A"),
              (5, 900, 900, "C")]
    queries = [(0, 0, 0)]
    cdf = spark.createDataFrame(
        corpus, "doc_id long, x long, y long, label string")
    qdf = spark.createDataFrame(queries, "query_id long, x long, y long")
    got = knn_classify(qdf, cdf, k=4, level=6, max_rounds=60).collect()
    assert [(r.query_id, r.label, r.votes) for r in got] == [(0, "A", 2)]
