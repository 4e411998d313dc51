"""Operator tests: the spatial join vs the O(n²) cross-join oracle
(the pair-set-equality contract of ``st_intersects``,
``cdap_geo/sedona.py:105-108``; north rule: "matching the reference's
join output rows").
"""

import numpy as np
import pytest

from cdap_geo_spark import docs as D, fixtures
from cdap_geo_spark.core import wkb as W
from cdap_geo_spark.operators.sjoin import sjoin, sjoin_pairs, hot_cells

import oracle


@pytest.fixture(scope="module")
def small_world(spark):
    dd = fixtures.documents(spark, 250, partitions=4).cache()
    rr = fixtures.regions(spark, 60).cache()
    dd.count(), rr.count()
    return D.with_geometry(dd), rr, dd


def _oracle_pairs(dg, rr, pred="intersects", distance=None):
    """Cross-join oracle with a NumPy bbox prefilter (disjoint bboxes
    can't intersect / can't be within d; only survivors get the exact
    scalar oracle)."""
    docs_pd = dg.select("doc_id", "geometry").toPandas()
    regs_pd = rr.select("region_id", "geometry").toPandas()
    lg = [oracle.parse(None if b is None else bytes(b)) for b in docs_pd.geometry]
    rg = [oracle.parse(None if b is None else bytes(b)) for b in regs_pd.geometry]
    lb = W.parse_wkb([bytes(b) for b in docs_pd.geometry]).bounds()
    rb = W.parse_wkb([bytes(b) for b in regs_pd.geometry]).bounds()
    m = 0.0 if distance is None else float(distance)
    cand = ~((lb[:, None, 0] - m > rb[None, :, 2]) |
             (lb[:, None, 1] - m > rb[None, :, 3]) |
             (lb[:, None, 2] + m < rb[None, :, 0]) |
             (lb[:, None, 3] + m < rb[None, :, 1]))
    out = set()
    for i, j in zip(*np.nonzero(cand)):
        a, b = lg[i], rg[j]
        if a is None or b is None:
            continue
        if pred == "intersects":
            hit = oracle.intersects(a, b)
        else:
            hit = oracle.distance(a, b) <= distance
        if hit:
            out.add((docs_pd.doc_id[i], regs_pd.region_id[j]))
    return out


def _pairs_set(df):
    return set(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def base_pairs(spark, small_world):
    dg, rr, _ = small_world
    return _pairs_set(sjoin_pairs(dg, rr, left_id="doc_id",
                                  right_id="region_id", level=7))


def test_sjoin_matches_oracle(spark, small_world, base_pairs):
    dg, rr, _ = small_world
    assert base_pairs == _oracle_pairs(dg, rr)


def test_sjoin_level_invariance(spark, small_world, base_pairs):
    dg, rr, _ = small_world
    assert _pairs_set(sjoin_pairs(dg, rr, level=9, left_id="doc_id",
                                  right_id="region_id")) == base_pairs


def test_sjoin_salt_invariance(spark, small_world, base_pairs):
    # SURVEY.md §5.3: result set identical under salting
    dg, rr, _ = small_world
    assert _pairs_set(sjoin_pairs(dg, rr, level=7, salt=4, left_id="doc_id",
                                  right_id="region_id")) == base_pairs


def test_sjoin_auto_salt_invariance(spark, small_world, base_pairs):
    # the planner's own census-picked salt (broadcast disabled so the
    # auto path actually runs) must not change the result set
    dg, rr, _ = small_world
    assert _pairs_set(sjoin_pairs(dg, rr, level=7, salt="auto",
                                  broadcast=False, left_id="doc_id",
                                  right_id="region_id")) == base_pairs


def test_auto_salt_census_scales_with_skew(spark):
    # all rows in one cell -> share 1 -> salt = min(parallelism, cap);
    # near-uniform cells -> salt collapses to 1
    from pyspark.sql import functions as F
    from cdap_geo_spark.operators.sjoin import (MAX_AUTO_SALT, _auto_salt)
    hot = spark.range(2000).select(F.lit(42).alias("cell_id"))
    p = spark.sparkContext.defaultParallelism
    assert _auto_salt(hot, p) == min(p, MAX_AUTO_SALT)
    uniform = spark.range(2000).select((F.col("id") % 1000).alias("cell_id"))
    assert _auto_salt(uniform, p) <= 2


def test_auto_salt_census_unbiased_on_clustered_layout(spark):
    # The engine's own recommended at-rest layout range-clusters on
    # cell_id (io.py ingest): the hot cell then lives in ONE partition,
    # typically not the first. The round-3 limit() census read only the
    # first partitions and missed it; the per-partition-quota census
    # must find it regardless of which partition holds the hot cell.
    from pyspark.sql import functions as F
    from cdap_geo_spark.operators.sjoin import _auto_salt
    # 10k rows; ids >= 9000 share cell 10_000_000 (10% hot share), the
    # rest are unique cells below it -> range clustering puts the hot
    # cell in the LAST partition.
    df = (spark.range(10_000)
          .select(F.when(F.col("id") >= 9000, F.lit(10_000_000))
                  .otherwise(F.col("id")).alias("cell_id"))
          .repartitionByRange(8, "cell_id")
          .sortWithinPartitions("cell_id"))
    salt = _auto_salt(df, parallelism=32, sample_rows=1000)
    # true hot share 10% x parallelism 32 -> expect ~ceil(3.2)=4;
    # accept the stratified sample's rounding but NOT a miss (salt=1)
    assert 2 <= salt <= 8


def test_census_sample_bounded_and_scattered(spark):
    from pyspark.sql import functions as F
    from cdap_geo_spark.operators.sjoin import _census_sample
    df = (spark.range(100_000)
          .select(F.col("id").alias("cell_id"))
          .repartitionByRange(8, "cell_id"))
    sample = _census_sample(df, sample_rows=800).toPandas()
    # quota = max(64, 800//8) = 100 per partition, 8 partitions
    assert len(sample) <= 8 * 100
    # scattered: rows drawn from every eighth of the key range
    assert sample["cell_id"].nunique() > 0
    buckets = (sample["cell_id"] // 12_500).nunique()
    assert buckets == 8


def test_sjoin_broadcast_equals_shuffle(spark, small_world, base_pairs):
    dg, rr, _ = small_world
    assert _pairs_set(sjoin_pairs(dg, rr, level=7, broadcast=True,
                                  left_id="doc_id",
                                  right_id="region_id")) == base_pairs


def test_sjoin_no_marked_fastpath_same_result(spark, small_world, base_pairs):
    dg, rr, _ = small_world
    nofast = _pairs_set(sjoin_pairs(dg, rr, level=7, right_how="intersects",
                                    left_id="doc_id", right_id="region_id"))
    assert base_pairs == nofast


def test_bbox_predicate_is_bbox_overlap(spark, small_world):
    # the bbox_join contract (cdap_geo/index_bbox.py:32-71): pairs whose
    # bounding boxes overlap (strict-inequality filter)
    dg, rr, _ = small_world
    got = _pairs_set(sjoin_pairs(dg, rr, level=7, predicate="bbox",
                                 left_id="doc_id", right_id="region_id"))
    docs_pd = dg.select("doc_id", "geometry").toPandas()
    regs_pd = rr.select("region_id", "geometry").toPandas()
    lb = W.parse_wkb([bytes(b) for b in docs_pd.geometry]).bounds()
    rb = W.parse_wkb([bytes(b) for b in regs_pd.geometry]).bounds()
    want = set()
    for i in range(len(lb)):
        for j in range(len(rb)):
            if np.isnan(lb[i]).any() or np.isnan(rb[j]).any():
                continue
            if not (lb[i, 0] > rb[j, 2] or lb[i, 1] > rb[j, 3] or
                    lb[i, 2] < rb[j, 0] or lb[i, 3] < rb[j, 1]):
                want.add((docs_pd.doc_id[i], regs_pd.region_id[j]))
    assert got == want


def test_distance_join_matches_oracle(spark, small_world):
    dg, rr, _ = small_world
    d = 5000.0
    want = _oracle_pairs(dg, rr, pred="distance", distance=d)
    got = _pairs_set(sjoin_pairs(dg, rr, level=7, predicate="distance",
                                 distance=d, left_id="doc_id",
                                 right_id="region_id"))
    assert got == want


def test_full_sjoin_preserves_spans(spark, small_world):
    dg, rr, dd = small_world
    full = sjoin(dg, rr, left_id="doc_id", right_id="region_id", level=7)
    assert D.check_span_invariant(dd, full) == 0
    # suffix renaming of colliding columns (cdap_geo/sedona.py:122-125)
    assert "geometry_right" in full.columns


def test_parallelism_invariance(spark, small_world, base_pairs):
    # local[1]-equivalent: repartition(1) both sides — same pair set
    dg, rr, _ = small_world
    got = _pairs_set(sjoin_pairs(dg.repartition(1), rr.repartition(1),
                                 level=7, left_id="doc_id",
                                 right_id="region_id"))
    assert got == base_pairs


def test_hot_cells_census(spark, small_world):
    dg, _, _ = small_world
    hc = hot_cells(dg, level=3, threshold=10)
    rows = hc.collect()
    assert all(r["count"] > 10 for r in rows)
    assert len(rows) >= 1  # coarse level concentrates rows


def test_box_pairs_native_matches_wkb_bbox_path(spark):
    # the native-bounds fast path must return exactly the rows of
    # sjoin_pairs(predicate='bbox') over the same boxes encoded as
    # WKB — touching boxes included (strict-inequality contract),
    # at every covering level
    import numpy as np
    from pyspark.sql import functions as F
    from cdap_geo_spark import udfs
    from cdap_geo_spark.operators.sjoin import box_pairs_native

    rng = np.random.RandomState(3)
    rows = []
    for i in range(300):
        x0 = float(rng.randint(0, 500_000))
        y0 = float(rng.randint(0, 900_000))
        w = float(rng.randint(0, 60_000))
        h = float(rng.randint(0, 60_000))
        rows.append((i, x0, y0, x0 + w, y0 + h))
    # one exactly-touching pair (shared edge) pins the tie rule
    rows.append((1000, 0.0, 0.0, 1_000.0, 1_000.0))
    rows.append((1001, 1_000.0, 0.0, 2_000.0, 1_000.0))
    b = spark.createDataFrame(
        rows, "id long, minx double, miny double, maxx double, maxy double")
    wkb = b.select("id", udfs.st_box()(
        F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"))
        .alias("geometry"))
    want = {(r["a"], r["b"]) for r in sjoin_pairs(
        wkb.select(F.col("id").alias("a"), "geometry"),
        wkb.select(F.col("id").alias("b"), "geometry"),
        left_id="a", right_id="b", level=7, predicate="bbox").collect()}
    assert ((1000, 1001) in want)  # touching pair is a bbox match
    for lv in (6, 7, 8):
        got = {(r["a"], r["b"]) for r in box_pairs_native(
            b.select(F.col("id").alias("a"), "minx", "miny", "maxx",
                     "maxy"),
            b.select(F.col("id").alias("b"), "minx", "miny", "maxx",
                     "maxy"),
            left_id="a", right_id="b", level=lv).collect()}
        assert got == want
