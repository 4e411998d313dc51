"""Bucketed at-rest layout -> exchange-free repeated spatial joins.

The cell equi-join in :mod:`cdap_geo_spark.operators.sjoin` shuffles
both indexed sides on ``cell_id`` every time it runs. For the 100 TB
workload pattern — the same big reference layer (parcels, tiles,
admin boundaries) joined against many incoming datasets, or two big
layers joined repeatedly — that shuffle is the dominant cost and it
is *reproducible work*: the cell cover of a static layer never
changes. Spark's answer is bucketing: persist each side's indexed
relation ``bucketBy(n, cell_id)`` + ``sortBy(cell_id)``; two tables
bucketed the same way sort-merge join with **zero Exchange** (and no
re-sort when each bucket is a single file), so the join's only cost
is the scan + the refine kernel.

This is the Spark-first upgrade of the reference's at-rest story: the
reference repartitions on its BNG index before writing
(``cdap_geo/read.py:120-160``) but the layout is lost on read — every
join still shuffles. A bucketed data-source table keeps the layout in
the catalog, so Catalyst *proves* both sides are co-partitioned and
drops the Exchange at plan time.

Scale notes:

* bucket count is the join's parallelism floor AND file count — pick
  ~2-4x the executor-core count at the target scale (e.g. 4096 for a
  1000-executor run), NOT the local default;
* there is no salt on this path: a hot cell lands in one bucket.
  AQE's skew-join splitting cannot help either (it needs an Exchange
  to re-plan). For heavily skewed layers keep the shuffle path of
  :func:`~cdap_geo_spark.operators.sjoin.sjoin_pairs` with
  ``salt='auto'``, or subdivide hot geometries first
  (:func:`~cdap_geo_spark.operators.geoops.st_subdivide_explode`);
* both tables MUST be written with the same bucket count — Spark
  only elides both Exchanges when the bucket counts match (one-side
  multiples re-shuffle the other side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdap_geo_spark.operators import sjoin as SJ


def index_to_bucketed_table(df: DataFrame, table: str, *,
                            id_col: str, geom_col: str = "geometry",
                            level: int = SJ.DEFAULT_LEVEL,
                            how: str = "intersects", pad: float = 1.0,
                            dilate: float = 0.0,
                            buckets: int = 32,
                            path: str | None = None,
                            mode: str = "overwrite") -> None:
    """Persist ``df``'s cell-indexed relation as a bucketed table.

    One fused Arrow pass (decode + bounds + cell cover + explode,
    :func:`sjoin._index_side`) then ``bucketBy(buckets, cell_id)`` +
    ``sortBy(cell_id)`` into the session catalog. ``path`` makes the
    table external (data at ``path``, metadata in the catalog).

    ``how``/``pad``/``level`` must match across the tables you intend
    to join (same grid = same join keys). For distance joins
    pre-dilate the LEFT table's cover with ``dilate=d`` (metres) —
    the same lossless dilation :func:`sjoin.sjoin_pairs` applies
    at plan time.
    """
    indexed = SJ._index_side(df, id_col, geom_col, level, how, pad,
                             keep_geom=True, dilate=dilate)
    w = (indexed.write.format("parquet").mode(mode)
         .bucketBy(buckets, "cell_id").sortBy("cell_id"))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def sjoin_bucketed(spark: SparkSession, left_table: str, right_table: str, *,
                   left_id: str, right_id: str,
                   left_geom: str = "geometry", right_geom: str = "geometry",
                   predicate: str = "intersects",
                   left_how: str = "intersects",
                   distance: float | None = None,
                   dedup: bool = True,
                   keep_distance: bool = False,
                   keep_left_geom: bool = False) -> DataFrame:
    """Spatial join of two bucketed index tables — no shuffle of
    either side (verified by the ``test_bucketed`` no-Exchange plan
    assertion); same result rows as
    :func:`~cdap_geo_spark.operators.sjoin.sjoin_pairs` on the
    original inputs.

    ``left_how`` must repeat the ``how`` the LEFT table was written
    with — it gates the exact-cover fast path exactly as in
    ``sjoin_pairs`` (cells wholly inside a right polygon skip the
    refine kernel only when the left cover is exact). For
    ``predicate='distance'`` the left table must have been written
    with ``dilate=distance``.
    """
    if predicate == "distance" and distance is None:
        raise ValueError("distance predicate needs distance=")
    fast_path_ok = (predicate == "intersects" and left_how == "intersects")

    l = spark.table(left_table).withColumnsRenamed({
        "_minx": "_lminx", "_miny": "_lminy",
        "_maxx": "_lmaxx", "_maxy": "_lmaxy", "_inside": "_linside"})
    r = spark.table(right_table).withColumnsRenamed({
        "_minx": "_rminx", "_miny": "_rminy",
        "_maxx": "_rmaxx", "_maxy": "_rmaxy", "_inside": "_rinside"})
    if left_geom == right_geom and predicate != "bbox":
        l = l.withColumnRenamed(left_geom, "_lgeom")
        left_geom_c = "_lgeom"
    else:
        left_geom_c = left_geom

    # plain equi-join on the bucket column: Catalyst sees matching
    # HashPartitioning(cell_id, n) on both scans and plans a
    # sort-merge join with no Exchange on either side. No F.broadcast
    # here — a broadcast would *discard* the co-location we paid for.
    cand = l.join(r, on="cell_id", how="inner")
    return SJ.refine_candidates(
        cand, left_id=left_id, right_id=right_id, predicate=predicate,
        distance=distance, left_geom_c=left_geom_c, right_geom=right_geom,
        fast_path_ok=fast_path_ok, dedup=dedup,
        keep_distance=keep_distance, keep_left_geom=keep_left_geom)


def plan_has_no_exchange(df: DataFrame) -> bool:
    """True when the physical plan contains no Exchange at all — the
    property the bucketed layout exists to deliver. Assert it on a
    ``dedup=False`` join (the optional pair-dedup above the join adds
    an inherent narrow shuffle that would mask the signal)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
