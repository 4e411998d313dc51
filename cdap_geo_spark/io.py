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


def merged_column_names(columns: list, splitter: str = "-") -> list:
    """SQL select-expressions merging ``col-type`` suffixed columns —
    the reference's schema-evolution helper for parquet datasets written
    from heterogeneous source files (``cdap_geo/write.py:160-196``):

    * one type -> plain rename;
    * int64 + double -> COALESCE-style CASE into a float column;
    * list<item: T> + T -> CASE wrapping the scalar into an array;
    * anything else keeps the type-suffixed names side by side.
    """
    lone = "`{0}{s}{1}` AS `{0}`"
    listcol = ("CASE WHEN (`{0}{s}list<item: {1}>` IS NOT NULL) "
               "THEN `{0}{s}list<item: {1}>` "
               "ELSE ARRAY(`{0}{s}{1}`) END AS `{0}`")
    floatcol = ("CASE WHEN (`{0}{s}double` IS NOT NULL) "
                "THEN `{0}{s}double` "
                "ELSE CAST(`{0}{s}int64` AS DOUBLE) END AS `{0}`")
    by_col: dict = {}
    for c in columns:
        name, _, typ = c.partition(splitter)
        by_col.setdefault(name, []).append(typ)
    out = []
    for col, typs in by_col.items():
        if len(typs) == 1:
            out.append(lone.format(col, typs[0], s=splitter))
        elif len(typs) == 2 and set(typs) == {"int64", "double"}:
            out.append(floatcol.format(col, s=splitter))
        elif (len(typs) == 2
              and f"list<item: {min(typs, key=len)}>" == max(typs, key=len)):
            out.append(listcol.format(col, min(typs, key=len), s=splitter))
        else:
            out.extend(f"`{col}{splitter}{t}`" for t in typs)
    return out


def merge_columns(df: DataFrame, splitter: str = "-") -> DataFrame:
    """Apply :func:`merged_column_names` (``cdap_geo/write.py:198-202``)."""
    return df.selectExpr(*merged_column_names(df.columns, splitter))


def distributed_to_parquet(spark: SparkSession, paths: list | str,
                           path_out: str, writer) -> DataFrame:
    """Parallel many-files -> parquet conversion
    (``cdap_geo/write.py:138-153``): one task per source file runs
    ``writer(filepath, name) -> written-path`` (any per-file codec —
    the reference injects a geopandas writer), then the merged dataset
    is read back with schema merging for :func:`merge_columns`.

    Spark-first shape: the file list is a DataFrame repartitioned to
    one file per task (pipeline parallelism without any driver loop),
    and the writer runs inside ``mapInPandas`` — Arrow batches, not a
    per-row Python UDF.
    """
    import glob as _glob
    import os

    import pandas as pd
    from pyspark.sql import types as T

    files = (_glob.glob(paths) if isinstance(paths, str) else list(paths))
    if not files:
        raise ValueError(f"no input files under {paths!r}")
    fdf = spark.createDataFrame(
        pd.DataFrame({"filepath": sorted(files)}))
    fdf = fdf.repartition(len(files), "filepath")

    def gen(batches):
        for pdf in batches:
            outs = []
            for f in pdf["filepath"]:
                name = os.path.splitext(os.path.basename(f))[0] + "-{i}"
                outs.append(writer(f, name))
            yield pd.DataFrame({"filepath": pdf["filepath"],
                                "filepath_out": outs})

    schema = T.StructType([T.StructField("filepath", T.StringType()),
                           T.StructField("filepath_out", T.StringType())])
    fdf.mapInPandas(gen, schema=schema).write.format("noop") \
        .mode("overwrite").save()
    return spark.read.option("mergeSchema", True).parquet(path_out)


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
