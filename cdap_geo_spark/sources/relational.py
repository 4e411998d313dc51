"""Builders that derive the engine's spatial inputs from the driver's
relational test tables (TESTDATA.md) via deterministic integer
arithmetic.

The point: the SAME coordinate formulas are expressible in Spark and
in DuckDB ANSI SQL, so the driver's correctness harness can check the
ENTIRE engine pipeline (WKB encode -> Arrow decode -> cell cover ->
salted equi-join -> exact PIP refine) against a pure-SQL range-join
oracle — no spatial extension needed. Coordinates are integer-valued
doubles (exact in FP), extent matches the fixture extent
[0,700000]x[0,1300000].

Formulas (LCG-style mixing, overflow-free at any realistic key):

* doc point:   x = (doc_id*48271  + 17) % 700000
               y = (doc_id*69621  + 29) % 1300000
* region box:  minx = (p_partkey*40503 + 101) % 650000
               miny = (p_partkey*69301 + 257) % 1250000
               w    = (p_partkey*97  + 13) % 50000 + 1000
               h    = (p_partkey*89  + 37) % 50000 + 1000
* doc box:     w    = (doc_id*31 + 7) % 20000 + 500
               h    = (doc_id*37 + 11) % 20000 + 500
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdap_geo_spark import udfs


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table, re-spread for parallelism: these are
    single-file parquets (one partition), which would otherwise run
    every downstream map-side pipeline in ONE task."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


def _pt_xy(key: str):
    x = ((F.col(key) * 48271 + 17) % 700000).cast("double")
    y = ((F.col(key) * 69621 + 29) % 1300000).cast("double")
    return x, y


def doc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x, y, geometry WKB point) from documents.parquet."""
    d = _read(spark, sf_dir, "documents")
    x, y = _pt_xy("doc_id")
    return d.select("doc_id", x.alias("x"), y.alias("y"),
                    udfs.st_point()(x, y).alias("geometry"))


def interleaved_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-docs table (input_hint shape) derived from the
    driver's documents.parquet: a text span from the table's text
    column + a geometry span carrying the doc point as hex WKB."""
    d = _read(spark, sf_dir, "documents")
    x, y = _pt_xy("doc_id")
    geom = udfs.st_point()(x, y)
    span_t = F.struct(F.lit("text").alias("kind"),
                      F.col("text").alias("text"),
                      F.lit(None).cast("string").alias("media_ref"),
                      F.lit(1).alias("offset"))
    span_g = F.struct(F.lit("geometry").alias("kind"),
                      F.lit(None).cast("string").alias("text"),
                      F.lower(F.hex(geom)).alias("media_ref"),
                      (F.length("text") + 2).cast("int").alias("offset"))
    return d.select(F.col("doc_id"),
                    F.array(span_t, span_g).alias("spans"))


def region_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(region_id, minx..maxy, geometry WKB box) from part.parquet."""
    p = _read(spark, sf_dir, "part")
    minx = ((F.col("p_partkey") * 40503 + 101) % 650000).cast("double")
    miny = ((F.col("p_partkey") * 69301 + 257) % 1250000).cast("double")
    w = ((F.col("p_partkey") * 97 + 13) % 50000 + 1000).cast("double")
    h = ((F.col("p_partkey") * 89 + 37) % 50000 + 1000).cast("double")
    return p.select(
        F.col("p_partkey").alias("region_id"),
        minx.alias("minx"), miny.alias("miny"),
        (minx + w).alias("maxx"), (miny + h).alias("maxy"),
        udfs.st_box()(minx, miny, minx + w, miny + h).alias("geometry"))


def doc_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, geometry WKB box) — rectangle per doc for bbox joins."""
    d = _read(spark, sf_dir, "documents")
    x, y = _pt_xy("doc_id")
    w = ((F.col("doc_id") * 31 + 7) % 20000 + 500).cast("double")
    h = ((F.col("doc_id") * 37 + 11) % 20000 + 500).cast("double")
    return d.select("doc_id",
                    udfs.st_box()(x, y, x + w, y + h).alias("geometry"))


def query_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN probe points from nation.parquet (25 rows at any sf)."""
    n = _read(spark, sf_dir, "nation")
    x = ((F.col("n_nationkey") * 104729 + 7) % 700000).cast("double")
    y = ((F.col("n_nationkey") * 130363 + 3) % 1300000).cast("double")
    return n.select(F.col("n_nationkey").alias("query_id"),
                    udfs.st_point()(x, y).alias("geometry"))


# SQL fragments mirroring the builders above (DuckDB dialect-neutral)
SQL_DOC_POINTS = """
  SELECT doc_id,
         CAST((doc_id*48271 + 17) % 700000  AS DOUBLE) AS x,
         CAST((doc_id*69621 + 29) % 1300000 AS DOUBLE) AS y
  FROM documents
"""

SQL_REGION_BOXES = """
  SELECT p_partkey AS region_id,
         CAST((p_partkey*40503 + 101) % 650000  AS DOUBLE) AS minx,
         CAST((p_partkey*69301 + 257) % 1250000 AS DOUBLE) AS miny,
         CAST((p_partkey*40503 + 101) % 650000
              + (p_partkey*97 + 13) % 50000 + 1000 AS DOUBLE) AS maxx,
         CAST((p_partkey*69301 + 257) % 1250000
              + (p_partkey*89 + 37) % 50000 + 1000 AS DOUBLE) AS maxy
  FROM part
"""

SQL_DOC_BOXES = """
  SELECT doc_id,
         CAST((doc_id*48271 + 17) % 700000  AS DOUBLE) AS minx,
         CAST((doc_id*69621 + 29) % 1300000 AS DOUBLE) AS miny,
         CAST((doc_id*48271 + 17) % 700000
              + (doc_id*31 + 7) % 20000 + 500 AS DOUBLE) AS maxx,
         CAST((doc_id*69621 + 29) % 1300000
              + (doc_id*37 + 11) % 20000 + 500 AS DOUBLE) AS maxy
  FROM documents
"""

SQL_QUERY_POINTS = """
  SELECT n_nationkey AS query_id,
         CAST((n_nationkey*104729 + 7) % 700000  AS DOUBLE) AS x,
         CAST((n_nationkey*130363 + 3) % 1300000 AS DOUBLE) AS y
  FROM nation
"""
