"""Interleaved text+media document model (the engine's input shape).

``BASELINE.json`` ``input_hint``: the engine's primary input is a table
``(doc_id: string, spans: array<struct<kind:string, text:string,
media_ref:string, offset:int>>)``. Geometry spans carry hex-encoded WKB
in ``media_ref``. The per-row invariant is span-sequence equality —
(kind, text, media_ref, order) must survive every stage bit-for-bit.

Everything here is native Catalyst expressions (higher-order array
functions), zero Python: geometry extraction never explodes the spans
array, so the payload path cannot reorder spans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

SPAN_TYPE = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN_TYPE)),
])


def geometry_spans(spans: Column | str = "spans") -> Column:
    """Subarray of geometry-kind spans, original order preserved."""
    return F.filter(spans, lambda s: s["kind"] == F.lit("geometry"))


def primary_geometry(spans: Column | str = "spans") -> Column:
    """WKB bytes of the doc's first geometry span (engine convention:
    the primary geometry). NULL when the doc has none or the hex is
    malformed — malformed hex must flag, not crash (FIXTURES.md §4):
    ``unhex`` yields NULL on bad input."""
    first = F.try_element_at(geometry_spans(spans), F.lit(1))
    return F.unhex(first["media_ref"])


def with_geometry(df: DataFrame, out: str = "geometry") -> DataFrame:
    """Attach the primary geometry WKB column; spans stay untouched."""
    return df.withColumn(out, primary_geometry("spans"))


def explode_geometries(df: DataFrame) -> DataFrame:
    """One row per geometry span: (doc_id, span_idx, geometry, spans...).

    Uses ``posexplode`` over a *filtered copy* of the spans array —
    the original ``spans`` column rides along untouched, so the span
    invariant holds on the output too.
    """
    g = df.withColumn("_gspans", geometry_spans("spans"))
    g = g.select(
        "*",
        F.posexplode_outer("_gspans").alias("span_idx", "_gspan"),
    ).drop("_gspans")
    return g.withColumn("geometry", F.unhex(F.col("_gspan")["media_ref"])) \
            .drop("_gspan")


def span_fingerprint(spans: Column | str = "spans") -> Column:
    """Order-sensitive digest of the exact span sequence
    (kind, text, media_ref, offset) — the invariant witness. Native
    ``to_json`` serializes array elements in order, so equal
    fingerprints <=> equal sequences."""
    return F.md5(F.to_json(spans))


def check_span_invariant(before: DataFrame, after: DataFrame,
                         key: str = "doc_id") -> int:
    """Number of docs whose span sequence changed (0 == invariant held).

    ``after`` may repeat doc_ids (e.g. join outputs); every occurrence
    must carry the original sequence.
    """
    b = before.select(F.col(key), span_fingerprint("spans").alias("_fp_b"))
    a = after.select(F.col(key), span_fingerprint("spans").alias("_fp_a")) \
             .dropDuplicates([key, "_fp_a"])
    joined = a.join(b, key, "left")
    return joined.filter(
        F.col("_fp_b").isNull() | (F.col("_fp_a") != F.col("_fp_b"))
    ).count()
