"""Streaming operators (Structured Streaming + batch-equivalent)."""

from cdap_geo_spark.streaming.enrich import spatial_enrich_stream  # noqa: F401
