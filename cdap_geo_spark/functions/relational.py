"""Relational utility operators from the reference's utils layer."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sdf_groupmax(df: DataFrame, group, maximise: str) -> DataFrame:
    """Per-group argmax: keep rows whose ``maximise`` equals the group
    max (ties kept) — verbatim semantics of the reference's
    ``sdf_groupmax`` (``cdap_geo/utils.py:82-89``), expressed with the
    same window aggregate."""
    group = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*group)
    return (df.withColumn("_gmax", F.max(maximise).over(w))
              .filter(F.col(maximise) == F.col("_gmax"))
              .drop("_gmax"))


def global_bounds(df: DataFrame, minx="minx", miny="miny",
                  maxx="maxx", maxy="maxy") -> DataFrame:
    """Dataset bbox aggregate — the reference's ``geoparquetify`` stats
    pass (``cdap_geo/write.py:43-54``) as one partial+final hash agg."""
    return df.agg(F.min(minx).alias("minx"), F.min(miny).alias("miny"),
                  F.max(maxx).alias("maxx"), F.max(maxy).alias("maxy"))


def sdf_force_execute(df: DataFrame) -> None:
    """Materialize without collecting — noop-format write, the
    reference's bench trick (``cdap_geo/utils.py:57-59``)."""
    df.write.format("noop").mode("overwrite").save()
