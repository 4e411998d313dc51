"""Hilbert curve index (operators/curves.py).

Pins: (1) the defining curve properties — bijection and unit grid steps
between consecutive indices — on the full order-5 grid; (2) Spark ==
pure-python reference on random coords at production order; (3) the
range-repartition layout: partitions hold disjoint contiguous Hilbert
runs (what makes the clustered write prune); (4) Hilbert locality beats
Morton on the same grid (mean consecutive-index grid distance).
"""

import random

import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.operators.curves import (hilbert_index, hilbert_py,
                                             hilbert_repartition)


def test_hilbert_bijection_and_unit_steps():
    order = 5
    n = 1 << order
    pos = {}
    for x in range(n):
        for y in range(n):
            d = hilbert_py(order, x, y)
            assert 0 <= d < n * n
            pos[d] = (x, y)
    assert len(pos) == n * n  # bijection
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = pos[d - 1], pos[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1  # unit steps, always


def test_hilbert_spark_matches_reference(spark):
    random.seed(11)
    rows = [(i, random.randrange(1 << 21), random.randrange(1 << 21))
            for i in range(1500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id: r.h for r in hilbert_index(df, order=21).collect()}
    assert got == {i: hilbert_py(21, x, y) for i, x, y in rows}


def test_hilbert_keeps_columns_and_validates(spark):
    df = spark.createDataFrame([(1, 2, 3, "a")], "id long, x long, y long, tag string")
    out = hilbert_index(df, order=4)
    assert out.columns == ["id", "x", "y", "tag", "h"]
    assert out.first().tag == "a"
    with pytest.raises(ValueError):
        hilbert_index(df, order=0)
    with pytest.raises(ValueError):
        hilbert_index(df, order=32)


def test_hilbert_repartition_contiguous_ranges(spark):
    random.seed(3)
    rows = [(i, random.randrange(256), random.randrange(256))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    parts = (hilbert_repartition(df, order=8, num_partitions=8)
             .select("_hilbert")
             .withColumn("p", F.spark_partition_id())
             .groupBy("p")
             .agg(F.min("_hilbert").alias("lo"), F.max("_hilbert").alias("hi"))
             .collect())
    spans = sorted((r.lo, r.hi) for r in parts)
    assert len(spans) >= 2
    for (lo0, hi0), (lo1, hi1) in zip(spans, spans[1:]):
        assert hi0 <= lo1  # disjoint contiguous runs -> prunable files


def test_hilbert_locality_beats_morton():
    # mean grid distance between consecutive curve indices: Hilbert is
    # exactly 1 by construction; Morton jumps across block seams.
    order = 5
    n = 1 << order

    def morton(x: int, y: int) -> int:
        d = 0
        for b in range(order):
            d |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return d

    mpos = {morton(x, y): (x, y) for x in range(n) for y in range(n)}
    mdist = sum(abs(mpos[d - 1][0] - mpos[d][0])
                + abs(mpos[d - 1][1] - mpos[d][1])
                for d in range(1, n * n)) / (n * n - 1)
    assert mdist > 1.5  # Morton's seam jumps
    # Hilbert == 1.0 exactly is already pinned by unit-steps above


def test_hilbert_index_plan_is_exchange_free(spark):
    """The whole bit walk must stay map-side: zero Exchange nodes in
    the physical plan (the 100 TB contract for a write-layout key)."""
    from cdap_geo_spark.operators.bucketed import plan_has_no_exchange
    df = spark.range(1000).selectExpr("id", "id % 32 AS x",
                                      "(id * 7) % 32 AS y")
    out = hilbert_index(df, order=5)
    assert plan_has_no_exchange(out)
