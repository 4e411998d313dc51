"""Interleaved-docs model: geometry extraction + span invariant."""

from pyspark.sql import functions as F

from cdap_geo_spark import docs as D, fixtures


def test_every_doc_has_primary_geometry(spark):
    dd = fixtures.documents(spark, 100, partitions=2)
    dg = D.with_geometry(dd)
    assert dg.filter(F.col("geometry").isNull()).count() == 0


def test_offsets_strictly_increasing(spark):
    dd = fixtures.documents(spark, 100, partitions=2)
    bad = dd.select(
        F.exists(
            F.zip_with(
                F.slice("spans", 1, F.size("spans") - 1),
                F.slice("spans", 2, F.size("spans") - 1),
                lambda a, b: b["offset"] <= a["offset"],
            ),
            lambda v: v,
        ).alias("bad")
    ).filter("bad").count()
    assert bad == 0


def test_malformed_hex_flags_null_not_crash(spark):
    rows = [("d1", [{"kind": "geometry", "text": None,
                     "media_ref": "NOT-HEX!!", "offset": 1}]),
            ("d2", [{"kind": "text", "text": "no geometry here",
                     "media_ref": None, "offset": 1}])]
    df = spark.createDataFrame(rows, D.DOCS_SCHEMA)
    out = D.with_geometry(df).select("doc_id", "geometry").collect()
    assert all(r.geometry is None for r in out)


def test_invariant_checker_detects_tampering(spark):
    dd = fixtures.documents(spark, 50, partitions=2).cache()
    assert D.check_span_invariant(dd, dd) == 0
    # reverse the span order of every doc -> all rows flagged
    tampered = dd.withColumn("spans", F.reverse("spans"))
    assert D.check_span_invariant(dd, tampered) > 0


def test_explode_geometries_keeps_spans(spark):
    dd = fixtures.documents(spark, 50, partitions=2).cache()
    ex = D.explode_geometries(dd)
    assert D.check_span_invariant(dd, ex) == 0
    assert ex.filter(F.col("geometry").isNotNull()).count() >= 50


def test_span_integrity_query_roundtrip(spark):
    """The input_hint invariant: span sequences survive the
    explode->shuffle->reassemble stage bit-for-bit, and every
    geometry span decodes to the doc-arithmetic coordinates."""
    import hashlib

    import pyarrow.parquet as pq

    import __spark_entry__ as E
    sf = "/root/testdata/sf0.001"
    got = {r.doc_id: (r.n_spans, r.fp, r.geom_ok)
           for r in E._q_span_integrity(spark, sf).collect()}
    t = pq.read_table(f"{sf}/documents.parquet").to_pydict()
    assert len(got) == len(t["doc_id"])
    for did, text in zip(t["doc_id"], t["text"]):
        raw = (f"text|{text}|1\x1fgeometry|~|{len(text) + 2}"
               .encode("utf-8"))
        assert got[did] == (2, hashlib.md5(raw).hexdigest(), 1)
