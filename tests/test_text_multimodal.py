"""Text-analysis + multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_token_and_quality_counts(spark):
    from cdap_geo_spark.operators.text import quality_features
    rows = [(1, "Hello, world. The cat and the dog."),
            (2, ""), (3, "   "), (4, "one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality_features(df).collect()}
    assert out[1].n_tokens == 7
    assert out[1].n_commas == 1 and out[1].n_periods == 2
    assert out[1].n_the == 2  # ' the ' twice in padded lowercase
    assert out[2].n_tokens == 0 and out[3].n_tokens == 0
    assert out[4].n_tokens == 1


def test_lang_votes_prediction(spark):
    from cdap_geo_spark.operators.text import lang_votes
    rows = [(1, "the cat and the dog of the house"),
            (2, "der hund und die katze und der vogel"),
            (3, "le chat et la maison et le chien"),
            (4, "el perro que los gatos que el raton"),
            (5, "xyzzy plugh")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.lang_pred for r in lang_votes(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_shingles_short_text(spark):
    from cdap_geo_spark.operators.text import shingles
    rows = [(1, "ab"), (2, "abc"), (3, "abcd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.sh for r in
           df.select("doc_id", shingles(F.col("text")).alias("sh")).collect()}
    assert out[1] == []
    assert out[2] == ["abc"]
    assert sorted(out[3]) == ["abc", "bcd"]


def test_winnow_fingerprints_detect_overlap(spark):
    from cdap_geo_spark.operators.text import winnow_fingerprints
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(1, base), (2, base + " and then some extra tail content"),
            (3, "completely different content with no overlap at all xyz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints()
    out = {r.doc_id: set(r.f) for r in
           df.select("doc_id", fp(F.col("text")).alias("f")).collect()}
    # shared prefix -> large fingerprint overlap; disjoint text -> tiny
    j12 = len(out[1] & out[2]) / len(out[1] | out[2])
    j13 = len(out[1] & out[3]) / len(out[1] | out[3])
    assert j12 > 0.5 > j13


def test_media_feature_extraction_deterministic(spark):
    from cdap_geo_spark.operators.multimodal import (
        deterministic_fake_decode, extract_features, media_metadata)
    rows = [(1, b"imagebytes-aaaa"), (2, b"imagebytes-bbbb"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = extract_features(df, decode=deterministic_fake_decode).toPandas()
    out = out.set_index("doc_id")
    assert bool(out.loc[1].decode_ok) and bool(out.loc[2].decode_ok)
    assert not bool(out.loc[3].decode_ok) and out.loc[3].features is None
    assert len(out.loc[1].features) == 16
    # deterministic: same blob -> same features across runs
    out2 = extract_features(df, decode=deterministic_fake_decode).toPandas() \
        .set_index("doc_id")
    assert list(out.loc[1].features) == list(out2.loc[1].features)
    # metadata is native and null-safe
    meta = media_metadata(df).select("doc_id", "media_meta.n_bytes").collect()
    assert {r.doc_id: r.n_bytes for r in meta}[1] == 15


def test_media_decode_stub_raises(spark):
    from cdap_geo_spark.operators.multimodal import extract_features
    df = spark.createDataFrame([(1, b"x")], "doc_id long, media binary")
    with pytest.raises(Exception):  # NotImplementedError via Py4J
        extract_features(df).collect()


def test_frame_sample_refs(spark):
    from cdap_geo_spark.operators.multimodal import frame_sample_refs
    df = spark.createDataFrame([(1, 25), (2, 5)],
                               "doc_id long, n_frames int")
    out = frame_sample_refs(df, every=10).collect()
    got = sorted((r.doc_id, r.frame_idx) for r in out)
    assert got == [(1, 0), (1, 10), (1, 20), (2, 0)]
