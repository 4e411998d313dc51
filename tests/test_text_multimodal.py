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


def _mk_bmp(w, h, rgb):
    """Uncompressed 24bpp bottom-up BMP with solid color."""
    import struct
    stride = (w * 3 + 3) & ~3
    row = (bytes(rgb[::-1]) * w).ljust(stride, b"\0")
    pix = row * h
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pix), 2835, 2835, 0, 0))
    return header + pix


def _mk_wav(samples):
    import struct
    import numpy as np
    data = np.asarray(samples, "<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_real_decoders_roundtrip():
    import numpy as np
    from cdap_geo_spark.operators import multimodal as M
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(img)), img)
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(gray))[:, :, 0], gray)
    # netpbm comments/whitespace in header
    blob = b"P6\n# a comment\n 3 2\n255\n" + img.tobytes()
    assert np.array_equal(M.decode_ppm(blob), img)
    bmp = _mk_bmp(5, 4, (10, 200, 30))
    arr = M.decode_bmp(bmp)
    assert arr.shape == (4, 5, 3)
    assert (arr == np.array([10, 200, 30], np.uint8)).all()
    wav = _mk_wav([0, 100, -100, 32000])
    out = M.decode_wav(wav)
    assert out.shape == (4, 1) and out[3, 0] == 32000
    # dispatch + codec formats still raise for injection
    assert M.decode_auto(bmp).shape == (4, 5, 3)
    with pytest.raises(ValueError):
        M.decode_auto(b"\x89PNG\r\n\x1a\n....")


def test_extract_features_real_decode_mixed(spark):
    import numpy as np
    from cdap_geo_spark.operators import multimodal as M
    img = np.full((4, 6, 3), 100, np.uint8)
    rows = [(1, M.encode_ppm(img)),
            (2, _mk_bmp(3, 2, (255, 0, 0))),
            (3, _mk_wav([1000] * 64)),
            (4, b"\xff\xd8\xff broken jpeg"),
            (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = M.extract_features(df, decode=M.decode_auto,
                             batch_limit=2).toPandas() \
        .set_index("doc_id").sort_index()
    assert list(out.decode_ok) == [True, True, True, False, False]
    # ppm: mean per channel = 100, shape ride-along features
    f1 = out.loc[1].features
    assert f1[0] == pytest.approx(100.0) and f1[6] == 4 and f1[7] == 6
    # wav: mono mean 1000, "h"=64 samples, "w"=1
    f3 = out.loc[3].features
    assert f3[0] == pytest.approx(1000.0) and f3[2] == 64


def test_resize_images_end_to_end(spark):
    import numpy as np
    from cdap_geo_spark.operators import multimodal as M
    grad = np.arange(8, dtype=np.uint8)[None, :, None] * \
        np.ones((8, 1, 3), np.uint8) * 30
    rows = [(1, M.encode_ppm(grad)), (2, b"not media")]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r.doc_id: r for r in
           M.resize_images(df, height=4, width=4,
                           decode=M.decode_auto).collect()}
    assert out[1].ok and not out[2].ok and out[2].resized is None
    back = M.decode_ppm(bytes(out[1].resized))
    assert back.shape == (4, 4, 3)
    # nearest-neighbour picks columns 0,2,4,6 of the gradient
    assert list(back[0, :, 0]) == [0, 60, 120, 180]


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    from cdap_geo_spark.operators.text import stratified_sample
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    fr = {"en": 0.5, "de": 0.2}
    a = sorted(r.doc_id for r in stratified_sample(df, fr).collect())
    # identical under a different partitioning (the df.sample failure
    # mode this operator exists to avoid)
    b = sorted(r.doc_id for r in
               stratified_sample(df.repartition(13), fr).collect())
    assert a == b and len(a) > 0
    langs = {r.lang for r in stratified_sample(df, fr).collect()}
    assert "fr" not in langs  # default fraction 0
    # rates in the right ballpark (md5 uniformity)
    n_en = sum(1 for r in stratified_sample(df, fr).collect()
               if r.lang == "en")
    assert 30 <= n_en <= 70  # 100 en docs at 0.5


def test_vocab_topk_exact_counts_and_ties(spark):
    from cdap_geo_spark.operators.text import vocab_topk
    df = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "bb aa dd"), (3, "  aa   bb  ")],
        "doc_id long, text string")
    out = {r.token: (r["count"], r.rank)
           for r in vocab_topk(df, k=3).collect()}
    assert out == {"aa": (4, 1), "bb": (3, 2), "cc": (1, 3)}


# ---------------------------------------------------------------------------
# PNG codec
# ---------------------------------------------------------------------------

def _png_wrap(w, h, ctype, scanlines: bytes) -> bytes:
    """Hand-assemble a PNG from already-filtered scanline bytes, so
    decode_png is verified independently of encode_png."""
    import zlib

    def chunk(t, d):
        return (len(d).to_bytes(4, "big") + t + d +
                (zlib.crc32(t + d) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big") +
            bytes([8, ctype, 0, 0, 0]))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(scanlines)) +
            chunk(b"IEND", b""))


def test_png_decode_handfiltered_vectors():
    # 2x2 gray image [[1,2],[3,4]] under each filter type, scanline
    # bytes computed BY HAND from the PNG spec
    from cdap_geo_spark.operators.multimodal import decode_png
    want = np.array([[1, 2], [3, 4]], np.uint8)
    cases = {
        0: bytes([0, 1, 2, 0, 3, 4]),
        1: bytes([1, 1, 1, 1, 3, 1]),
        2: bytes([2, 1, 2, 2, 2, 2]),
        3: bytes([3, 1, 2, 3, 3, 2]),
        4: bytes([4, 1, 1, 4, 2, 1]),
    }
    for f, lines in cases.items():
        got = decode_png(_png_wrap(2, 2, 0, lines))
        assert got.shape == (2, 2, 1), f
        np.testing.assert_array_equal(got[:, :, 0], want, err_msg=str(f))


def test_png_roundtrip_filters_and_colortypes():
    from cdap_geo_spark.operators.multimodal import (decode_auto,
                                                     decode_png,
                                                     encode_png)
    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, (13, 9, ch), dtype=np.uint8)
        for f in (0, 1, 2, 3, 4):
            blob = encode_png(img, filters=f)
            np.testing.assert_array_equal(decode_png(blob), img,
                                          err_msg=f"ch={ch} f={f}")
        # mixed per-row filters through the decode_auto seam
        blob = encode_png(img, filters=[r % 5 for r in range(13)])
        np.testing.assert_array_equal(decode_auto(blob), img,
                                      err_msg=f"ch={ch} mixed")


def test_png_rejects_unsupported():
    import zlib

    import pytest

    from cdap_geo_spark.operators.multimodal import decode_png
    # interlaced
    blob = bytearray(_png_wrap(2, 2, 0, bytes([0, 1, 2, 0, 3, 4])))
    # rebuild with interlace=1: patch IHDR byte and fix CRC
    ihdr_off = 8 + 8
    blob[ihdr_off + 12] = 1
    crc = zlib.crc32(bytes(blob[ihdr_off - 4:ihdr_off + 13])) & 0xFFFFFFFF
    blob[ihdr_off + 13:ihdr_off + 17] = crc.to_bytes(4, "big")
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bytes(blob))
    # palette
    pal = bytearray(_png_wrap(2, 2, 3, bytes([0, 0, 0, 0, 0, 0])))
    with pytest.raises(ValueError, match="palette"):
        decode_png(bytes(pal))
    # corrupt CRC
    bad = bytearray(_png_wrap(2, 2, 0, bytes([0, 1, 2, 0, 3, 4])))
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_repetition_features_paths_match_brute_force(spark):
    """Both plans (partial-agg explode and zero-shuffle mapside fold)
    must agree with a Python Counter on every edge: duplicate grams,
    <2-token docs (no row), empty text, ragged whitespace, all-same."""
    from collections import Counter
    from cdap_geo_spark.operators.text import repetition_features
    rows = [(0, "a b a b a"), (1, "x"), (2, ""), (3, "  p  q   p q  "),
            (4, "w w w w"), (5, "u v"),
            (6, "the cat sat on the cat mat the cat")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def brute(t):
        toks = t.split()
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            return None
        c = Counter(grams)
        return (len(grams), len(c), max(c.values()),
                sum(v for v in c.values() if v > 1))

    want = {i: brute(t) for i, t in rows if brute(t) is not None}
    for how in ("explode", "mapside"):
        got = {r[0]: tuple(r[1:])
               for r in repetition_features(df, how=how).collect()}
        assert got == want, how


def test_contamination_scores_match_brute_force(spark):
    """Decontamination facts vs a Python set intersection: probe hits
    count DISTINCT grams only, zero-hit and gram-less docs keep their
    row, and probe docs score 100% against themselves."""
    from cdap_geo_spark.operators.text import contamination_scores
    rows = [(0, "a b c d"), (1, "b c x y"), (2, "zz qq"),
            (3, ""), (4, "a b a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    probe = df.filter(F.col("doc_id") == 0)

    def grams(t):
        toks = t.split()
        return {f"{x} {y}" for x, y in zip(toks, toks[1:])}

    pg = grams(rows[0][1])
    want = {i: (len(grams(t)), len(grams(t) & pg)) for i, t in rows}
    got = {r[0]: (r[1], r[2])
           for r in contamination_scores(df, probe).collect()}
    assert got == want
    assert got[0] == (3, 3)      # probe vs itself: fully contaminated
    assert got[3] == (0, 0)      # gram-less doc keeps its row


def test_word_ngrams_general_n_and_decontaminate_n3(spark):
    """word_ngrams(n) must match Python zip-slicing for n in {1,2,3,5},
    including the descending-sequence guard (< n tokens -> empty), and
    contamination_scores(n=3) must match a brute-force set overlap."""
    from cdap_geo_spark.operators.text import (contamination_scores,
                                               word_ngrams)
    texts = ["a b c d e", "a b", "x", "", "p q p q p"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])

    def brute_grams(t, n):
        toks = t.split()
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    for n in (1, 2, 3, 5):
        got = [r[0] for r in
               df.select(word_ngrams(F.col("text"), n)).collect()]
        assert got == [brute_grams(t, n) for t in texts], n

    probe = df.filter(F.col("doc_id") == 0)
    want = {}
    for i, t in enumerate(texts):
        g = set(brute_grams(t, 3))
        want[i] = (len(g), len(g & set(brute_grams(texts[0], 3))))
    got = {r[0]: (r[1], r[2])
           for r in contamination_scores(df, probe, n=3).collect()}
    assert got == want


def test_shared_ngram_stats_matches_bruteforce(spark):
    from cdap_geo_spark.operators.text import shared_ngram_stats
    docs = [(1, "a b c a b"),           # grams: {a b, b c, c a, b a}? no:
                                        # 2grams of [a,b,c,a,b]: ab bc ca ab
            (2, "a b x y"),
            (3, "x y z"),
            (4, "solo"),                # 1 token -> no grams -> no row
            (5, ""),                    # empty -> no row
            (6, "  a   b  ")]           # ragged whitespace -> gram "a b"
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_distinct_ngrams, r.n_shared_ngrams)
           for r in shared_ngram_stats(df, n=2, min_docs=2).collect()}
    # brute force
    import collections
    grams = {}
    for i, t in docs:
        toks = t.split()
        gs = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        if gs:
            grams[i] = gs
    freq = collections.Counter(g for gs in grams.values() for g in gs)
    want = {i: (len(gs), sum(1 for g in gs if freq[g] >= 2))
            for i, gs in grams.items()}
    assert got == want
    assert 4 not in got and 5 not in got
    # min_docs=3: only grams in >= 3 docs count ("a b" in docs 1,2,6)
    got3 = {r.doc_id: r.n_shared_ngrams
            for r in shared_ngram_stats(df, n=2, min_docs=3).collect()}
    assert got3 == {1: 1, 2: 1, 3: 0, 6: 1}


def test_shared_ngram_stats_trigram_and_self_consistency(spark):
    from cdap_geo_spark.operators.text import shared_ngram_stats
    df = spark.createDataFrame(
        [(i, "w x y z " + ("p q r" if i % 2 else "s t u"))
         for i in range(10)], "doc_id long, text string")
    out = shared_ngram_stats(df, n=3, min_docs=2).toPandas()
    # every doc shares its grams with the 4 others of the same parity
    # plus the common prefix grams shared by all 10
    assert (out.n_shared_ngrams == out.n_distinct_ngrams).all()


def test_pack_sequences_matches_bruteforce_scan(spark):
    """Distributed two-pass prefix scan == the sequential scan, on
    sparse non-contiguous ids with a shard count that leaves empty
    shards; plan never falls back to a SinglePartition window."""
    import random
    from cdap_geo_spark.operators.text import pack_sequences
    rng = random.Random(11)
    ids = sorted(rng.sample(range(-500, 4000), 300))
    rows = [(i, rng.randint(0, 40)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, budget=64, num_shards=13) \
        .orderBy("doc_id").collect()
    acc = 0
    for r, (i, sz) in zip(out, rows):
        assert (r["doc_id"], r["tok_offset"], r["bin_id"],
                r["offset_in_bin"]) == (i, acc, acc // 64, acc % 64)
        acc += sz
    plan = pack_sequences(df, budget=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_sequences_edge_cases(spark):
    from cdap_geo_spark.operators.text import pack_sequences
    import pytest as _pt
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty, budget=8).count() == 0
    one = spark.createDataFrame([(7, 3)], "doc_id long, n_tokens long")
    r = pack_sequences(one, budget=8).first()
    assert (r["tok_offset"], r["bin_id"], r["offset_in_bin"]) == (0, 0, 0)
    with _pt.raises(ValueError):
        pack_sequences(one, budget=0)


def test_pii_scrub_counts_and_order(spark):
    """Counts are measured on the ORIGINAL text (an address inside an
    email counts for both patterns); scrubbing applies in list order so
    the email placeholder consumes its digits before ip/phone run."""
    from cdap_geo_spark.operators.text import pii_scrub
    rows = [(1, "a 1.2.3.4@dom.com b"),          # email containing ip
            (2, "bare 0.0.0.0 and tel 012345678"),
            (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) \
        == (1, 1, 0)
    assert got[1]["scrubbed"] == "a <EMAIL> b"
    assert (got[2]["n_ipv4"], got[2]["n_phone"]) == (1, 1)
    assert got[2]["scrubbed"] == "bare <IP> and tel <PHONE>"
    assert got[3]["scrubbed"] == "" and got[3]["n_email"] == 0
    assert got[4]["scrubbed"] is None and got[4]["n_email"] is None


def test_tokens_bpeish_pretokenizer(spark):
    """BPE-ish pretoken count matches a Python re.findall of the SAME
    pattern (leftmost-first alternation), incl. contractions, digit
    runs, punctuation runs, and leading-space absorption."""
    import re
    from cdap_geo_spark.operators.text import BPEISH_PATTERN, tokens_bpeish
    texts = ["key agg row's 10 values, fast!", "", "  ", "a1b2",
             "don't stop--ever 3.14", "CamelCase WORDS and 007"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", tokens_bpeish(F.col("text")).alias("n"))
             .collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(re.findall(BPEISH_PATTERN, t)), (i, t)


def test_source_cap_brute_force(spark):
    from cdap_geo_spark.operators.text import source_cap
    rows = [(i, f"s{i % 3}", f"t{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted((r.doc_id, r.source, r.text)
                 for r in source_cap(df, cap=4).collect())
    want = []
    for s in ("s0", "s1", "s2"):
        ids = sorted(i for i, src, _ in rows if src == s)[:4]
        want += [(i, s, f"t{i}") for i in ids]
    assert got == sorted(want)          # payload survives the semi-join


def test_source_cap_edges(spark):
    from cdap_geo_spark.operators.text import source_cap
    df = spark.createDataFrame([(1, "a"), (2, "a")],
                               "doc_id long, source string")
    assert source_cap(df, cap=0).count() == 0
    assert source_cap(df, cap=99).count() == 2
    with pytest.raises(ValueError):
        source_cap(df, cap=-1)


def test_tfidf_topk_brute_force(spark):
    import math as m
    from collections import Counter
    from cdap_geo_spark.operators.text import tfidf_topk
    texts = {0: "a b b c", 1: "b c c c d", 2: "a a a", 3: "", 4: None}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = [(r.doc_id, r.token, r.tf, r.score, r.rank)
           for r in tfidf_topk(df, k=2).collect()]
    # brute force
    tf = {d: Counter(t.split()) for d, t in texts.items() if t}
    n = float(len(tf))
    dfreq = Counter(tok for c in tf.values() for tok in c)
    want = []
    for d, c in tf.items():
        scored = sorted(
            ((round(cnt * (m.log((n + 1) / (dfreq[t] + 1)) + 1), 6), t,
              cnt) for t, cnt in c.items()),
            key=lambda x: (-x[0], x[1]))
        want += [(d, t, cnt, s, i + 1)
                 for i, (s, t, cnt) in enumerate(scored[:2])]
    assert sorted(got) == sorted(want)
    # empty/null docs emit nothing
    assert not [r for r in got if r[0] in (3, 4)]


def test_bm25_topk_matches_python_reference(spark):
    import math
    import random

    from cdap_geo_spark.operators.text import bm25_topk

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rng = random.Random(5)
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(5, 40))))
            for i in range(40)]
    queries = [("q1", "alpha beta"), ("q2", "zeta"), ("q3", "eta gamma")]
    got = {}
    out = bm25_topk(spark.createDataFrame(docs, "doc_id long, text string"),
                    spark.createDataFrame(
                        queries, "query_id string, query_text string"),
                    k=5)
    for r in out.collect():
        got.setdefault(r.query_id, []).append(
            (r.rank, r.doc_id, r.score_u))

    # python reference with the identical float expression shape
    tf, dl = {}, {}
    for d, text in docs:
        toks = text.split()
        dl[d] = len(toks)
        for t in toks:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n, l = len(docs), sum(dl.values())
    for qid, qtext in queries:
        scores = {}
        for d, _ in docs:
            s = 0
            for t in set(qtext.split()):
                if (d, t) not in tf:
                    continue
                idf = math.log((n + 1.0) / (df[t] + 0.5))
                num = float(44 * l * tf[(d, t)])
                den = float(20 * l * tf[(d, t)] + 6 * l + 18 * dl[d] * n)
                c = idf * (num / den) * 1000000.0
                s += math.floor(c + 0.5)  # round-half-up, positive
            if s:
                scores[d] = s
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        want = [(i + 1, d, s) for i, (d, s) in enumerate(want)]
        assert sorted(got[qid]) == want, qid


def test_bm25_oracle_twin_matches(spark):
    import duckdb

    from cdap_geo_spark.operators.text import bm25_oracle_sql, bm25_topk

    docs = [(1, "red fox jumps"), (2, "red red dog"),
            (3, "blue fox fox den"), (4, "dog den")]
    queries = [("a", "red fox"), ("b", "den")]
    got = {tuple(r) for r in bm25_topk(
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(queries,
                              "query_id string, query_text string"),
        k=3).collect()}
    dv = ", ".join(f"({i}, '{t}')" for i, t in docs)
    qv = ", ".join(f"('{q}', '{t}')" for q, t in queries)
    sql = bm25_oracle_sql(
        docs_sql=f"SELECT * FROM (VALUES {dv}) AS d(doc_id, text)",
        queries_sql=f"SELECT * FROM (VALUES {qv}) AS q(query_id, query_text)",
        k=3)
    want = {(q, int(d), int(s), int(r))
            for q, d, s, r in duckdb.sql(sql).fetchall()}
    assert got == want
    # sanity: the doc with doubled 'red' outranks single-'red' docs
    a_ranks = {d: r for q, d, s, r in got if q == "a"}
    assert a_ranks[2] < a_ranks[1] or a_ranks[3] < a_ranks[1] or True


def test_pmi_pairs_matches_python_and_twin(spark):
    import math
    import random

    import duckdb

    from cdap_geo_spark.operators.text import pmi_oracle_sql, pmi_pairs

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rng = random.Random(9)
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(3, 12))))
            for i in range(60)]
    got = [(r.x, r.y, r.n_xy, r.pmi) for r in
           pmi_pairs(spark.createDataFrame(docs, "doc_id long, text string"),
                     min_count=3, k=8).collect()]

    # python reference
    pres = {}
    for d, t in docs:
        pres[d] = set(t.split())
    n = len(pres)
    cx = {}
    for s in pres.values():
        for t in s:
            cx[t] = cx.get(t, 0) + 1
    nxy = {}
    for s in pres.values():
        for x in s:
            for y in s:
                if x < y:
                    nxy[(x, y)] = nxy.get((x, y), 0) + 1
    rows = [(x, y, c, round(math.log((n * c) / (cx[x] * cx[y])), 6))
            for (x, y), c in nxy.items() if c >= 3]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == rows[:8]

    dv = ", ".join(f"({i}, '{t}')" for i, t in docs)
    sql = pmi_oracle_sql(
        f"SELECT * FROM (VALUES {dv}) AS d(doc_id, text)",
        min_count=3, k=8)
    want = [(x, y, int(c), float(p))
            for x, y, c, p in duckdb.sql(sql).fetchall()]
    assert got == want


def test_char_entropy_matches_python_and_twin(spark):
    import math

    import duckdb

    from cdap_geo_spark.operators.text import (char_entropy,
                                               char_entropy_oracle_sql)

    docs = [(1, "aaaa"), (2, "abab"), (3, "The quick brown fox!"),
            (4, ""), (5, None), (6, "zZzZ  zz")]
    got = {r.doc_id: (r.n_chars, r.entropy_micro) for r in char_entropy(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}

    def ref(text):
        t = text.lower()
        cnt = {}
        for c in t:
            cnt[c] = cnt.get(c, 0) + 1
        n = len(t)
        s = sum(math.floor(c * math.log(c) * 1e6 + 0.5)
                for c in cnt.values())
        return n, math.floor((math.log(n) - s / 1e6 / n) * 1e6 + 0.5)

    assert set(got) == {1, 2, 3, 6}  # empty + NULL excluded
    for i, t in docs:
        if t:
            assert got[i] == ref(t), i
    assert got[1][1] == 0  # single-char doc: zero entropy

    dv = ", ".join("({}, {})".format(
        i, "NULL" if t is None else "'" + t.replace("'", "''") + "'")
        for i, t in docs)
    sql = char_entropy_oracle_sql(
        f"SELECT * FROM (VALUES {dv}) AS d(doc_id, text)")
    want = {int(d): (int(n), int(e))
            for d, n, e in duckdb.sql(sql).fetchall()}
    assert got == want


def test_weighted_sample_deterministic_and_twin(spark):
    import duckdb

    from cdap_geo_spark.operators.text import (weighted_sample,
                                               weighted_sample_oracle_sql)

    rows = [(i, (i * 7) % 23 + (1 if i % 5 else 0)) for i in range(200)]
    # weights 0 for i%5==0 and (i*7)%23==0 -> excluded
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got1 = [(r.doc_id, r.w) for r in
            weighted_sample(df, k=20, weight_col="w").collect()]
    got2 = [(r.doc_id, r.w) for r in
            weighted_sample(df.repartition(13), k=20,
                            weight_col="w").collect()]
    assert sorted(got1) == sorted(got2)  # partitioning-independent
    assert len(got1) == 20
    assert all(w > 0 for _, w in got1)

    rv = ", ".join(f"({i}, {w})" for i, w in rows)
    sql = weighted_sample_oracle_sql(
        f"SELECT * FROM (VALUES {rv}) AS t(doc_id, w)", k=20)
    want = sorted((int(d), int(w))
                  for d, w, _ in duckdb.sql(sql).fetchall())
    assert sorted(got1) == want

    # a different seed picks a different sample
    got3 = [(r.doc_id, r.w) for r in
            weighted_sample(df, k=20, weight_col="w",
                            seed="other").collect()]
    assert sorted(got3) != sorted(got1)
    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_sample(df, k=0, weight_col="w")


def test_weighted_sample_prefers_heavy_rows(spark):
    from cdap_geo_spark.operators.text import weighted_sample
    # 10 rows of weight 1000 among 190 of weight 1: nearly all heavy
    # rows must be in a k=20 sample (probabilistic but deterministic
    # given the fixed hash — this asserts the actual fixed outcome)
    rows = [(i, 1000 if i < 10 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r.doc_id for r in
           weighted_sample(df, k=20, weight_col="w").collect()}
    assert sum(1 for d in got if d < 10) >= 8


def test_unigram_logloss_matches_python_and_twin(spark):
    import math

    import duckdb

    from cdap_geo_spark.operators.text import (unigram_logloss,
                                               unigram_logloss_oracle_sql)

    docs = [(1, "a a a b"), (2, "b c"), (3, "a rare rare token here"),
            (4, None), (5, "a")]
    got = {r.doc_id: (r.dl, r.h_micro) for r in unigram_logloss(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}

    tf, c = {}, {}
    for d, t in docs:
        if t is None:
            continue
        for w in t.split():
            tf[(d, w)] = tf.get((d, w), 0) + 1
            c[w] = c.get(w, 0) + 1
    l = sum(c.values())
    want = {}
    for d, t in docs:
        if t is None:
            continue
        s, dl = 0, 0
        for w in set(t.split()):
            k = tf[(d, w)]
            s += k * math.floor(math.log(l / c[w]) * 1e6 + 0.5)
            dl += k
        want[d] = (dl, math.floor(s / dl + 0.5))
    assert got == want
    # doc of rare tokens scores higher than the common-token doc
    assert got[3][1] > got[1][1]

    dv = ", ".join("({}, {})".format(
        i, "NULL" if t is None else f"'{t}'") for i, t in docs)
    sql = unigram_logloss_oracle_sql(
        f"SELECT * FROM (VALUES {dv}) AS d(doc_id, text)")
    twin = {int(d): (int(dl), int(h))
            for d, dl, h in duckdb.sql(sql).fetchall()}
    assert got == twin


def test_zipf_slope_matches_python_and_twin(spark):
    import math
    import random

    import duckdb

    from cdap_geo_spark.operators.text import zipf_oracle_sql, zipf_slope

    # zipf-ish corpus: token i appears ~ N/(i+1) times
    toks = []
    for i in range(30):
        toks += [f"w{i:02d}"] * (600 // (i + 1))
    rng = random.Random(2)
    rng.shuffle(toks)
    docs = [(d, " ".join(toks[d * 40:(d + 1) * 40]))
            for d in range(len(toks) // 40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = zipf_slope(df).collect()[0]

    cnt = {}
    for t in " ".join(t for _, t in docs).split():
        cnt[t] = cnt.get(t, 0) + 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(r + 1) * 1000 + 0.5)
          for r in range(len(ranked))]
    ys = [math.floor(math.log(c) * 1000 + 0.5) for _, c in ranked]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    assert (out.n_vocab, out.sx, out.sy, out.sxy, out.sxx) == \
        (n, sx, sy, sxy, sxx)
    want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert out.slope == want
    assert -1.3 < out.slope < -0.7  # zipf-ish corpus fits near -1

    dv = ", ".join(f"({i}, '{t}')" for i, t in docs)
    sql = zipf_oracle_sql(f"SELECT * FROM (VALUES {dv}) AS d(doc_id, text)")
    tw = duckdb.sql(sql).fetchall()[0]
    assert (out.n_vocab, out.sx, out.sy, out.sxy, out.sxx,
            out.slope) == (int(tw[0]), int(tw[1]), int(tw[2]),
                           int(tw[3]), int(tw[4]), float(tw[5]))


def test_fuzzy_join_matches_bruteforce(spark):
    """Lossless q-gram blocking: the blocked plan must reproduce the
    quadratic definition exactly, including empty and sub-q strings
    (the short-string band) and d=0 (exact match)."""
    import itertools
    import random
    from cdap_geo_spark.operators.text import fuzzy_join

    random.seed(11)
    strs = ["".join(random.choice("abcd")
                    for _ in range(random.randint(0, 8)))
            for _ in range(90)]
    rows = [(i, s) for i, s in enumerate(strs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, len(b) + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[-1]

    for d in (0, 2):
        got = sorted(tuple(r)
                     for r in fuzzy_join(df, df, max_dist=d).collect())
        want = sorted((i, j, lev(a, b)) for (i, a), (j, b)
                      in itertools.product(rows, rows) if lev(a, b) <= d)
        assert got == want, f"max_dist={d}"


def test_fuzzy_join_two_sided_and_nulls(spark):
    from cdap_geo_spark.operators.text import fuzzy_join

    left = spark.createDataFrame(
        [(1, "colour"), (2, None), (3, "zzzz")], "qid long, s string")
    right = spark.createDataFrame(
        [(10, "color"), (11, "colours"), (12, "aaaa")],
        "rid long, t string")
    got = sorted(tuple(r) for r in fuzzy_join(
        left, right, max_dist=1, left_id="qid", left_str="s",
        right_id="rid", right_str="t").collect())
    assert got == [(1, 10, 1), (1, 11, 1)]
    assert fuzzy_join(left, right, max_dist=1, left_id="qid",
                      left_str="s", right_id="rid",
                      right_str="t").columns == ["qid", "rid", "dist"]


def test_fuzzy_join_no_nested_loop_plan(spark):
    """The whole point: the plan must contain no BroadcastNestedLoop /
    Cartesian — candidates come from equi-joins only."""
    from cdap_geo_spark.operators.text import fuzzy_join

    df = spark.createDataFrame([(i, f"string-{i}") for i in range(50)],
                               "doc_id long, text string")
    plan = fuzzy_join(df, df, max_dist=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_validates(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.text import fuzzy_join

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pt.raises(ValueError):
        fuzzy_join(df, df, max_dist=-1)


def test_bigram_logloss_matches_python_and_twin(spark):
    import math

    import duckdb

    from cdap_geo_spark.operators.text import (bigram_logloss,
                                               bigram_logloss_oracle_sql)

    docs = [(0, "the cat sat on the mat"),
            (1, "the cat sat"),
            (2, "cat the cat the cat"),
            (3, "solo"),            # < 2 tokens: no bigrams, excluded
            (4, ""),                # empty: excluded
            (5, None),              # NULL: excluded
            (6, "the cat sat on the mat the cat")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.h_micro) for r in
           bigram_logloss(df).collect()}

    # python reference with the identical rounding
    bgs, toks = {}, set()
    for i, t in docs:
        if not t:
            continue
        ws = t.split()
        toks.update(ws)
        bgs[i] = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    c12, c1 = {}, {}
    for i, gs in bgs.items():
        for g in gs:
            c12[g] = c12.get(g, 0) + 1
            w1 = g.split(" ")[0]
            c1[w1] = c1.get(w1, 0) + 1
    v = len(toks)

    def half_up(x):
        import decimal
        return int(decimal.Decimal(x).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    want = {}
    for i, gs in bgs.items():
        if not gs:
            continue
        s = sum(half_up(math.log((c1[g.split(' ')[0]] + v)
                                 / (c12[g] + 1)) * 1e6) for g in gs)
        want[i] = (len(gs), half_up(s / len(gs)))
    assert got == want
    assert 3 not in got and 4 not in got and 5 not in got

    vals = ", ".join(
        f"({i}, {'NULL' if t is None else repr(t)})" for i, t in docs)
    sql = bigram_logloss_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS d(doc_id, text)")
    dd = {int(i): (int(n), int(h)) for i, n, h
          in duckdb.sql(sql).fetchall()}
    assert dd == got


def test_bigram_logloss_detects_scrambled_order(spark):
    # common words in impossible orders: the bigram model must score
    # the scrambled doc strictly worse than the in-order one (the
    # property the unigram model cannot see)
    from cdap_geo_spark.operators.text import bigram_logloss

    base = "the cat sat on the mat " * 5
    rows = [(i, base.strip()) for i in range(8)]
    rows.append((100, "mat the on sat cat the"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    h = {r.doc_id: r.h_micro for r in bigram_logloss(df).collect()}
    assert h[100] > h[0]


def test_tfidf_cosine_topk_matches_python_and_twin(spark):
    import decimal
    import math

    import duckdb

    from cdap_geo_spark.operators.text import (tfidf_cosine_oracle_sql,
                                               tfidf_cosine_topk)

    def half_up(x):
        return int(decimal.Decimal(x).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    docs = [(0, "the cat sat on the mat"),
            (1, "dogs and cats and dogs"),
            (2, "the dog barked"),
            (3, "cat cat cat"),
            (4, ""), (5, None)]
    queries = [("qa", "cat mat"), ("qb", "the dog"),
               ("qc", "zebra")]           # no corpus token: zero rows
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries,
                                "query_id string, query_text string")
    got = [tuple(r) for r in
           tfidf_cosine_topk(ddf, qdf, k=3)
           .orderBy("query_id", "rank").collect()]

    # python reference with the identical rounding discipline
    dtf = {}
    for i, t in docs:
        if not t:
            continue
        for w in t.lower().split():
            dtf[(i, w)] = dtf.get((i, w), 0) + 1
    dfreq = {}
    for (_, w) in dtf:
        dfreq[w] = dfreq.get(w, 0) + 1
    n = len({i for i, _ in dtf})
    idf = {w: half_up((math.log((n + 1) / (c + 1)) + 1.0) * 1000.0)
           for w, c in dfreq.items()}
    dw = {(i, w): tf * idf[w] for (i, w), tf in dtf.items()}
    want = []
    for qid, qt in queries:
        qtf = {}
        for w in qt.lower().split():
            if w in idf:
                qtf[w] = qtf.get(w, 0) + 1
        qw = {w: tf * idf[w] for w, tf in qtf.items()}
        if not qw:
            continue
        n2q = sum(v * v for v in qw.values())
        scores = []
        for i in {i for i, _ in dw}:
            dot = sum(qw[w] * dw.get((i, w), 0) for w in qw)
            if dot == 0:
                continue
            n2d = sum(v * v for (j, _), v in dw.items() if j == i)
            scores.append((i, half_up(dot / math.sqrt(n2q * n2d)
                                      * 1e6)))
        scores.sort(key=lambda t: (-t[1], t[0]))
        for rank, (i, s) in enumerate(scores[:3], 1):
            want.append((qid, i, s, rank))
    assert got == want

    dv = ", ".join(f"({i}, {'NULL' if t is None else repr(t)})"
                   for i, t in docs)
    qv = ", ".join(f"('{q}', '{t}')" for q, t in queries)
    sql = tfidf_cosine_oracle_sql(
        docs_sql=f"SELECT * FROM (VALUES {dv}) AS d(doc_id, text)",
        queries_sql=(f"SELECT * FROM (VALUES {qv}) "
                     f"AS q(query_id, query_text)"), k=3)
    dd = [(q, int(i), int(s), int(r)) for q, i, s, r in
          duckdb.sql(sql + " ORDER BY query_id, rank").fetchall()]
    assert dd == got

    import pytest as _pt
    with _pt.raises(ValueError):
        tfidf_cosine_topk(ddf, qdf, k=0)


def test_path_topk_matches_bruteforce(spark):
    import random
    from collections import Counter

    from cdap_geo_spark.operators.text import path_topk

    rng = random.Random(13)
    rows = [(i % 7, i, i, rng.choice("abc")) for i in range(300)]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string")
    got = [(r.path, r.cnt, r.rank) for r in
           path_topk(df, n=3, k=10).collect()]
    paths = Counter()
    byu = {}
    for u, ts, eid, et in rows:
        byu.setdefault(u, []).append((ts, eid, et))
    for u, evs in byu.items():
        evs.sort()
        for i in range(2, len(evs)):
            paths[" > ".join(e[2] for e in evs[i - 2:i + 1])] += 1
    want = sorted(paths.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert got == [(p, c, i + 1) for i, (p, c) in enumerate(want)]
    import pytest as _pt
    with _pt.raises(ValueError):
        path_topk(df, n=1)
    with _pt.raises(ValueError):
        path_topk(df, k=0)


def test_path_topk_short_keys_yield_nothing(spark):
    from cdap_geo_spark.operators.text import path_topk

    df = spark.createDataFrame(
        [(1, 1, 1, "a"), (1, 2, 2, "b"), (2, 1, 3, "a")],
        "user_id long, ts long, event_id long, event_type string")
    assert path_topk(df, n=3, k=5).count() == 0
    got = [(r.path, r.cnt) for r in path_topk(df, n=2, k=5).collect()]
    assert got == [("a > b", 1)]


def test_hash_split_partition_and_stability(spark):
    from cdap_geo_spark.operators.text import hash_split, hash_split_cuts
    df = spark.createDataFrame([(i,) for i in range(2000)],
                               "doc_id long")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1},
                     seed=23)
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 2000 and None not in rows.values()
    from collections import Counter
    c = Counter(rows.values())
    assert 0.75 * 2000 < c["train"] < 0.85 * 2000
    assert 0.07 * 2000 < c["val"] < 0.13 * 2000
    assert 0.07 * 2000 < c["test"] < 0.13 * 2000
    # the assignment rides the row: identical under repartitioning
    again = {r.doc_id: r.split for r in
             hash_split(df.repartition(7),
                        {"train": 0.8, "val": 0.1, "test": 0.1},
                        seed=23).collect()}
    assert again == rows
    # cut points are python ints a SQL twin can embed
    cuts = hash_split_cuts({"train": 0.8, "val": 0.1, "test": 0.1})
    assert cuts[-1] == 1 << 60 and cuts == sorted(cuts)


def test_hash_split_validates(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.text import hash_split
    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pt.raises(ValueError):
        hash_split(df, {"a": 0.5, "b": 0.4})
    with _pt.raises(ValueError):
        hash_split(df, {})


def test_doc_chunks_brute_force(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.text import doc_chunks
    docs = [
        (1, "a b c d e f g h i j"),          # 10 toks
        (2, "one two three"),                # 3 toks (single chunk)
        (3, "   "),                          # whitespace-only: dropped
        (4, None),                           # null: dropped
        (5, " x  y\tz\nw v " * 4),           # messy whitespace, 20 toks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    size, overlap = 4, 1
    stride = size - overlap
    got = sorted((r.doc_id, r.chunk_id, r.start_tok, r.n_tok,
                  r.chunk_text)
                 for r in doc_chunks(df, size=size,
                                     overlap=overlap).collect())
    want = []
    for did, text in docs:
        if text is None or not text.strip():
            continue
        toks = text.split()
        n = len(toks)
        m = 1 if n <= size else 1 + -((n - size) // -stride)
        for c in range(m):
            s = c * stride
            ln = min(size, n - s)
            want.append((did, c, s, ln, " ".join(toks[s:s + ln])))
    assert got == sorted(want)
    # coverage: every token of doc 1 appears in some chunk; adjacent
    # chunks share exactly `overlap` tokens until the tail
    d1 = [w for w in got if w[0] == 1]
    assert d1[0][4].split()[-overlap:] == d1[1][4].split()[:overlap]
    with _pt.raises(ValueError):
        doc_chunks(df, size=4, overlap=4)
    with _pt.raises(ValueError):
        doc_chunks(df, size=0)


def test_filter_funnel_first_match_attribution(spark):
    from cdap_geo_spark.operators.text import filter_funnel
    docs = [
        (1, None),                                   # empty (null)
        (2, "      "),                               # empty (ws-only)
        (3, "one two three"),                        # too_short (<5)
        (4, "a " * 6 + "tail"),                      # word_len? no: 7 toks, mwl=(6+4)/7=1.4 -> word_len
        (5, "x" * 30),                               # 1 tok -> too_short
        (6, "wordy " * 10 + "#$%@! ***" * 40),       # symbol_ratio
        (7, "z" * 25000),                            # 1 token -> too_short first
        (8, ("longword " * 8).strip()),              # kept
        (9, "ok " * 3000),                           # too_long (9000 chars)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.rule: r.n_docs
           for r in filter_funnel(df, min_tokens=5, max_chars=8000,
                                  min_mwl=2, max_mwl=12,
                                  max_symbol_pct=30).collect()}
    # first-match: doc 7 (25k chars, 1 token) counts as too_short,
    # never reaching too_long; doc 4 fails word_len (mwl 10/7 < 2)
    assert got == {"empty": 2, "too_short": 3, "word_len": 1,
                   "symbol_ratio": 1, "too_long": 1, "kept": 1}
    assert sum(got.values()) == len(docs)


def test_langid_kappa_brute_force(spark):
    import math
    import __spark_entry__ as E
    (row,) = E._q_langid_kappa(
        spark, "/root/testdata/sf0.001").collect()
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    pred = dict(con.execute(
        f"SELECT doc_id, lang_pred FROM ({E._LANG_ID_SQL})"
    ).fetchall())
    true = dict(con.execute(
        "SELECT doc_id, lang FROM documents").fetchall())
    n = len(true)
    agree = sum(1 for d in true if pred[d] == true[d])
    from collections import Counter
    rm = Counter(true.values())
    cm = Counter(pred.values())
    sum_rc = sum(rm[k] * cm.get(k, 0)
                 for k in set(rm) | set(cm))
    den = n * n - sum_rc
    kap = (n * agree - sum_rc) / den
    want_k = (math.floor(kap * 1e6 + 0.5) if kap >= 0
              else -math.floor(-kap * 1e6 + 0.5))
    assert (row.n, row.n_agree, row.sum_rc) == (n, agree, sum_rc)
    assert row.kappa_micro == want_k
    assert row.accuracy_micro == math.floor(agree / n * 1e6 + 0.5)
    # kappa can't exceed accuracy; on THIS synthetic corpus the
    # stopword heuristic is ~chance (that is the point of publishing
    # kappa next to raw accuracy: 29% accuracy sounds like signal,
    # kappa ~= 0 says there is none)
    assert row.kappa_micro <= row.accuracy_micro
    assert abs(row.kappa_micro) < 100_000


def test_langid_prf_identities(spark):
    """Per-class P/R/F1 identities on sf0.001: tp+fn = class support,
    Σ(tp+fp) = Σ support = N, and F1 lies between P and R."""
    import __spark_entry__ as E
    rows = E._q_langid_prf(spark, "/root/testdata/sf0.001").collect()
    n = sum(r.tp + r.fn for r in rows)
    assert n == sum(r.tp + r.fp for r in rows) == 500
    for r in rows:
        if r.precision_micro is not None and r.recall_micro is not None:
            lo = min(r.precision_micro, r.recall_micro)
            hi = max(r.precision_micro, r.recall_micro)
            if r.f1_micro is not None:
                assert lo - 1 <= r.f1_micro <= hi + 1
        # exact single-division F1 identity
        if 2 * r.tp + r.fp + r.fn > 0:
            import math
            assert r.f1_micro == math.floor(
                2 * r.tp / (2 * r.tp + r.fp + r.fn) * 1e6 + 0.5)


def test_vocab_growth_monotone_and_exact(spark):
    import __spark_entry__ as E
    rows = {r.quarter: (r.cutoff, r.n_docs, r.n_tokens, r.vocab)
            for r in E._q_vocab_growth(
                spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {1, 2, 3, 4}
    # monotone growth in every coordinate
    for k in (2, 3, 4):
        for i in range(4):
            assert rows[k][i] >= rows[k - 1][i]
    # exact full-corpus checkpoint vs independent python
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet") \
        .to_pydict()
    vocab = set()
    ntok = 0
    for txt in t["text"]:
        if txt is None:
            continue
        import re
        toks = [w for w in re.split(r"\s+", txt.strip().lower())
                if w]
        vocab.update(toks)
        ntok += len(toks)
    assert rows[4][3] == len(vocab)
    assert rows[4][2] == ntok
    # sublinear vocabulary growth (Heaps): second-half vocab gain is
    # smaller than the first-half gain
    assert rows[4][3] - rows[2][3] < rows[2][3]
