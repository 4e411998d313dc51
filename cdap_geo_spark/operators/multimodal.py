"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` payloads + typed metadata structs —
the same convention as geometry spans (``media_ref`` pointers in the
interleaved docs, resolved to blobs by an upstream fetch stage). The
Spark-side machinery here — schemas, batch iteration, partition-size
control, feature-column contracts — is real and tested; the actual
codec work is stubbed because image/audio libraries are not in this
container: ``decode=`` accepts any ``bytes -> np.ndarray`` callable,
the default raises ``NotImplementedError``, and
``deterministic_fake_decode`` provides a seeded stand-in so the
pipeline shape is exercisable end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha", T.StringType()),
])


def not_implemented_decode(blob: bytes) -> np.ndarray:
    raise NotImplementedError(
        "media codecs unavailable in this environment; inject decode=")


def deterministic_fake_decode(blob: bytes) -> np.ndarray:
    """Seeded stand-in decoder: bytes -> fake HxWx3 uint8 'image' whose
    content is a pure function of the payload (tests stay exact)."""
    h = (sum(blob[:16]) % 8) + 2 if blob else 2
    w = (sum(blob[-16:]) % 8) + 2 if blob else 2
    seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


def media_metadata(df: DataFrame, blob_col: str = "media",
                   media_type: str = "image") -> DataFrame:
    """Typed metadata columns — native, no decode needed."""
    return df.withColumn("media_meta", F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(blob_col), 256).alias("sha"),
    ))


def extract_features(df: DataFrame, *, blob_col: str = "media",
                     id_col: str = "doc_id", feat_dim: int = 16,
                     decode=not_implemented_decode,
                     batch_limit: int = 256) -> DataFrame:
    """mapInPandas feature extraction: blob -> decode -> pooled feature
    vector (mean/std per channel + shape), emitted as array<float>.

    ``batch_limit`` caps rows per emitted pandas frame so a partition
    of large blobs never materializes more than ~batch_limit decoded
    frames at once (the memory contract a 100 TB media table needs).
    """
    schema = T.StructType([
        df.schema[id_col],
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ])

    def gen(batches):
        for pdf in batches:
            for s in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[s:s + batch_limit]
                feats, oks = [], []
                for blob in chunk[blob_col]:
                    try:
                        arr = decode(bytes(blob)) if blob is not None else None
                    except NotImplementedError:
                        raise
                    except Exception:
                        arr = None
                    if arr is None:
                        feats.append(None)
                        oks.append(False)
                        continue
                    a = arr.astype(np.float64)
                    v = np.concatenate([
                        a.mean(axis=(0, 1)), a.std(axis=(0, 1)),
                        [a.shape[0], a.shape[1]]])
                    v = np.resize(v, feat_dim).astype(np.float32)
                    feats.append(v.tolist())
                    oks.append(True)
                yield pd.DataFrame({
                    id_col: chunk[id_col].to_numpy(),
                    "features": feats,
                    "decode_ok": oks,
                })

    return df.select(id_col, blob_col).mapInPandas(gen, schema=schema)


def frame_sample_refs(df: DataFrame, *, id_col: str = "doc_id",
                      n_frames_col: str = "n_frames",
                      every: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index —
    native sequence/explode (the decode of each frame is a later
    ``extract_features`` pass over the fetched frame blobs)."""
    idxs = F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every))
    return df.select(id_col, F.explode(idxs).alias("frame_idx"))
