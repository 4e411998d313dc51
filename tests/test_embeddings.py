"""Embedding similarity-search tests vs NumPy brute force."""

import numpy as np
from pyspark.sql import functions as F


def _emb_df(spark, n=200, dim=16, seed=9):
    rng = np.random.RandomState(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(int(i), vecs[i].tolist()) for i in range(n)]
    return (spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
            vecs)


def test_cosine_topk_matches_numpy(spark):
    from cdap_geo_spark.operators.embeddings import cosine_topk
    df, vecs = _emb_df(spark)
    q = df.filter(F.col("vec_id") % 25 == 0) \
          .select(F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk(df, q, k=4).toPandas()
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    for qid in range(0, 200, 25):
        cos = (v @ v[qid]) / (norms * norms[qid])
        order = sorted(range(200), key=lambda i: (-cos[i], i))[:4]
        sub = got[got.query_id == qid].sort_values("rank")
        assert list(sub.vec_id) == order, qid
    # self is always rank 1
    assert (got[got["rank"] == 1].query_id == got[got["rank"] == 1].vec_id).all()


def test_lsh_topk_recall(spark):
    from cdap_geo_spark.operators.embeddings import lsh_topk
    df, vecs = _emb_df(spark, n=300, dim=16)
    q = df.filter(F.col("vec_id") % 30 == 0) \
          .select(F.col("vec_id").alias("query_id"), "embedding")
    got = lsh_topk(df, q, k=3, dim=16, n_planes=8, probes=2).toPandas()
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    hits = total = 0
    for qid in range(0, 300, 30):
        cos = (v @ v[qid]) / (norms * norms[qid])
        true3 = set(sorted(range(300), key=lambda i: (-cos[i], i))[:3])
        approx = set(got[got.query_id == qid].vec_id)
        hits += len(true3 & approx)
        total += 3
    assert hits / total >= 0.5  # approximate path: recall, not exactness
    # rank 1 must be the query itself (same bucket, cosine 1)
    r1 = got[got["rank"] == 1]
    assert (r1["query_id"] == r1["vec_id"]).all()
